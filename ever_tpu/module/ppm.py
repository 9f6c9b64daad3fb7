"""Path-parity shim: ``ever.module.ppm`` (reference ``ever/module/ppm.py:8-62``).

The implementations live in :mod:`ever_tpu.module.heads`; this module exists so
``from ever.module.ppm import PPMHead`` ports with the package rename only.
"""

from ever_tpu.module.heads import PPMHead, PyramidPoolModule

__all__ = ['PyramidPoolModule', 'PPMHead']
