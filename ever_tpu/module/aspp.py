"""Path-parity shim: ``ever.module.aspp`` (reference ``ever/module/aspp.py:8-55``)."""

from ever_tpu.module.heads import ASPPHead, AtrousSpatialPyramidPool

__all__ = ['AtrousSpatialPyramidPool', 'ASPPHead']
