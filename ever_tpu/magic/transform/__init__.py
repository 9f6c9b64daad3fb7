"""Invertible batch transforms + TTA (reference ``ever/magic/transform/``).

Implementation: :mod:`ever_tpu.magic._transform_impl`; the ``segm``/``tta``
submodules mirror the reference file layout so deep imports port unchanged.
"""

from ever_tpu.magic._transform_impl import *  # noqa: F401,F403
from ever_tpu.magic._transform_impl import __all__  # noqa: F401
