"""Path-parity shim: ``ever.preprocess.comm`` (reference ``ever/preprocess/comm.py:4-34``).

``Compose``/``CustomOp`` live in :mod:`ever_tpu.preprocess.segm`;
``THMeanStdNormalize`` (re-exported here like the reference does) in
:mod:`ever_tpu.preprocess.thcomm`.
"""

from ever_tpu.preprocess.segm import Compose, CustomOp
from ever_tpu.preprocess.thcomm import THMeanStdNormalize

__all__ = ['Compose', 'CustomOp', 'THMeanStdNormalize']
