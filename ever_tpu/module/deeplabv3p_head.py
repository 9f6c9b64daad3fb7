"""Path-parity shim: ``ever.module.deeplabv3p_head`` (reference ``ever/module/deeplabv3p_head.py:8-86``)."""

from ever_tpu.module.heads import Deeplabv3pDecoder, Deeplabv3pHead

__all__ = ['Deeplabv3pDecoder', 'Deeplabv3pHead']
