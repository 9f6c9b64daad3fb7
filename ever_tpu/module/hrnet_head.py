"""Path-parity shim: ``ever.module.hrnet_head`` (reference ``ever/module/hrnet_head.py:8-49``)."""

from ever_tpu.module.heads import HRNetHead, SimpleFusion

__all__ = ['SimpleFusion', 'HRNetHead']
