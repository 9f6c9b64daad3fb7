"""Path-parity shim: ``ever.module.dinov3.layers.rms_norm`` (reference
``dinov3/layers/rms_norm.py:10-24``)."""

from ever_tpu.module.vit import RMSNorm

__all__ = ['RMSNorm']
