"""Path-parity shim: ``ever.module.dinov3.layers.dino_head`` (reference
``dinov3/layers/dino_head.py:11-66``)."""

from ever_tpu.module.vit import DINOHead

__all__ = ['DINOHead']
