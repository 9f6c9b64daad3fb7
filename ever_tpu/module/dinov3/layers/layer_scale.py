"""Path-parity shim: ``ever.module.dinov3.layers.layer_scale`` (reference
``dinov3/layers/layer_scale.py:12-29``)."""

from ever_tpu.module.vit import LayerScale

__all__ = ['LayerScale']
