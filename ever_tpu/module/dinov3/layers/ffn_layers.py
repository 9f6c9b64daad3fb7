"""Path-parity shim: ``ever.module.dinov3.layers.ffn_layers`` (reference
``dinov3/layers/ffn_layers.py:14-77``)."""

from ever_tpu.module.vit import ListForwardMixin, Mlp, SwiGLUFFN

__all__ = ['ListForwardMixin', 'Mlp', 'SwiGLUFFN']
