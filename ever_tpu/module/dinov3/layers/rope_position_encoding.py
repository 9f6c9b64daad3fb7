"""Path-parity shim: ``ever.module.dinov3.layers.rope_position_encoding``
(reference ``dinov3/layers/rope_position_encoding.py:16-121``)."""

from ever_tpu.module.vit import RopePositionEmbedding

__all__ = ['RopePositionEmbedding']
