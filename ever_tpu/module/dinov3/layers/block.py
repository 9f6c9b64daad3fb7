"""Path-parity shim: ``ever.module.dinov3.layers.block`` (reference
``dinov3/layers/block.py:84-270``)."""

from ever_tpu.module.vit import CausalSelfAttentionBlock, SelfAttentionBlock

__all__ = ['SelfAttentionBlock', 'CausalSelfAttentionBlock']
