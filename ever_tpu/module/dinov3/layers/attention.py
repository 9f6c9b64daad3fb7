"""Path-parity shim: ``ever.module.dinov3.layers.attention`` (reference
``dinov3/layers/attention.py:30-166``)."""

from ever_tpu.module.vit import (CausalSelfAttention, LinearKMaskedBias,
                                 SelfAttention, _rotate_half, rope_apply)

rope_rotate_half = _rotate_half

__all__ = ['rope_rotate_half', 'rope_apply', 'LinearKMaskedBias',
           'SelfAttention', 'CausalSelfAttention']
