"""GCNet global-context attention block.

Parity target: ``ever/module/context_block.py:53-309`` (``ContextBlock2d``
with attention/avg pooling and channel_add/channel_mul fusion, plus the
bottleneck plugin mechanism — here a constructor flag on the ResNet blocks).
NHWC formulation: the attention pool is a softmax-weighted spatial sum,
expressed as one einsum (MXU-friendly) instead of reshape gymnastics.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ever_tpu.core import registry

__all__ = ['ContextBlock2d']


@registry.OP.register()
class ContextBlock2d(nn.Module):
    """Global context: spatial pool → channel transform → fuse.

    ``pool``: 'att' (softmax attention over pixels) or 'avg'.
    ``fusions``: subset of {'channel_add', 'channel_mul'}.
    The last conv of each transform is zero-initialised so the block starts
    as identity (parity: ``context_block.py:44-49,100-106``).
    """

    inner_ratio: float = 1.0 / 16
    pool: str = 'att'
    fusions: Sequence[str] = ('channel_add',)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.pool not in ('att', 'avg'):
            raise ValueError(self.pool)
        if not self.fusions or not all(f in ('channel_add', 'channel_mul') for f in self.fusions):
            raise ValueError(f'bad fusions: {self.fusions}')
        n, h, w, c = x.shape
        inner = max(int(c * self.inner_ratio), 1)

        if self.pool == 'att':
            # [N,H,W,1] logits → softmax over pixels → weighted sum of features
            mask = nn.Conv(1, (1, 1), dtype=self.dtype)(x)
            mask = nn.softmax(mask.reshape(n, h * w, 1), axis=1)
            feats = x.reshape(n, h * w, c)
            context = jnp.einsum('npc,npo->noc', feats, mask,
                                 preferred_element_type=jnp.float32)
            context = context.reshape(n, 1, 1, c).astype(x.dtype)
        else:
            context = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True
                               ).astype(x.dtype)

        def transform(ctx, name):
            y = nn.Conv(inner, (1, 1), dtype=self.dtype, name=f'{name}_reduce')(ctx)
            y = nn.LayerNorm(dtype=self.dtype, name=f'{name}_ln')(y)
            y = nn.relu(y)
            # zero-init final conv → identity at initialisation
            y = nn.Conv(c, (1, 1), dtype=self.dtype, name=f'{name}_expand',
                        kernel_init=nn.initializers.zeros)(y)
            return y

        out = x
        if 'channel_mul' in self.fusions:
            out = out * nn.sigmoid(transform(context, 'channel_mul'))
        if 'channel_add' in self.fusions:
            out = out + transform(context, 'channel_add')
        return out
