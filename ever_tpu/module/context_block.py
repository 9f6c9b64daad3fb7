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


# ---------------------------------------------------------------------------
# Reference-spelling plugin surface (``ever/module/context_block.py:21-309``).
# Same design note as ``se_block.py``: the reference swaps torch blocks for
# GC-augmented copies with transplanted weights; in flax the equivalent is a
# config transform setting ``gc_ratio`` (params live outside the module).

def conv3x3(features, stride=1, dilation=1, **kw):
    """Parity: ``context_block.py:9-13``."""
    return nn.Conv(features, (3, 3), strides=(stride, stride),
                   kernel_dilation=(dilation, dilation), padding='SAME',
                   use_bias=False, **kw)


def conv1x1(features, stride=1, **kw):
    """Parity: ``context_block.py:16-18``."""
    return nn.Conv(features, (1, 1), strides=(stride, stride),
                   use_bias=False, **kw)


def constant_init(val, bias=0):
    """Flax initializer pair for the reference's in-place torch init
    (``context_block.py:21-25``): returns ``(kernel_init, bias_init)``."""
    return (nn.initializers.constant(val), nn.initializers.constant(bias))


def kaiming_init(mode='fan_out', nonlinearity='relu', bias=0, distribution='normal'):
    """Parity: ``context_block.py:27-41`` — He init as a flax initializer pair."""
    dist = 'uniform' if distribution == 'uniform' else 'truncated_normal'
    k = nn.initializers.variance_scaling(2.0, mode, dist)
    return (k, nn.initializers.constant(bias))


def last_zero_init():
    """Zero-init for the last fusion conv (``context_block.py:44-50``) —
    the ``ContextBlock2d`` here already zero-initializes its channel_add/mul
    transforms; exposed for ported code building its own fusions."""
    return (nn.initializers.zeros, nn.initializers.zeros)


def _with_gc_ratio(module, ratio):
    from ever_tpu.interface.module import ERModule
    if isinstance(module, ERModule):
        cfg = module.config.to_dict()
        cfg.update(gc_ratio=ratio)
        return type(module)(cfg)
    return module.clone(gc_ratio=ratio)


def plugin_to_basicblock(module, ratio):
    """GC-augment BasicBlocks (parity: ``context_block.py:223-251``).
    Returns a copy of the trunk/stage/encoder with ``gc_ratio=ratio``."""
    return _with_gc_ratio(module, ratio)


def plugin_to_resnet(module, ratio):
    """GC-augment Bottlenecks (parity: ``context_block.py:254-309``)."""
    return _with_gc_ratio(module, ratio)


def __getattr__(name):
    # Lazy: resnet.py imports ContextBlock2d from here (circular otherwise).
    if name in ('BasicBlock', 'Bottleneck'):
        from ever_tpu.module import resnet
        return getattr(resnet, name)
    raise AttributeError(name)


__all__ += ['conv3x3', 'conv1x1', 'constant_init', 'kaiming_init',
            'last_zero_init', 'plugin_to_basicblock', 'plugin_to_resnet',
            'BasicBlock', 'Bottleneck']
