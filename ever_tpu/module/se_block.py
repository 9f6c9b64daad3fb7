"""Squeeze-and-Excitation attention blocks.

Parity target: ``ever/module/se_block.py:9-230`` — ``SEBlock`` (channel
attention), ``SCSEModule`` (concurrent spatial+channel SE), and the
plugin-to-bottleneck mechanism (here a constructor flag on the ResNet blocks,
see ``ever_tpu/module/resnet.py``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ever_tpu.core import registry
from ever_tpu.module.ops import global_avg_pool

__all__ = ['SEBlock', 'SCSEModule']


@registry.OP.register()
class SEBlock(nn.Module):
    """Channel SE: global pool → FC reduce → FC expand → sigmoid gate."""

    inv_ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mid = max(c // self.inv_ratio, 1)
        s = global_avg_pool(x)                       # N,1,1,C
        s = nn.Conv(mid, (1, 1), dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype)(s)
        return x * nn.sigmoid(s)


@registry.OP.register()
class SCSEModule(nn.Module):
    """Concurrent spatial & channel SE.

    ``mode``: ``'concat'`` (reference default — output has 2C channels,
    ``ever/module/se_block.py:29-61``), ``'maxout'`` (elementwise max of the
    two gated paths), or ``'add'``.
    """

    inv_ratio: int = 16
    mode: str = 'concat'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mid = max(c // self.inv_ratio, 1)
        # channel SE
        s = global_avg_pool(x)
        s = nn.relu(nn.Conv(mid, (1, 1), dtype=self.dtype)(s))
        s = nn.sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype)(s))
        cse = x * s
        # spatial SE
        q = nn.sigmoid(nn.Conv(1, (1, 1), use_bias=False,
                               dtype=self.dtype)(x))
        sse = x * q
        if self.mode == 'concat':
            return jnp.concatenate([cse, sse], axis=-1)
        if self.mode == 'maxout':
            return jnp.maximum(cse, sse)
        return cse + sse


# ---------------------------------------------------------------------------
# Reference-spelling plugin surface (``ever/module/se_block.py:64-230``).
#
# The reference mutates a built torch trunk, swapping each BasicBlock /
# Bottleneck for an SE-augmented copy and transplanting its weights
# (``se_block.py:147-230``).  Flax modules are immutable dataclasses and
# params live outside the module, so the equivalent operation is a *config*
# transform: return a copy of the block/stage/trunk/encoder with ``se_ratio``
# set.  Params are untouched — the SE branch initializes fresh on the next
# ``init``/``apply``, exactly like the reference's newly constructed SE
# layers.

def _with_ratio(module, **updates):
    from ever_tpu.interface.module import ERModule
    if isinstance(module, ERModule):
        # encoder-level: carry the ratio through the config surface
        cfg = module.config.to_dict()
        cfg.update(updates)
        return type(module)(cfg)
    # flax module (ResNet trunk / ResNetStage / block): attribute clone
    return module.clone(**updates)


def plugin_to_basicblock(module, ratio):
    """SE-augment BasicBlocks (parity: ``se_block.py:147-175``).

    Accepts a :class:`~ever_tpu.module.resnet.ResNet` trunk, a
    ``ResNetStage``, a block, or a ``ResNetEncoder``; returns a copy with
    ``se_ratio=ratio``.  Granularity note: the ratio applies to every block
    under ``module`` (the reference converts blocks recursively, which for
    its documented per-stage usage is the same thing).
    """
    return _with_ratio(module, se_ratio=ratio)


def plugin_to_bottleneck(module, ratio):
    """SE-augment Bottlenecks (parity: ``se_block.py:178-230``)."""
    return _with_ratio(module, se_ratio=ratio)


def conv3x3(features, stride=1, dilation=1, **kw):
    """Parity: ``se_block.py:64-67``."""
    return nn.Conv(features, (3, 3), strides=(stride, stride),
                   kernel_dilation=(dilation, dilation), padding='SAME',
                   use_bias=False, **kw)


def conv1x1(features, stride=1, **kw):
    """Parity: ``se_block.py:70-72``."""
    return nn.Conv(features, (1, 1), strides=(stride, stride),
                   use_bias=False, **kw)


def __getattr__(name):
    # Lazy: avoid a circular import (resnet.py imports SEBlock from here).
    if name in ('BasicBlock', 'Bottleneck'):
        from ever_tpu.module import resnet
        return getattr(resnet, name)
    raise AttributeError(name)


__all__ += ['plugin_to_basicblock', 'plugin_to_bottleneck', 'conv3x3',
            'conv1x1', 'BasicBlock', 'Bottleneck']
