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
    """Concurrent spatial & channel SE (max of the two gated paths)."""

    inv_ratio: int = 16
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
        q = nn.sigmoid(nn.Conv(1, (1, 1), dtype=self.dtype)(x))
        sse = x * q
        return cse + sse
