"""DenseNet encoders (NHWC, flax.linen).

Parity target: ``ever/module/_densenet.py`` (densenet121/161/169/201 with
memory-efficient checkpointed concat) and ``ever/module/densenet.py:17-56``
(``DenseNetEncoder`` returning the four dense-block outputs:
d121 → (256, 512, 1024, 1024) etc.).  ``memory_efficient`` maps to
``nn.remat`` on the dense layer (recompute the bn-relu-conv chain in the
backward pass instead of storing concat intermediates).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ever_tpu.core import registry
from ever_tpu.interface.module import ERModule
from ever_tpu.module.ops import Norm, avg_pool, max_pool
from ever_tpu.module.resnet import _conv

__all__ = ['DenseNet', 'DenseNetEncoder', 'DENSENET_SPECS']

Dtype = Any

# name → (growth_rate, block_config, init_features)
DENSENET_SPECS = {
    'densenet121': (32, (6, 12, 24, 16), 64),
    'densenet161': (48, (6, 12, 36, 24), 96),
    'densenet169': (32, (6, 12, 32, 32), 64),
    'densenet201': (32, (6, 12, 48, 32), 64),
}


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    bn_frozen: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen, name='norm1')(x, train)
        y = nn.relu(y)
        y = _conv(self.bn_size * self.growth_rate, 1, name='conv1', dtype=self.dtype)(y)
        y = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen, name='norm2')(y, train)
        y = nn.relu(y)
        y = _conv(self.growth_rate, 3, name='conv2', dtype=self.dtype)(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    """Trunk returning the four dense-block outputs [c2, c3, c4, c5]."""

    densenet_type: str = 'densenet121'
    memory_efficient: bool = False
    bn_frozen: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        growth, blocks, init_feats = DENSENET_SPECS[self.densenet_type]
        layer_cls = (nn.remat(DenseLayer, static_argnums=(2,))
                     if self.memory_efficient else DenseLayer)

        x = _conv(init_feats, 7, 2, name='conv0', dtype=self.dtype)(x)
        x = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen, name='norm0')(x, train)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, padding=((1, 1), (1, 1)))

        feats = []
        for bi, n_layers in enumerate(blocks):
            for li in range(n_layers):
                x = layer_cls(growth, bn_frozen=self.bn_frozen, dtype=self.dtype,
                              name=f'denseblock{bi + 1}_layer{li + 1}')(x, train)
            feats.append(x)
            if bi != len(blocks) - 1:
                c = x.shape[-1] // 2
                x = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen,
                         name=f'transition{bi + 1}_norm')(x, train)
                x = nn.relu(x)
                x = _conv(c, 1, name=f'transition{bi + 1}_conv', dtype=self.dtype)(x)
                x = avg_pool(x, 2, 2, padding='VALID')
        return feats


for _name in DENSENET_SPECS:
    registry.MODEL.register(_name, (lambda n: lambda **kw: DenseNet(densenet_type=n, **kw))(_name))


@registry.MODEL.register()
@registry.MODEL.register('densenet_encoder')
class DenseNetEncoder(ERModule):
    """Config surface parity with ``ever/module/densenet.py:17-56``."""

    def set_default_config(self):
        self.config.update(dict(
            densenet_type='densenet121',
            pretrained=False,
            memory_efficient=False,
            dtype='float32',
        ))

    def setup(self):
        self.densenet = DenseNet(
            densenet_type=self.config.densenet_type,
            memory_efficient=self.config.memory_efficient,
            dtype=jnp.dtype(self.config.dtype),
        )

    def __call__(self, x, train: bool = False):
        return self.densenet(x, train)

    def out_channels(self) -> Tuple[int, ...]:
        growth, blocks, init_feats = DENSENET_SPECS[self.config.densenet_type]
        chans, c = [], init_feats
        for bi, n in enumerate(blocks):
            c = c + n * growth
            chans.append(c)
            c = c // 2
        return tuple(chans)
