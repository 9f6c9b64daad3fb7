"""ConvNeXt encoders (NHWC, flax.linen).

Parity target: ``ever/module/dinov3/models/convnext.py:116-340`` (vendored
Meta ConvNeXt used as a DINOv3 backbone): patchify stem, per-stage
downsampling with pre-LN, blocks of dw7x7 → LN → 4x MLP → LayerScale →
DropPath, multi-scale feature taps.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ever_tpu.core import registry
from ever_tpu.interface.module import ERModule
from ever_tpu.module.vit import LayerScale, drop_path

__all__ = ['ConvNeXt', 'ConvNeXtEncoder', 'CONVNEXT_SPECS']

Dtype = Any

# name → (depths, dims)
CONVNEXT_SPECS = {
    'convnext_tiny': ((3, 3, 9, 3), (96, 192, 384, 768)),
    'convnext_small': ((3, 3, 27, 3), (96, 192, 384, 768)),
    'convnext_base': ((3, 3, 27, 3), (128, 256, 512, 1024)),
    'convnext_large': ((3, 3, 27, 3), (192, 384, 768, 1536)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    layerscale_init: float = 1e-6
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        h = nn.Conv(self.dim, (7, 7), padding='SAME',
                    feature_group_count=self.dim, dtype=self.dtype,
                    name='dwconv')(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name='norm')(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name='pwconv1')(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name='pwconv2')(h)
        if self.layerscale_init:
            h = LayerScale(self.layerscale_init, name='gamma')(h)
        if self.drop_path_rate > 0:
            h = drop_path(h, self.drop_path_rate, not train,
                          self.make_rng('dropout') if train else None)
        return identity + h


class ConvNeXt(nn.Module):
    """Trunk returning per-stage features [c2, c3, c4, c5]."""

    model_name: str = 'convnext_tiny'
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        depths, dims = CONVNEXT_SPECS[self.model_name]
        total = sum(depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        feats = []
        i = 0
        for si in range(4):
            if si == 0:
                x = nn.Conv(dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                            name='stem_conv')(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name='stem_norm')(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f'down{si}_norm')(x)
                x = nn.Conv(dims[si], (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f'down{si}_conv')(x)
            for bi in range(depths[si]):
                x = ConvNeXtBlock(dims[si], drop_path_rate=dpr[i],
                                  dtype=self.dtype,
                                  name=f'stage{si}_block{bi}')(x, train)
                i += 1
            feats.append(x)
        return feats


for _name in CONVNEXT_SPECS:
    registry.MODEL.register(
        _name, (lambda n: lambda **kw: ConvNeXt(model_name=n, **kw))(_name))


@registry.MODEL.register()
class ConvNeXtEncoder(ERModule):
    def set_default_config(self):
        self.config.update(dict(
            convnext_type='convnext_tiny',
            drop_path_rate=0.0,
            dtype='float32',
        ))

    def setup(self):
        self.net = ConvNeXt(model_name=self.config.convnext_type,
                            drop_path_rate=self.config.drop_path_rate,
                            dtype=jnp.dtype(self.config.dtype))

    def __call__(self, x, train: bool = False):
        return self.net(x, train)

    def out_channels(self):
        return CONVNEXT_SPECS[self.config.convnext_type][1]
