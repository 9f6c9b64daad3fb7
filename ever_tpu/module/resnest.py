"""ResNeSt encoders (split-attention networks, NHWC).

Parity target: ``ever/module/resnest.py:17-89`` (``ResNeStEncoder`` wrapping
the optional ``resnest`` package).  The split-attention bottleneck is
implemented natively: the 3x3 conv produces ``radix`` feature groups whose
sum is squeeze-excited into per-radix softmax attention weights (rSoftMax),
plus ResNeSt-D details (deep stem, avg-pool downsample).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ever_tpu.core import registry
from ever_tpu.interface.module import ERModule
from ever_tpu.module.ops import Norm, avg_pool, global_avg_pool, max_pool
from ever_tpu.module.resnet import _conv, _stage_geometry

__all__ = ['SplAtConv2d', 'ResNeSt', 'ResNeStEncoder', 'RESNEST_SPECS']

Dtype = Any

# name → stage sizes
RESNEST_SPECS = {
    'resnest50': (3, 4, 6, 3),
    'resnest101': (3, 4, 23, 3),
    'resnest200': (3, 24, 36, 3),
    'resnest269': (3, 30, 48, 8),
}


class SplAtConv2d(nn.Module):
    """Split-attention conv: radix groups + rSoftMax channel attention."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    radix: int = 2
    reduction: int = 4
    bn_frozen: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        r = self.radix
        h = nn.Conv(self.features * r, (self.kernel,) * 2,
                    strides=(self.stride,) * 2,
                    kernel_dilation=(self.dilation,) * 2, padding='SAME',
                    feature_group_count=r, use_bias=False, dtype=self.dtype,
                    name='conv')(x)
        h = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen, name='bn0')(h, train)
        h = nn.relu(h)
        n, hh, ww, _ = h.shape
        splits = h.reshape(n, hh, ww, r, self.features)
        gap = jnp.sum(splits, axis=3)                       # [N,H,W,C]
        gap = global_avg_pool(gap)                          # [N,1,1,C]
        inter = max(self.features * r // self.reduction, 32)
        a = nn.Conv(inter, (1, 1), dtype=self.dtype, name='fc1')(gap)
        a = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen, name='bn1')(a, train)
        a = nn.relu(a)
        a = nn.Conv(self.features * r, (1, 1), dtype=self.dtype, name='fc2')(a)
        if r == 1:
            # resnest package rSoftMax: radix==1 uses a SIGMOID channel gate
            # (softmax over a singleton axis would be constant 1.0 — dead
            # attention params)
            att = jax.nn.sigmoid(a.reshape(n, 1, 1, r, self.features))
        else:
            att = nn.softmax(a.reshape(n, 1, 1, r, self.features), axis=3)
        return jnp.sum(att * splits, axis=3)


class ResNeStBottleneck(nn.Module):
    filters: int
    stride: int = 1
    dilation: int = 1
    conv_dilation: int = 1
    downsample: bool = False
    avd: bool = False
    radix: int = 2
    bn_frozen: bool = False
    dtype: Dtype = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = _conv(self.filters, 1, name='conv1', dtype=self.dtype)(x)
        y = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen, name='bn1')(y, train)
        y = nn.relu(y)
        y = SplAtConv2d(self.filters, 3, 1, self.conv_dilation,
                        radix=self.radix, bn_frozen=self.bn_frozen,
                        dtype=self.dtype, name='splat')(y, train)
        # ResNeSt-D avd (avd_first=False as in the published resnest50/101):
        # 3x3 avg-pool AFTER the splat conv carries the stage stride; it also
        # applies (stride 1) to os-dilated first blocks
        if self.avd:
            # symmetric padding 1 (torch AvgPool2d(3, s, padding=1)); 'SAME'
            # would pad (0, 1) at stride 2 and shift the grid by one pixel
            y = avg_pool(y, 3, max(self.stride, 1), padding=((1, 1), (1, 1)))
        y = _conv(self.filters * self.expansion, 1, name='conv3', dtype=self.dtype)(y)
        y = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen, name='bn3')(y, train)
        if self.downsample:
            if self.stride > 1:
                identity = avg_pool(identity, self.stride, self.stride,
                                    padding='SAME')
            identity = _conv(self.filters * self.expansion, 1, 1,
                             name='downsample_conv', dtype=self.dtype)(identity)
            identity = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen,
                            name='downsample_bn')(identity, train)
        return nn.relu(y + identity)


class ResNeSt(nn.Module):
    """Trunk returning [c2, c3, c4, c5] (deep stem, os dilation geometry)."""

    resnest_type: str = 'resnest50'
    output_stride: int = 32
    radix: int = 2
    bn_frozen: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        sizes = RESNEST_SPECS[self.resnest_type]
        geom = _stage_geometry(self.output_stride)
        # deep stem 3x3x3; stem_width is 32 ONLY for resnest50 — 101/200/269
        # use 64 (reference: resnest.py:44-46, mirroring the package)
        sw = 32 if self.resnest_type == 'resnest50' else 64
        for i, (c, s) in enumerate(((sw, 2), (sw, 1), (2 * sw, 1))):
            x = _conv(c, 3, s, name=f'stem_conv{i + 1}', dtype=self.dtype)(x)
            x = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen,
                     name=f'stem_bn{i + 1}')(x, train)
            x = nn.relu(x)
        x = max_pool(x, 3, 2, padding=((1, 1), (1, 1)))

        feats = []
        filters = (64, 128, 256, 512)
        for i in range(4):
            stride, dil, first_dil = geom[i]
            for b in range(sizes[i]):
                needs_ds = b == 0 and (stride != 1 or
                                       x.shape[-1] != filters[i] * 4)
                # avd applies to the first block of layers 2-4 (is_first in
                # the resnest package) even when os surgery removes the stride
                x = ResNeStBottleneck(
                    filters[i], stride if b == 0 else 1, dil,
                    conv_dilation=first_dil if b == 0 else dil,
                    downsample=needs_ds, avd=(b == 0 and i >= 1),
                    radix=self.radix,
                    bn_frozen=self.bn_frozen, dtype=self.dtype,
                    name=f'layer{i + 1}_block{b}')(x, train)
            feats.append(x)
        return feats


for _name in RESNEST_SPECS:
    registry.MODEL.register(
        _name, (lambda n: lambda **kw: ResNeSt(resnest_type=n, **kw))(_name))


@registry.MODEL.register()
class ResNeStEncoder(ERModule):
    """Config surface parity with ``ever/module/resnest.py:17-89``."""

    def set_default_config(self):
        self.config.update(dict(
            resnest_type='resnest50',
            name='',            # reference spelling (resnest.py:84); wins
            output_stride=32,   # over resnest_type when set
            radix=2,
            bn_frozen=False,
            dtype='float32',
        ))

    def setup(self):
        self.net = ResNeSt(
            resnest_type=self.config.get('name') or self.config.resnest_type,
            output_stride=self.config.output_stride,
            radix=self.config.radix,
            bn_frozen=self.config.bn_frozen,
            dtype=jnp.dtype(self.config.dtype),
        )

    def __call__(self, x, train: bool = False):
        return self.net(x, train)

    @property
    def out_channels(self) -> Sequence[int]:
        return [256, 512, 1024, 2048]
