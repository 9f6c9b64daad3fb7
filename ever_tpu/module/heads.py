"""Segmentation decoder heads: ASPP, PPM, DeepLabv3+, HRNet fusion.

Parity targets: ``ever/module/aspp.py:8-55``, ``ppm.py:8-62``,
``deeplabv3p_head.py:8-86``, ``hrnet_head.py:8-49``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ever_tpu.core import registry
from ever_tpu.interface.module import ERModule
from ever_tpu.module.ops import (
    ConvBlock,
    PoolBlock,
    SeparableConvBlock,
    channel_concat,
    resize,
)

__all__ = ['AtrousSpatialPyramidPool', 'ASPPHead', 'PyramidPoolModule',
           'PPMHead', 'Deeplabv3pDecoder', 'Deeplabv3pHead', 'SimpleFusion',
           'HRNetHead']

Dtype = Any


@registry.OP.register()
class AtrousSpatialPyramidPool(nn.Module):
    """1x1 + dilated 3x3 branches + image pool, projected
    (parity: ``aspp.py:8-33``)."""

    in_channels: int = 2048        # config parity; inferred from input
    out_channels: int = 256
    atrous_rates: Sequence[int] = (6, 12, 18)
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = [ConvBlock(self.out_channels, 1, norm='bn', dtype=self.dtype,
                         name='branch0')(x, train)]
        for i, rate in enumerate(self.atrous_rates):
            res.append(ConvBlock(self.out_channels, 3, dilation=rate, norm='bn',
                                 dtype=self.dtype, name=f'branch{i + 1}')(x, train))
        res.append(PoolBlock(1, self.out_channels, dtype=self.dtype,
                             name='image_pool')(x, train))
        y = channel_concat(res)
        y = ConvBlock(self.out_channels, 1, norm='bn', dtype=self.dtype,
                      name='project')(y, train)
        if self.dropout_rate > 0:
            y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return y


@registry.MODEL.register()
class ASPPHead(ERModule):
    """ASPP → classifier → upsample (parity: ``aspp.py:35-55``)."""

    def set_default_config(self):
        self.config.update(dict(
            aspp=dict(in_channels=2048, out_channels=256, atrous_rates=[6, 12, 18]),
            num_classes=3,
            upsample_scale=8.0,
            align_corners=True,   # reference: nn.UpsamplingBilinear2d
            dtype='float32',
        ))

    @nn.compact
    def __call__(self, x, train: bool = False):
        dtype = jnp.dtype(self.config.dtype)
        y = AtrousSpatialPyramidPool(dtype=dtype, name='aspp',
                                     **self.config.aspp.to_dict())(x, train)
        y = nn.Conv(self.config.num_classes, (1, 1), dtype=dtype,
                    name='classifier')(y)
        return resize(y, scale=float(self.config.upsample_scale),
                      method='bilinear',
                      align_corners=bool(self.config.get('align_corners',
                                                         True)))


@registry.OP.register()
class PyramidPoolModule(nn.Module):
    """PSPNet pyramid pooling (parity: ``ppm.py:8-36``)."""

    in_channels: int = 2048
    pool_channels: int = 512
    out_channels: int = 512
    bins: Sequence[int] = (1, 2, 3, 6)
    bottleneck_conv: str = '3x3'
    dropout_rate: float = 0.0
    dropout: float = 0.0          # reference kwarg spelling (ppm.py:15)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = [x]
        for i, size in enumerate(self.bins):
            out.append(PoolBlock(size, self.pool_channels, dtype=self.dtype,
                                 name=f'pool{i}')(x, train))
        y = channel_concat(out)
        if self.bottleneck_conv == '3x3':
            y = ConvBlock(self.out_channels, 3, norm='bn', dtype=self.dtype,
                          name='bottleneck')(y, train)
        elif self.bottleneck_conv == '1x1':
            y = ConvBlock(self.out_channels, 1, norm='bn', dtype=self.dtype,
                          name='bottleneck')(y, train)
        rate = self.dropout_rate or self.dropout
        if rate > 0:
            # reference nn.Dropout2d: whole-CHANNEL dropout, not per-element
            y = nn.Dropout(rate, broadcast_dims=(1, 2),
                           deterministic=not train)(y)
        return y


@registry.MODEL.register()
class PPMHead(ERModule):
    """PPM → classifier → upsample (parity: ``ppm.py:39-62``)."""

    def set_default_config(self):
        self.config.update(dict(
            ppm=dict(in_channels=2048, pool_channels=512, out_channels=512,
                     bins=(1, 2, 3, 6)),
            num_classes=3,
            upsample_scale=8.0,
            align_corners=True,   # reference: nn.UpsamplingBilinear2d
            dtype='float32',
        ))

    @nn.compact
    def __call__(self, x, train: bool = False):
        dtype = jnp.dtype(self.config.dtype)
        y = PyramidPoolModule(dtype=dtype, name='ppm',
                              **self.config.ppm.to_dict())(x, train)
        y = nn.Conv(self.config.num_classes, (1, 1), dtype=dtype,
                    name='classifier')(y)
        return resize(y, scale=float(self.config.upsample_scale),
                      method='bilinear',
                      align_corners=bool(self.config.get('align_corners',
                                                         True)))


@registry.OP.register()
class Deeplabv3pDecoder(nn.Module):
    """DeepLabv3+ decoder over (os4, os16) features
    (parity: ``deeplabv3p_head.py:8-55``)."""

    os4_feature_channels: int = 256
    os16_feature_channels: int = 2048
    aspp_channels: int = 256
    aspp_atrous: Sequence[int] = (6, 12, 18)
    reduction_dim: int = 48
    out_channels: int = 256
    num_3x3_convs: int = 2
    scale_factor: float = 4.0
    align_corners: bool = True    # reference: nn.UpsamplingBilinear2d
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat_list, train: bool = False):
        os4_feat, os16_feat = feat_list
        low = ConvBlock(self.reduction_dim, 3, norm='bn', dtype=self.dtype,
                        name='os4_transform')(os4_feat, train)
        high = AtrousSpatialPyramidPool(
            self.os16_feature_channels, self.aspp_channels, self.aspp_atrous,
            dtype=self.dtype, name='aspp')(os16_feat, train)
        high = ConvBlock(self.aspp_channels, 3, norm='bn', dtype=self.dtype,
                         name='os16_transform')(high, train)
        high = resize(high, scale=float(self.scale_factor), method='bilinear',
                      align_corners=self.align_corners)
        y = channel_concat([low, high])
        for i in range(self.num_3x3_convs):
            y = SeparableConvBlock(self.out_channels, 3, norm='bn',
                                   dtype=self.dtype,
                                   name=f'stack_conv{i}')(y, train)
        return y


@registry.MODEL.register()
class Deeplabv3pHead(ERModule):
    """Decoder → classifier → upsample (parity: ``deeplabv3p_head.py:58-86``)."""

    def set_default_config(self):
        self.config.update(dict(
            deeplabv3p_decoder=dict(
                os4_feature_channels=256,
                os16_feature_channels=2048,
                aspp_channels=256,
                aspp_atrous=(6, 12, 18),
                reduction_dim=48,
                out_channels=256,
                num_3x3_convs=2,
                scale_factor=4.0,
            ),
            num_classes=3,
            upsample_scale=4.0,
            align_corners=True,   # reference: nn.UpsamplingBilinear2d
            dtype='float32',
        ))

    @nn.compact
    def __call__(self, feat_list, train: bool = False):
        dtype = jnp.dtype(self.config.dtype)
        y = Deeplabv3pDecoder(dtype=dtype, name='decoder',
                              **self.config.deeplabv3p_decoder.to_dict())(
            feat_list, train)
        y = nn.Conv(self.config.num_classes, (1, 1), dtype=dtype,
                    name='classifier')(y)
        return resize(y, scale=float(self.config.upsample_scale),
                      method='bilinear',
                      align_corners=bool(self.config.get('align_corners',
                                                         True)))


@registry.OP.register()
class SimpleFusion(nn.Module):
    """Upsample-to-finest + concat + 1x1 conv-bn-relu
    (parity: ``hrnet_head.py:8-25``)."""

    in_channels: int = 480
    align_corners: bool = True    # reference: interpolate(align_corners=True)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat_list, train: bool = False):
        target = feat_list[0].shape[1:3]
        ups = [feat_list[0]] + [resize(f, shape=target, method='bilinear',
                                       align_corners=self.align_corners)
                                for f in feat_list[1:]]
        y = channel_concat(ups)
        return ConvBlock(self.in_channels, 1, norm='bn', dtype=self.dtype,
                         name='fuse_conv')(y, train)


@registry.MODEL.register()
class HRNetHead(ERModule):
    """SimpleFusion → classifier → upsample (parity: ``hrnet_head.py:28-49``)."""

    def set_default_config(self):
        self.config.update(dict(
            hrnet_decoder=dict(in_channels=480),
            num_classes=3,
            upsample_scale=4.0,
            align_corners=True,   # reference: nn.UpsamplingBilinear2d
            dtype='float32',
        ))

    @nn.compact
    def __call__(self, feat_list, train: bool = False):
        dtype = jnp.dtype(self.config.dtype)
        y = SimpleFusion(dtype=dtype, name='fusion',
                         **self.config.hrnet_decoder.to_dict())(feat_list, train)
        y = nn.Conv(self.config.num_classes, (1, 1), dtype=dtype,
                    name='classifier')(y)
        return resize(y, scale=float(self.config.upsample_scale),
                      method='bilinear',
                      align_corners=bool(self.config.get('align_corners',
                                                         True)))
