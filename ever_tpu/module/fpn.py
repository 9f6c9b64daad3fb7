"""FPN, AssymetricDecoder, Fusion, BiFPN (NHWC, flax.linen).

Parity target: ``ever/module/fpn.py:40-309``.  The bf16 interpolate
workaround (``fpn.py:96-102``) is unnecessary: :func:`ever_tpu.module.ops.resize`
handles dtype.  Upsampling in the top-down path is nearest (parity).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ever_tpu.core import registry
from ever_tpu.module.ops import (ConvBlock, Norm, SeparableConvBlock,
                                 max_pool, resize)

__all__ = ['FPN', 'LastLevelMaxPool', 'LastLevelP6P7', 'AssymetricDecoder',
           'Fusion', 'BiFPN']

Dtype = Any


@registry.OP.register()
class FPN(nn.Module):
    """Feature Pyramid Network over ``[c2, c3, c4, c5]``.

    ``conv_norm``/``conv_act`` control the lateral/output conv blocks (the
    reference's ``conv_with_kaiming_uniform(use_bn, use_relu)`` factory,
    ``fpn.py:23-37``).  ``top_blocks``: None | 'maxpool' | 'p6p7'.
    Returns highest-resolution-first (parity: ``fpn.py:82-115``).
    """

    in_channels_list: Sequence[int]   # kept for config parity; inferred from inputs
    out_channels: int = 256
    conv_norm: Optional[str] = None
    conv_act: bool = False
    top_blocks: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        act = nn.relu if self.conv_act else None
        # reference conv factory parity (``fpn.py:23-37``): EVERY fpn conv —
        # 1x1 inner and 3x3 layer, with or without bn — is kaiming-uniform
        # (a=1) initialized and bias-FREE
        kinit = nn.initializers.variance_scaling(1.0, 'fan_in', 'uniform')

        def block(k, name):
            return ConvBlock(self.out_channels, k, norm=self.conv_norm, act=act,
                             use_bias=False, kernel_init=kinit,
                             dtype=self.dtype, name=name)

        n = len(feats)
        last_inner = nn.Conv(self.out_channels, (1, 1), kernel_init=kinit,
                             use_bias=False,
                             dtype=self.dtype, name=f'fpn_inner{n}')(feats[-1]) \
            if self.conv_norm is None else block(1, f'fpn_inner{n}')(feats[-1], train)
        results = [block(3, f'fpn_layer{n}')(last_inner, train)]
        for idx in range(n - 2, -1, -1):
            lateral = (nn.Conv(self.out_channels, (1, 1), kernel_init=kinit,
                               use_bias=False,
                               dtype=self.dtype, name=f'fpn_inner{idx + 1}')(feats[idx])
                       if self.conv_norm is None
                       else block(1, f'fpn_inner{idx + 1}')(feats[idx], train))
            top_down = resize(last_inner, shape=lateral.shape[1:3], method='nearest')
            last_inner = lateral + top_down
            results.insert(0, block(3, f'fpn_layer{idx + 1}')(last_inner, train))

        if self.top_blocks == 'maxpool':
            results.append(LastLevelMaxPool()(results[-1]))
        elif self.top_blocks == 'p6p7':
            results.extend(LastLevelP6P7(self.out_channels, dtype=self.dtype,
                                         name='top_blocks')(feats[-1], results[-1]))
        return tuple(results)


class LastLevelMaxPool(nn.Module):
    """Stride-2 1x1 maxpool extra level (parity: ``fpn.py:118-120``)."""

    @nn.compact
    def __call__(self, x):
        return max_pool(x, 1, 2, padding='VALID')


class LastLevelP6P7(nn.Module):
    """RetinaNet-style P6/P7 (parity: ``fpn.py:123-141``)."""

    out_channels: int
    use_c5: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c5, p5):
        # reference init (``fpn.py:130-134``): kaiming-uniform(a=1) weights,
        # zero bias
        kinit = nn.initializers.variance_scaling(1.0, 'fan_in', 'uniform')
        x = c5 if self.use_c5 else p5
        p6 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding='SAME',
                     kernel_init=kinit, dtype=self.dtype, name='p6')(x)
        p7 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding='SAME',
                     kernel_init=kinit, dtype=self.dtype, name='p7')(nn.relu(p6))
        return [p6, p7]


@registry.OP.register()
class AssymetricDecoder(nn.Module):
    """FarSeg decoder: per-scale conv→norm→act→2x-up stacks, averaged.

    Parity: ``ever/module/fpn.py:144-193``; the (intentional) reference
    spelling is preserved.  ``norm='bn'`` uses ReLU, other norms use GELU
    (parity with the norm_fn-dependent activation).  Optional classifier
    config: ``{num_classes, kernel_size, scale_factor, dropout_rate}``.
    """

    in_channels: int = 256            # config parity; inferred from inputs
    out_channels: int = 256
    in_feat_output_strides: Sequence[int] = (4, 8, 16, 32)
    out_feat_output_stride: int = 4
    norm: Optional[str] = 'bn'
    classifier_config: Optional[dict] = None
    # torch UpsamplingBilinear2d parity (align_corners=True) for ported
    # reference checkpoints; False = half-pixel (TPU-cheaper) for new configs
    align_corners: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat_list: Sequence[jnp.ndarray], train: bool = False,
                 rngs_key: str = 'dropout'):
        act = nn.relu if self.norm == 'bn' else nn.gelu
        inner = []
        for idx, in_os in enumerate(self.in_feat_output_strides):
            num_upsample = int(math.log2(in_os)) - int(math.log2(self.out_feat_output_stride))
            num_layers = max(num_upsample, 1)
            y = feat_list[idx]
            for layer in range(num_layers):
                y = ConvBlock(self.out_channels, 3, norm=self.norm, act=act,
                              dtype=self.dtype,
                              name=f'block{idx}_conv{layer}')(y, train)
                if num_upsample > 0:
                    y = resize(y, scale=2, method='bilinear',
                               align_corners=self.align_corners)
            inner.append(y)
        out = sum(inner) / len(inner)

        if self.classifier_config:
            cfg = dict(self.classifier_config)
            dropout_rate = cfg.get('dropout_rate', -1)
            if dropout_rate and dropout_rate > 0:
                out = nn.Dropout(rate=dropout_rate, deterministic=not train)(out)
            k = int(cfg.get('kernel_size', 1))
            out = nn.Conv(int(cfg['num_classes']), (k, k), padding='SAME',
                          dtype=self.dtype, name='classifier')(out)
            scale = cfg.get('scale_factor', 1)
            if scale and scale > 1:
                out = resize(out, scale=float(scale), method='bilinear',
                             align_corners=self.align_corners)
        return out


@registry.OP.register()
class Fusion(nn.Module):
    """Learnable-weight feature fusion (parity: ``fpn.py:196-225``).

    ``norm_method``: 'softmax' (weights zero-init) or 'fast_normalize'
    (relu + sum-normalize, weights ones-init).
    """

    num_inputs: int
    norm_method: str = 'fast_normalize'
    eps: float = 1e-4

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        if self.norm_method == 'softmax':
            w = self.param('weights', nn.initializers.zeros, (self.num_inputs,))
            w = nn.softmax(w)
        elif self.norm_method == 'fast_normalize':
            w = self.param('weights', nn.initializers.ones, (self.num_inputs,))
            w = nn.relu(w)
            w = w / (jnp.sum(w) + self.eps)
        else:
            raise NotImplementedError(self.norm_method)
        stacked = jnp.stack(features, axis=0)
        return jnp.tensordot(w.astype(stacked.dtype), stacked, axes=1)


class _FusedConv3x3(nn.Module):
    """Fusion → separable 3x3 → bn → relu (parity: ``fpn.py:228-245``)."""

    num_inputs: int
    out_channels: int
    norm_method: str = 'fast_normalize'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        y = Fusion(self.num_inputs, self.norm_method)(features)
        return SeparableConvBlock(self.out_channels, 3, norm='bn',
                                  dtype=self.dtype)(y, train)


@registry.OP.register()
class BiFPN(nn.Module):
    """Bidirectional FPN layer over equal-channel features (parity:
    ``fpn.py:247-309``): top-down pass with 2-input fusions, then bottom-up
    pass with 3-input fusions."""

    in_channels: int
    feature_strides: Sequence[int]
    normalized_fusion: str = 'fast_normalize'
    downsample_op: str = 'conv'     # 'conv' | 'maxpool'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], train: bool = False):
        n = len(self.feature_strides)
        assert len(features) == n
        feats = list(features)

        # top-down: finest-last list; walk from coarsest to finest.
        # Reference (fpn.py:264-268): when the paired level has the SAME
        # stride as the coarsest (duplicate-stride configs), the resample is
        # a learned 1x1 conv-bn-relu adapter, not an (identity) resize
        cs = max(self.feature_strides)
        inner = []
        for idx in range(n - 1):
            x_top = feats.pop()
            x_down = feats.pop()
            fs_up = list(self.feature_strides)[::-1][1:][idx]
            if cs / fs_up > 1:
                up = resize(x_top, shape=x_down.shape[1:3], method='nearest')
            else:
                up = ConvBlock(self.in_channels, 1, norm='bn',
                               dtype=self.dtype, name=f'up{idx}_adapter')(
                    x_top, train)
            fused = _FusedConv3x3(2, self.in_channels, self.normalized_fusion,
                                  dtype=self.dtype,
                                  name=f'bin_fusion{idx}')(
                [x_down, up], train)
            feats.append(fused)
            inner.append(fused)
        inner.reverse()
        inner.append(features[-1])

        # bottom-up
        out = [inner[0]]
        for idx in range(n - 1):
            x_bottom = inner.pop(0)
            x_up = inner.pop(0)
            fs_dn = list(self.feature_strides)[idx]
            if cs / fs_dn <= 1:
                # duplicate-stride level: learned adapter (fpn.py:276-278)
                down = ConvBlock(self.in_channels, 1, norm='bn',
                                 dtype=self.dtype,
                                 name=f'down{idx}_adapter')(x_bottom, train)
            elif self.downsample_op == 'conv':
                down = ConvBlock(self.in_channels, 3, stride=2, norm='bn',
                                 dtype=self.dtype,
                                 name=f'down{idx}')(x_bottom, train)
            else:
                # reference applies BN+ReLU after the pool too
                # (ever/module/fpn.py:270-275)
                down = max_pool(x_bottom, 3, 2, padding=((1, 1), (1, 1)))
                down = Norm('bn', dtype=self.dtype,
                            name=f'down{idx}_bn')(down, train)
                down = nn.relu(down)
            fused = _FusedConv3x3(3, self.in_channels, self.normalized_fusion,
                                  dtype=self.dtype,
                                  name=f'tri_fusion{idx}')(
                [features[idx + 1], x_up, down], train)
            inner.insert(0, fused)
            out.append(fused)
        return out


# -- reference spellings (fpn.py:18-36, 227-244) ------------------------------

def init_conv():
    """Kaiming-uniform(a=1) conv kernel init (parity: ``fpn.py:18-20``) —
    torch's ``kaiming_uniform_(w, a=1)`` is variance_scaling(1, fan_in,
    uniform) in flax."""
    return nn.initializers.variance_scaling(1.0, 'fan_in', 'uniform')


def conv_with_kaiming_uniform(use_bn: bool = False, use_relu: bool = False):
    """Return a ConvBlock factory with FPN's init (parity: ``fpn.py:23-36``)."""
    def make_conv(features, kernel_size, stride=1, dilation=1, **kw):
        from ever_tpu.module.ops import ConvBlock
        kw.setdefault('kernel_init', init_conv())
        return ConvBlock(features, kernel_size, stride, dilation,
                         norm='bn' if use_bn else None,
                         act=nn.relu if use_relu else None, **kw)
    return make_conv


class FastNormalizedFusionConv3x3(_FusedConv3x3):
    """relu-sum-normalized fusion → sepconv3x3-bn-relu (parity:
    ``fpn.py:227-234``)."""

    norm_method: str = 'fast_normalize'


class NormalizedFusionConv3x3(_FusedConv3x3):
    """softmax-weighted fusion → sepconv3x3-bn-relu (parity:
    ``fpn.py:237-244``)."""

    norm_method: str = 'softmax'


__all__ += ['init_conv', 'conv_with_kaiming_uniform',
            'FastNormalizedFusionConv3x3', 'NormalizedFusionConv3x3']
