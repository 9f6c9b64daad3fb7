"""EfficientNet encoders (native MBConv, NHWC, flax.linen).

Parity target: ``ever/module/efficientnet.py:8-106`` (``EFNetEncoder``): the
reference wraps the optional ``efficientnet_pytorch`` package with feature
taps at stride-2 block boundaries (``prev_x`` entering each downsample plus
the final block output → FIVE multi-scale features at os2/4/8/16/32,
``efficientnet.py:21-31,66-84``) and output-stride dilation surgery
(``nostride_dilate``, ``efficientnet.py:87-106``: the formerly-strided
"endpoint" depthwise conv keeps the previous dilation level, later convs get
the doubled one).  Here the MBConv trunk is implemented natively (b0–b7
compound scaling) with the same tap points and static dilation geometry, and
weights transplant from ``efficientnet_pytorch`` checkpoints via
``util.weight_io.convert_torch_efficientnet``.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ever_tpu.core import registry
from ever_tpu.interface.module import ERModule
from ever_tpu.module.ops import Norm, global_avg_pool

__all__ = ['EfficientNet', 'EFNetEncoder', 'EFFICIENTNET_SPECS']

Dtype = Any

# TF/efficientnet_pytorch batch-norm epsilon (batch_norm_epsilon=1e-3)
BN_EPS = 1e-3

# base (B0) stage settings: (expand, channels, layers, stride, kernel)
_B0_STAGES = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]

# name → (width_mult, depth_mult)
EFFICIENTNET_SPECS = {
    'efficientnet-b0': (1.0, 1.0),
    'efficientnet-b1': (1.0, 1.1),
    'efficientnet-b2': (1.1, 1.2),
    'efficientnet-b3': (1.2, 1.4),
    'efficientnet-b4': (1.4, 1.8),
    'efficientnet-b5': (1.6, 2.2),
    'efficientnet-b6': (1.8, 2.6),
    'efficientnet-b7': (2.0, 3.1),
}


def _round_filters(c: int, width_mult: float, divisor: int = 8) -> int:
    c = c * width_mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


def _round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * r))


def stage_repeats(model_name: str) -> Sequence[int]:
    """Per-stage block counts after compound depth scaling (used by the
    weight converter to map the package's flat ``_blocks.{i}`` index to our
    ``stage{s}_block{b}`` names)."""
    _, dm = EFFICIENTNET_SPECS[model_name]
    return [_round_repeats(layers, dm) for (_, _, layers, _, _) in _B0_STAGES]


class MBConv(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation."""

    features: int
    expand_ratio: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    se_ratio: float = 0.25
    drop_connect_rate: float = 0.0
    bn_frozen: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        identity = x
        h = x
        mid = cin * self.expand_ratio
        if self.expand_ratio != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name='expand_conv')(h)
            h = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen,
                     eps=BN_EPS, name='expand_bn')(h, train)
            h = nn.silu(h)
        h = nn.Conv(mid, (self.kernel, self.kernel), strides=(self.stride,) * 2,
                    kernel_dilation=(self.dilation,) * 2, padding='SAME',
                    feature_group_count=mid, use_bias=False, dtype=self.dtype,
                    name='dw_conv')(h)
        h = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen,
                 eps=BN_EPS, name='dw_bn')(h, train)
        h = nn.silu(h)
        if self.se_ratio:
            se_c = max(1, int(cin * self.se_ratio))
            s = global_avg_pool(h)
            s = nn.silu(nn.Conv(se_c, (1, 1), dtype=self.dtype, name='se_reduce')(s))
            s = nn.sigmoid(nn.Conv(mid, (1, 1), dtype=self.dtype, name='se_expand')(s))
            h = h * s
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name='project_conv')(h)
        h = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen,
                 eps=BN_EPS, name='project_bn')(h, train)
        if self.stride == 1 and cin == self.features:
            # drop-connect (stochastic depth): drop the whole residual
            # branch per sample with 1/(1-p) rescale, training only
            # (parity: the package's drop_connect, applied per block with a
            # linearly scaled rate — ever/module/efficientnet.py:24-27)
            if self.drop_connect_rate:
                h = nn.Dropout(self.drop_connect_rate,
                               broadcast_dims=(1, 2, 3))(
                    h, deterministic=not train)
            h = h + identity
        return h


class EfficientNet(nn.Module):
    """Trunk returning the reference's five taps: the feature map entering
    each stride-2 boundary (os2/os4/os8/os16) plus the final block output
    (os32) — ``ever/module/efficientnet.py:21-31``."""

    model_name: str = 'efficientnet-b0'
    output_stride: int = 32
    drop_connect_rate: float = 0.2   # package default; linearly scaled/block
    bn_frozen: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        wm, dm = EFFICIENTNET_SPECS[self.model_name]
        x = nn.Conv(_round_filters(32, wm), (3, 3), strides=(2, 2),
                    padding='SAME', use_bias=False, dtype=self.dtype,
                    name='stem_conv')(x)
        x = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen,
                 eps=BN_EPS, name='stem_bn')(x, train)
        x = nn.silu(x)

        feats = []
        current_stride = 2
        dilation = 1
        total_blocks = sum(_round_repeats(layers, dm)
                           for (_, _, layers, _, _) in _B0_STAGES)
        block_idx = 0
        for si, (expand, c, layers, stride, kernel) in enumerate(_B0_STAGES):
            features = _round_filters(c, wm)
            repeats = _round_repeats(layers, dm)
            first_dil = dilation
            if stride == 2:
                feats.append(x)   # reference taps prev_x at each downsample
                if current_stride * 2 > self.output_stride:
                    # os surgery: the endpoint (formerly strided) depthwise
                    # conv keeps the PREVIOUS dilation; later convs double it
                    # (parity: nostride_dilate, efficientnet.py:87-106)
                    dilation *= 2
                    stride = 1
                else:
                    current_stride *= 2
            for li in range(repeats):
                x = MBConv(features, expand, kernel,
                           stride=stride if li == 0 else 1,
                           dilation=first_dil if li == 0 else dilation,
                           drop_connect_rate=(self.drop_connect_rate
                                              * block_idx / total_blocks),
                           bn_frozen=self.bn_frozen,
                           dtype=self.dtype,
                           name=f'stage{si}_block{li}')(x, train)
                block_idx += 1
        feats.append(x)
        return feats


for _name in EFFICIENTNET_SPECS:
    registry.MODEL.register(
        _name, (lambda n: lambda **kw: EfficientNet(model_name=n, **kw))(_name))


@registry.MODEL.register()
class EFNetEncoder(ERModule):
    """Config surface parity with ``ever/module/efficientnet.py:8-106``."""

    def set_default_config(self):
        self.config.update(dict(
            efficientnet_type='efficientnet-b0',
            ef_name='',         # reference spelling (efficientnet.py:45);
            output_stride=32,   # wins over efficientnet_type when set
            bn_frozen=False,
            dtype='float32',
        ))

    @property
    def _model_name(self) -> str:
        return self.config.get('ef_name') or self.config.efficientnet_type

    def setup(self):
        self.net = EfficientNet(
            model_name=self._model_name,
            output_stride=self.config.output_stride,
            bn_frozen=self.config.bn_frozen,
            dtype=jnp.dtype(self.config.dtype),
        )

    def __call__(self, x, train: bool = False):
        return self.net(x, train)

    @property
    def out_channels(self) -> Tuple[int, ...]:
        """Reference channel table (``efficientnet.py:66-84``)."""
        table = {
            'efficientnet-b0': (16, 24, 40, 112, 320),
            'efficientnet-b1': (16, 24, 40, 112, 320),
            'efficientnet-b2': (16, 24, 48, 120, 352),
            'efficientnet-b3': (24, 32, 48, 136, 384),
            'efficientnet-b4': (24, 32, 56, 160, 448),
            'efficientnet-b5': (24, 40, 64, 176, 512),
            'efficientnet-b6': (32, 40, 72, 200, 576),
            'efficientnet-b7': (32, 48, 80, 224, 640),
        }
        return table[self._model_name]


def nostride_dilate(encoder, dilate):
    """Reference spelling (``ever/module/efficientnet.py:87-106``): convert
    stride-2 blocks to dilated stride-1.  The torch original mutates conv
    modules in place; here dilation surgery is driven by the encoder's
    ``output_stride`` config, so this returns a reconfigured copy
    (``output_stride = 32 // dilate``)."""
    cfg = encoder.config.to_dict()
    cfg['output_stride'] = max(32 // int(dilate), 8)
    return type(encoder)(cfg)
