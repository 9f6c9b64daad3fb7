"""ResNet family encoders (NHWC, flax.linen, bf16-ready).

Parity target: ``ever/module/_resnets.py`` (BasicBlock/Bottleneck/ResNet +
resnet18/34/50/101/152, resnext50_32x4d, resnext101_32x4d/8d, deep-stem
v1c variants) and ``ever/module/resnet.py:73-265`` (``ResNetEncoder``:
output_stride 8/16/32 dilation surgery, BN freezing, stage freezing,
per-stage gradient checkpointing, in-channel patching, multi-scale
``[c2,c3,c4,c5]`` features, SE/GC plugins).

TPU-first differences:

- The output-stride "surgery" (``resnet.py:236-251``) is not post-hoc module
  mutation: stage strides/dilations are *computed at construction* so the
  traced graph is static.
- ``with_cp`` gradient checkpointing maps to ``nn.remat`` per stage
  (``resnet.py:189-208``).
- Stage freezing (``freeze_at``) is an optimizer concern in JAX: the encoder
  exposes :meth:`frozen_param_prefixes`; the trainer masks those subtrees
  with ``optax.set_to_zero`` (parity: ``resnet.py:162-173``).
- BN freezing (``batchnorm_trainable=False``) pins running stats via the
  ``Norm(frozen=True)`` flag (parity: ``resnet.py:155-160,227-234``).
- Weight porting from torchvision ``.pth`` (incl. first-conv channel
  recycling, ``resnet.py:55-69``) lives in ``ever_tpu/util/weight_io.py``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ever_tpu.core import registry
from ever_tpu.interface.module import ERModule
from ever_tpu.module.context_block import ContextBlock2d
from ever_tpu.module.ops import Norm, max_pool
from ever_tpu.module.se_block import SEBlock

__all__ = ['BasicBlock', 'Bottleneck', 'ResNet', 'ResNetEncoder', 'RESNET_SPECS']

Dtype = Any


def _conv(features, kernel, stride=1, dilation=1, groups=1, name=None, dtype=jnp.float32):
    # explicit symmetric padding (torch convention): lax 'SAME' pads
    # asymmetrically for stride-2 (lo=2,hi=3 for k=7), shifting features by
    # one pixel vs pretrained torch weights
    p = dilation * (kernel - 1) // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   kernel_dilation=(dilation, dilation), padding=((p, p), (p, p)),
                   feature_group_count=groups, use_bias=False, dtype=dtype,
                   name=name)


# -- space-to-depth stem -------------------------------------------------------
# The 7x7/2 stem conv has C_in=3, which starves the MXU's 128-deep
# contraction.  The canonical TPU fix: stride-2 conv == stride-1 conv over
# the 2x2 space-to-depth of the input, with the 7x7 kernel zero-padded to
# 8x8 and regrouped to [4,4,4*Cin,64].  The parameter stays the original
# [7,7,Cin,64] kernel (pretrained weights / checkpoints unchanged); the fold
# is a constant rearrangement traced into the graph (differentiable).

def space_to_depth(x: jnp.ndarray, block: int = 4) -> jnp.ndarray:
    """[B, H, W, C] → [B, H/b, W/b, b*b*C] with channel order (a*b + b_idx)*C + c."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h // block, w // block, block * block * c)


class S2DStemConv(nn.Module):
    """Drop-in replacement for the 7x7/2 stem conv (exact numerics).

    Holds the ORIGINAL [7,7,Cin,features] kernel as its parameter; folds it
    at trace time.  Requires H, W divisible by 2.

    Factorization: a stride-2 conv is a stride-1 conv over the 2x2
    space-to-depth transform of the input.  The 7x7 kernel is zero-padded
    to 8x8 (one leading row/col) and regrouped into [4, 4, 4*Cin, features];
    the conv then runs with padding (2, 1) per axis.  This lifts the MXU
    contraction depth from 7·Cin-per-row (C_in=3 starves the systolic
    array — measured 1.38 ms for the stem conv at 512², ~27x off roofline)
    to 4·4·4·Cin=192 with no depth-to-space on the output.

    All modes hold the same [7,7,Cin,features] parameter and compute the
    identical function; they differ only in how the 2x2 block structure is
    expressed to XLA:

    - ``s2d``: explicit space-to-depth of the input ([B,H/2,W/2,4C]) then a
      4x4 stride-1 conv.  The input transpose is a real HBM copy
      (~0.55 ms at 512² batch 8 — the cost this family tries to remove).
    - ``s2dw``: block only W into features via a PURE VIEW
      ([B,H,W/2,2C] is a contiguity-preserving reshape), kernel [8,4,2C,F]
      (also a pure reshape of the zero-padded 8x8 kernel), stride (2,1).
      No input copy at all.
    - ``s2d3``: both axes blocked, H's intra-block offset kept as a third
      conv spatial dim of size 2 (window 2): input view [B,H/2,2,W/2,2C],
      kernel [4,2,4,2C,F] — both pure reshapes, no copies.

    MEASURED (FarSeg-R50 512² b8 bf16 train, v5e): ``s2d`` 33.06 ms/step,
    ``s2dw`` 33.72, ``s2d3`` 37.34.  The copy-free views do remove the
    0.45 ms input transpose (trace: ``copy`` 14.8 → 10.3 ms/10 steps) but
    XLA lowers the C_in=6 strided conv forms worse (fusion +0.9 ms/step),
    so the explicit s2d copy stays the default recommendation.

    - ``s2d_input``: the INPUT arrives already space-to-depth'd
      ([B,H/2,W/2,4*Cin], channel order ``(dy*2+dx)*Cin + c`` — what the
      host data pipeline produces with :func:`space_to_depth` semantics or
      ``preprocess.SpaceToDepth``).  Same folded conv, no device-side
      rearrangement at all; ``in_channels`` config still means the ORIGINAL
      channel count (the [7,7,Cin,F] parameter is unchanged).
    """

    features: int = 64
    dtype: Any = jnp.float32
    mode: str = 's2d'

    @nn.compact
    def __call__(self, x):
        cin = (x.shape[-1] // 4 if self.mode.startswith('s2d_input')
               else x.shape[-1])
        n, h, w, _ = x.shape
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (7, 7, cin, self.features))
        w8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        x = x.astype(self.dtype)
        if self.mode == 's2dw':
            # cols blocked into features; rows stay a strided spatial axis
            wk = w8.reshape(8, 4, 2 * cin, self.features).astype(self.dtype)
            s = x.reshape(n, h, w // 2, 2 * cin)
            return jax.lax.conv_general_dilated(
                s, wk, (2, 1), ((4, 2), (2, 1)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=self.dtype)
        if self.mode == 's2d3':
            # rows -> (block, intra) spatial pair, cols -> features
            wk = w8.reshape(4, 2, 4, 2 * cin, self.features).astype(self.dtype)
            s = x.reshape(n, h // 2, 2, w // 2, 2 * cin)
            out = jax.lax.conv_general_dilated(
                s, wk, (1, 2, 1), ((2, 1), (0, 0), (2, 1)),
                dimension_numbers=('NHSWC', 'HSWIO', 'NHSWC'),
                preferred_element_type=self.dtype)
            return out.reshape(n, h // 2, w // 2, self.features)
        # classic s2d: explicit input space-to-depth + 4x4 conv
        # [2k+p, 2l+q, c, f] → [k, l, (p*2+q)*c + ci, f]
        w8 = w8.reshape(4, 2, 4, 2, cin, self.features)
        w2 = jnp.transpose(w8, (0, 2, 1, 3, 4, 5)).reshape(
            4, 4, 4 * cin, self.features).astype(self.dtype)
        s = x if self.mode.startswith('s2d_input') else space_to_depth(x, 2)
        if self.mode.endswith('_pack2') and s.shape[2] % 2 == 0:
            # pack2 over the output width: the union window of an adjacent
            # output pair spans 3 packed cols (K=4·3·2c) vs the unpacked
            # window 4 (K=4·4·c) — 25% fewer MXU passes at N=2F=128 lanes.
            c4, f = 4 * cin, self.features
            wp = jnp.zeros((4, 3, 2 * c4, 2 * f), w2.dtype)
            wp = wp.at[:, 0, 0:c4, 0:f].set(w2[:, 0])
            wp = wp.at[:, 0, c4:, 0:f].set(w2[:, 1])
            wp = wp.at[:, 1, 0:c4, 0:f].set(w2[:, 2])
            wp = wp.at[:, 1, c4:, 0:f].set(w2[:, 3])
            wp = wp.at[:, 0, c4:, f:].set(w2[:, 0])
            wp = wp.at[:, 1, 0:c4, f:].set(w2[:, 1])
            wp = wp.at[:, 1, c4:, f:].set(w2[:, 2])
            wp = wp.at[:, 2, 0:c4, f:].set(w2[:, 3])
            b, hh, ww, _ = s.shape
            z = s.reshape(b, hh, ww // 2, 2 * c4)          # free NHWC view
            out = jax.lax.conv_general_dilated(
                z, wp, (1, 1), ((2, 1), (1, 1)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=self.dtype)
            return out.reshape(b, hh, ww, f)               # free view back
        return jax.lax.conv_general_dilated(
            s, w2, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=self.dtype)


class BasicBlock(nn.Module):
    expansion = 1

    filters: int
    stride: int = 1
    dilation: int = 1
    conv_dilation: int = 1       # dilation of the stride-carrying conv
    downsample: bool = False
    bn_frozen: bool = False
    se_ratio: Optional[int] = None
    gc_ratio: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = _conv(self.filters, 3, self.stride, self.conv_dilation, name='conv1',
                  dtype=self.dtype)(x)
        y = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen, name='bn1')(y, train)
        y = nn.relu(y)
        y = _conv(self.filters, 3, 1, self.dilation, name='conv2', dtype=self.dtype)(y)
        y = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen, name='bn2')(y, train)
        if self.se_ratio:
            y = SEBlock(self.se_ratio, dtype=self.dtype)(y)
        if self.gc_ratio:
            y = ContextBlock2d(self.gc_ratio, dtype=self.dtype)(y)
        if self.downsample:
            identity = _conv(self.filters * self.expansion, 1, self.stride,
                             name='downsample_conv', dtype=self.dtype)(x)
            identity = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen,
                            name='downsample_bn')(identity, train)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    expansion = 4

    filters: int
    stride: int = 1
    dilation: int = 1
    conv_dilation: int = 1
    downsample: bool = False
    groups: int = 1
    width_per_group: int = 64
    bn_frozen: bool = False
    se_ratio: Optional[int] = None
    gc_ratio: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.filters * (self.width_per_group / 64.0)) * self.groups
        identity = x
        y = _conv(width, 1, name='conv1', dtype=self.dtype)(x)
        y = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen, name='bn1')(y, train)
        y = nn.relu(y)
        # stride on the 3x3 (torchvision v1.5 convention, matching the reference)
        y = _conv(width, 3, self.stride, self.conv_dilation, groups=self.groups,
                  name='conv2', dtype=self.dtype)(y)
        y = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen, name='bn2')(y, train)
        y = nn.relu(y)
        y = _conv(self.filters * self.expansion, 1, name='conv3', dtype=self.dtype)(y)
        y = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen, name='bn3')(y, train)
        if self.se_ratio:
            y = SEBlock(self.se_ratio, dtype=self.dtype)(y)
        if self.gc_ratio:
            y = ContextBlock2d(self.gc_ratio, dtype=self.dtype)(y)
        if self.downsample:
            identity = _conv(self.filters * self.expansion, 1, self.stride,
                             name='downsample_conv', dtype=self.dtype)(x)
            identity = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen,
                            name='downsample_bn')(identity, train)
        return nn.relu(y + identity)


# -- pack2 layout (layer1) -----------------------------------------------------
# 64-channel stages only half-fill the MXU's 128 lanes.  The pack2 layout
# views two adjacent width pixels' channels as one 128-lane vector — a FREE
# reshape in NHWC ([B,H,W,C] -> [B,H,W/2,2C] merges contiguous trailing dims)
# — and runs every conv with zero-block-structured packed weights on the
# packed grid.  Measured on v5e: layer1 fwd+bwd 5.66 -> 4.44 ms (1.28x); the
# true [k,k,cin,cout] kernels stay the checkpoint parameters and the packing
# is traced (differentiable), so converters/checkpoints are unchanged.
# Derivation + fp32 exactness checks: docs/PERFORMANCE.md "pack2".


def _pack_w_1x1(w, k=2):
    """[1,1,cin,cout] -> [1,1,k·cin,k·cout] block-diagonal (k pixels/row)."""
    cin, cout = w.shape[2], w.shape[3]
    z = jnp.zeros((1, 1, k * cin, k * cout), w.dtype)
    for p in range(k):
        z = z.at[:, :, p * cin:(p + 1) * cin, p * cout:(p + 1) * cout].set(w)
    return z


def _pack_w_3x3(w, k=2):
    """[3,3,c,c] stride-1 -> [3,3,k·c,k·c] over the packed (H, W/k) grid.

    Output sub-position p (orig col k·w2+p) reads orig cols k·w2+p-1..+1:
    all inside packed col w2 for 0<p<k-1; p=0 additionally reads the last
    sub of col w2-1, p=k-1 the first sub of col w2+1.  SAME padding on the
    packed grid supplies exactly the border zeros of the unpacked conv.
    """
    c = w.shape[2]
    z = jnp.zeros((3, 3, k * c, k * c), w.dtype)
    sub = lambda p: slice(p * c, (p + 1) * c)
    z = z.at[:, 0, sub(k - 1), sub(0)].set(w[:, 0])       # p=0 ← col w2-1
    for p in range(k):
        if p - 1 >= 0:
            z = z.at[:, 1, sub(p - 1), sub(p)].set(w[:, 0])
        z = z.at[:, 1, sub(p), sub(p)].set(w[:, 1])
        if p + 1 < k:
            z = z.at[:, 1, sub(p + 1), sub(p)].set(w[:, 2])
    z = z.at[:, 2, sub(0), sub(k - 1)].set(w[:, 2])       # p=k-1 ← col w2+1
    return z


def _pack_factor(c: int, w: int) -> int:
    """Pick the pack factor k ∈ {1,2,4,8} minimizing MXU passes for a
    c-channel stride-1 conv on a w-wide grid: passes ∝ pad128(k·c)/k.
    Prefers the smallest k at the optimum (less zero-block K)."""
    pad128 = lambda n: -(-n // 128) * 128
    best, best_cost = 1, pad128(c)
    for k in (2, 4, 8):
        if w % k:
            continue
        cost = pad128(k * c) / k
        if cost < best_cost:
            best, best_cost = k, cost
    return best


class _Pack2Conv(nn.Module):
    """Conv on the pack-k layout; the parameter is the TRUE (unpacked) kernel
    at the same path/shape as ``nn.Conv`` (``kernel``)."""

    features: int            # true output channels
    kernel: int              # 1 or 3
    in_features: int         # true input channels
    k: int = 2               # pack factor
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, self.in_features,
                        self.features), jnp.float32)
        wp = (_pack_w_3x3(w, self.k) if self.kernel == 3
              else _pack_w_1x1(w, self.k))
        return jax.lax.conv_general_dilated(
            z.astype(self.dtype), wp.astype(self.dtype), (1, 1),
            ((self.kernel // 2,) * 2,) * 2,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class _Pack2BatchNorm(nn.Module):
    """BatchNorm over the pack-k layout with TRUE-channel [C] variables at
    the same paths as ``nn.BatchNorm`` (checkpoint-compatible).  Batch stats
    are the average of the k lane groups — the exact global statistics up to
    fp32 reduction order."""

    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    k: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.k
        c = x.shape[-1] // k
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
        if self.use_running_average:
            m, v = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(stat_dtype)
            m2 = jnp.mean(x32, axis=(0, 1, 2))
            q2 = jnp.mean(jnp.square(x32), axis=(0, 1, 2))
            m = jnp.mean(m2.reshape(k, c), axis=0)
            v = jnp.mean(q2.reshape(k, c), axis=0) - m * m
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * m).astype(jnp.float32)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * v).astype(jnp.float32)
        mul = jax.lax.rsqrt(v.astype(stat_dtype) + self.epsilon) * scale
        y = ((x.astype(stat_dtype) - jnp.tile(m.astype(stat_dtype), k))
             * jnp.tile(mul, k) + jnp.tile(bias.astype(stat_dtype), k))
        return y.astype(self.dtype)


class _Pack2Norm(nn.Module):
    """Norm('bn')-shaped wrapper so the variable path is ``bnX/BatchNorm_0``."""

    frozen: bool = False
    dtype: Dtype = jnp.float32
    k: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _Pack2BatchNorm(
            use_running_average=(not train) or self.frozen,
            k=self.k, dtype=self.dtype, name='BatchNorm_0')(x)


class Pack2BasicBlock(nn.Module):
    """BasicBlock on the pack-k layout (stride 1, dilation 1, equal in/out
    width, no plugins) — the resnet18/34 layer1 and HRNet-branch case.
    Identical parameter tree to :class:`BasicBlock`."""

    filters: int
    bn_frozen: bool = False
    k: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = False):
        identity = z
        y = _Pack2Conv(self.filters, 3, self.filters, k=self.k,
                       dtype=self.dtype, name='conv1')(z)
        y = _Pack2Norm(self.bn_frozen, self.dtype, self.k, name='bn1')(y, train)
        y = nn.relu(y)
        y = _Pack2Conv(self.filters, 3, self.filters, k=self.k,
                       dtype=self.dtype, name='conv2')(y)
        y = _Pack2Norm(self.bn_frozen, self.dtype, self.k, name='bn2')(y, train)
        return nn.relu(y + identity)


class Pack2Bottleneck(nn.Module):
    """Bottleneck on the pack2 layout (stride 1, dilation 1, no plugins).

    Identical parameter tree to :class:`Bottleneck`; inputs/outputs are the
    packed ``[B, H, W/2, 2C]`` view.
    """

    filters: int
    in_filters: int
    downsample: bool = False
    bn_frozen: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = False):
        identity = z
        y = _Pack2Conv(self.filters, 1, self.in_filters, dtype=self.dtype,
                       name='conv1')(z)
        y = _Pack2Norm(self.bn_frozen, self.dtype, name='bn1')(y, train)
        y = nn.relu(y)
        y = _Pack2Conv(self.filters, 3, self.filters, dtype=self.dtype,
                       name='conv2')(y)
        y = _Pack2Norm(self.bn_frozen, self.dtype, name='bn2')(y, train)
        y = nn.relu(y)
        y = _Pack2Conv(self.filters * 4, 1, self.filters, dtype=self.dtype,
                       name='conv3')(y)
        y = _Pack2Norm(self.bn_frozen, self.dtype, name='bn3')(y, train)
        if self.downsample:
            identity = _Pack2Conv(self.filters * 4, 1, self.in_filters,
                                  dtype=self.dtype, name='downsample_conv')(z)
            identity = _Pack2Norm(self.bn_frozen, self.dtype,
                                  name='downsample_bn')(identity, train)
        return nn.relu(y + identity)


class ResNetStage(nn.Module):
    """One stage (``layerN``) of blocks sharing filters/dilation."""

    block: Any                      # BasicBlock or Bottleneck class
    filters: int
    num_blocks: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    groups: int = 1
    width_per_group: int = 64
    bn_frozen: bool = False
    se_ratio: Optional[int] = None
    gc_ratio: Optional[float] = None
    pack2: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pack_ok = (self.pack2 and self.stride == 1 and self.dilation == 1
                   and self.first_dilation == 1 and self.groups == 1
                   and self.width_per_group == 64 and not self.se_ratio
                   and not self.gc_ratio and x.shape[2] % 2 == 0)
        if pack_ok and self.block is Bottleneck:
            b, h, w, c = x.shape
            z = x.reshape(b, h, w // 2, 2 * c)            # free NHWC view
            needs_ds = c != self.filters * self.block.expansion
            z = Pack2Bottleneck(self.filters, c, downsample=needs_ds,
                                bn_frozen=self.bn_frozen, dtype=self.dtype,
                                name='block0')(z, train)
            for i in range(1, self.num_blocks):
                z = Pack2Bottleneck(self.filters, self.filters * 4,
                                    bn_frozen=self.bn_frozen, dtype=self.dtype,
                                    name=f'block{i}')(z, train)
            return z.reshape(b, h, w, self.filters * 4)
        if pack_ok and self.block is BasicBlock and x.shape[-1] == self.filters:
            b, h, w, c = x.shape
            z = x.reshape(b, h, w // 2, 2 * c)            # free NHWC view
            for i in range(self.num_blocks):
                z = Pack2BasicBlock(self.filters, bn_frozen=self.bn_frozen,
                                    dtype=self.dtype, name=f'block{i}')(z, train)
            return z.reshape(b, h, w, c)
        kwargs = dict(bn_frozen=self.bn_frozen, se_ratio=self.se_ratio,
                      gc_ratio=self.gc_ratio, dtype=self.dtype)
        if self.block is Bottleneck:
            kwargs.update(groups=self.groups, width_per_group=self.width_per_group)
        needs_ds = self.stride != 1 or x.shape[-1] != self.filters * self.block.expansion
        x = self.block(self.filters, self.stride, self.dilation,
                       conv_dilation=self.first_dilation, downsample=needs_ds,
                       name='block0', **kwargs)(x, train)
        for i in range(1, self.num_blocks):
            x = self.block(self.filters, 1, self.dilation,
                           conv_dilation=self.dilation, name=f'block{i}',
                           **kwargs)(x, train)
        return x


# name → (block, stage_sizes, groups, width_per_group, deep_stem)
RESNET_SPECS = {
    'resnet18': (BasicBlock, (2, 2, 2, 2), 1, 64, False),
    'resnet34': (BasicBlock, (3, 4, 6, 3), 1, 64, False),
    'resnet50': (Bottleneck, (3, 4, 6, 3), 1, 64, False),
    'resnet101': (Bottleneck, (3, 4, 23, 3), 1, 64, False),
    'resnet152': (Bottleneck, (3, 8, 36, 3), 1, 64, False),
    'resnext50_32x4d': (Bottleneck, (3, 4, 6, 3), 32, 4, False),
    'resnext101_32x4d': (Bottleneck, (3, 4, 23, 3), 32, 4, False),
    'resnext101_32x8d': (Bottleneck, (3, 4, 23, 3), 32, 8, False),
    'resnet50_v1c': (Bottleneck, (3, 4, 6, 3), 1, 64, True),
    'resnet101_v1c': (Bottleneck, (3, 4, 23, 3), 1, 64, True),
}


def _stage_geometry(output_stride: int) -> Sequence[Tuple[int, int, int]]:
    """(stride, dilation, first_dilation) per stage for a given output stride.

    Encodes the ``_nostride_dilate`` surgery (``ever/module/resnet.py:236-251``)
    statically: os16 → layer4 {s1, d2, first d1}; os8 → layer3 {s1, d2, first
    d1}, layer4 {s1, d4, first d2}.
    """
    if output_stride == 32:
        return [(1, 1, 1), (2, 1, 1), (2, 1, 1), (2, 1, 1)]
    if output_stride == 16:
        return [(1, 1, 1), (2, 1, 1), (2, 1, 1), (1, 2, 1)]
    if output_stride == 8:
        return [(1, 1, 1), (2, 1, 1), (1, 2, 1), (1, 4, 2)]
    raise ValueError('output_stride must be 8, 16 or 32.')


class ResNet(nn.Module):
    """Backbone trunk returning multi-scale features [c2, c3, c4, c5]."""

    resnet_type: str = 'resnet50'
    output_stride: int = 32
    include_conv5: bool = True
    bn_frozen: bool = False
    with_cp: Sequence[bool] = (False, False, False, False)
    se_ratio: Optional[int] = None
    gc_ratio: Optional[float] = None
    stem: str = 'conv'              # 'conv' | 's2d' | 's2dw' | 's2d3' (exact folds)
    maxpool_impl: str = 'reduce_window'   # | 'separable' | 'planes' | 'pallas'
    pack2_layer1: bool = False      # run layer1 in the 128-lane pack2 layout
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, sizes, groups, wpg, deep_stem = RESNET_SPECS[self.resnet_type]
        geom = _stage_geometry(self.output_stride)

        # stem: 7x7/2 conv (or deep 3x3x3 stem for v1c), bn, relu, 3x3/2 maxpool
        if deep_stem:
            x = _conv(32, 3, 2, name='stem_conv1', dtype=self.dtype)(x)
            x = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen, name='stem_bn1')(x, train)
            x = nn.relu(x)
            x = _conv(32, 3, 1, name='stem_conv2', dtype=self.dtype)(x)
            x = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen, name='stem_bn2')(x, train)
            x = nn.relu(x)
            x = _conv(64, 3, 1, name='stem_conv3', dtype=self.dtype)(x)
            x = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen, name='stem_bn3')(x, train)
        else:
            # stem='s2d' uses the exact space-to-depth fold of the 7x7/2 conv
            # (same param path/shape, same outputs) — it lifts the stem conv
            # off the MXU's C_in=3 starvation (1.38 -> 0.43 ms measured).
            # The even-H/W guard only applies to ON-DEVICE fold modes: in
            # 's2d_input' mode x is ALREADY folded by the loader (its dims
            # halved, possibly odd) and a fallback 7x7/2 conv over the
            # folded layout would be geometrically wrong
            if self.stem.startswith('s2d_input') or (
                    self.stem.startswith('s2d')
                    and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
                x = S2DStemConv(64, dtype=self.dtype, mode=self.stem,
                                name='conv1')(x)
            else:
                x = _conv(64, 7, 2, name='conv1', dtype=self.dtype)(x)
            x = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen, name='bn1')(x, train)
        # relu AFTER the pool: max commutes with monotone relu (identical
        # values and a.e. gradients to the reference's relu->maxpool,
        # ``_resnets.py`` stem), but the full-resolution relu activation is
        # never materialized — the pool reads the BN output directly
        x = max_pool(x, 3, 2, padding=((1, 1), (1, 1)), impl=self.maxpool_impl)
        x = nn.relu(x)

        feats = []
        filters = (64, 128, 256, 512)
        n_stages = 4 if self.include_conv5 else 3
        for i in range(n_stages):
            stride, dil, first_dil = geom[i]
            stage_cls = (nn.remat(ResNetStage, static_argnums=(2,))
                         if self.with_cp[i] else ResNetStage)
            x = stage_cls(block, filters[i], sizes[i], stride=stride, dilation=dil,
                          first_dilation=first_dil, groups=groups, width_per_group=wpg,
                          bn_frozen=self.bn_frozen, se_ratio=self.se_ratio,
                          gc_ratio=self.gc_ratio,
                          pack2=(self.pack2_layer1 and i == 0), dtype=self.dtype,
                          name=f'layer{i + 1}')(x, train)
            feats.append(x)
        return feats


for _name in RESNET_SPECS:
    registry.MODEL.register(_name, (lambda n: lambda **kw: ResNet(resnet_type=n, **kw))(_name))


@registry.MODEL.register()
class ResNetEncoder(ERModule):
    """Config surface parity with ``ever/module/resnet.py:73-265``.

    Config keys: ``resnet_type, include_conv5, batchnorm_trainable,
    pretrained, freeze_at, output_stride, with_cp, in_channels``.
    ``pretrained`` may be a path to a torchvision ``.pth`` (converted on load
    by the trainer via ``ever_tpu.util.weight_io``).  ``in_channels != 3`` is
    handled naturally: the stem conv's input dim comes from the data; the
    weight converter recycles pretrained RGB channels (``resnet.py:55-69``).
    """

    def set_default_config(self):
        self.config.update(dict(
            resnet_type='resnet50',
            include_conv5=True,
            batchnorm_trainable=True,
            pretrained=False,
            freeze_at=0,
            output_stride=32,
            with_cp=(False, False, False, False),
            in_channels=3,
            se_ratio=None,
            gc_ratio=None,
            stem='conv',
            maxpool_impl='reduce_window',
            pack2_layer1=False,
            dtype='float32',
        ))

    def setup(self):
        self.resnet = ResNet(
            resnet_type=self.config.resnet_type,
            output_stride=self.config.output_stride,
            include_conv5=self.config.include_conv5,
            bn_frozen=not self.config.batchnorm_trainable,
            with_cp=tuple(self.config.with_cp),
            se_ratio=self.config.se_ratio,
            gc_ratio=self.config.gc_ratio,
            stem=self.config.get('stem', 'conv'),
            maxpool_impl=self.config.get('maxpool_impl', 'reduce_window'),
            pack2_layer1=self.config.get('pack2_layer1', False),
            dtype=jnp.dtype(self.config.dtype),
        )

    def __call__(self, x, train: bool = False):
        return self.resnet(x, train)

    @property
    def out_channels(self) -> Sequence[int]:
        block, _, _, _, _ = RESNET_SPECS[self.config.resnet_type]
        base = (64, 128, 256, 512)
        n = 4 if self.config.include_conv5 else 3
        return [f * block.expansion for f in base[:n]]

    def frozen_param_prefixes(self) -> Sequence[str]:
        """Param-path prefixes to exclude from optimization (``freeze_at``).

        at>=1: stem; at>=2..5: layer1..layer4 (parity: ``resnet.py:162-173``).
        """
        at = int(self.config.freeze_at)
        prefixes = []
        if at >= 1:
            prefixes += ['resnet/conv1', 'resnet/bn1', 'resnet/stem_conv1',
                         'resnet/stem_bn1', 'resnet/stem_conv2', 'resnet/stem_bn2',
                         'resnet/stem_conv3', 'resnet/stem_bn3']
        for i in range(2, 6):
            if at >= i:
                prefixes.append(f'resnet/layer{i - 1}')
        return prefixes


def make_layer(block, in_channel, basic_out_channel, blocks, stride=1,
               dilation=1, **kw):
    """Reference spelling (``ever/module/resnet.py:37-52``): build one ResNet
    stage.  ``in_channel`` is inferred from the input at apply time in flax,
    so it is accepted and unused; the downsample shortcut is created exactly
    when the reference would (stride != 1 or channel change — decided inside
    :class:`ResNetStage` from the actual input)."""
    del in_channel
    return ResNetStage(block=block, filters=basic_out_channel,
                       num_blocks=blocks, stride=stride, dilation=dilation,
                       **kw)


def patch_first_conv(kernel, new_in_channels, default_in_channels=3):
    """Reference spelling re-export (``ever/module/resnet.py:55-69``); the
    array-level implementation lives in ``util/weight_io.py`` (HWIO
    kernels)."""
    from ever_tpu.util.weight_io import patch_first_conv as _impl
    return _impl(kernel, new_in_channels, default_in_channels)


__all__ += ['ResNetStage', 'make_layer', 'patch_first_conv']
