"""HRNetV2 encoders (NHWC, flax.linen).

Parity target: ``ever/module/_hrnet.py`` (HighResolutionModule / HRNet,
w18/32/40/48 factories) and ``ever/module/hrnet.py:29-108``
(``HRNetEncoder``: 4-branch multi-resolution output, frozen stages,
norm_eval, SE/GC plugins, checkpointing).

Structure: stem (2× conv3x3/2) → stage1 (4 bottlenecks @64) → transition →
stage2 (2 branches) → stage3 (3 branches × 4 modules) → stage4 (4 branches ×
3 modules); every module ends in a full cross-resolution fuse (downsample by
strided 3x3 chains, upsample by 1x1 conv + nearest resize).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ever_tpu.core import registry
from ever_tpu.interface.module import ERModule
from ever_tpu.module.context_block import ContextBlock2d
from ever_tpu.module.ops import Norm, resize
from ever_tpu.module.resnet import (BasicBlock, Bottleneck,
                                    Pack2BasicBlock, _conv,
                                    _pack_factor)
from ever_tpu.module.se_block import SEBlock

__all__ = ['HighResolutionModule', 'HRNet', 'HRNetEncoder', 'HRNET_WIDTHS']

Dtype = Any

HRNET_WIDTHS = {
    'hrnetv2_w18': (18, 36, 72, 144),
    'hrnetv2_w32': (32, 64, 128, 256),
    'hrnetv2_w40': (40, 80, 160, 320),
    'hrnetv2_w48': (48, 96, 192, 384),
}
# (num_modules, blocks_per_branch) for stages 2-4 — standard HRNetV2
STAGE_MODULES = (1, 4, 3)
BLOCKS_PER_BRANCH = 4


class HighResolutionModule(nn.Module):
    """N parallel branches of BasicBlocks + full cross-resolution fusion
    (parity: ``_hrnet.py`` HighResolutionModule)."""

    channels: Sequence[int]          # per-branch widths
    num_blocks: int = 4
    bn_frozen: bool = False
    se_ratio: Optional[int] = None
    gc_ratio: Optional[float] = None
    pack: bool = False               # pack-k branch layout (module/resnet.py)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        n = len(self.channels)
        # branches.  Branch widths are 18-96 channels — far below the MXU's
        # 128 lanes; pack=True views k adjacent width pixels' channels as
        # one lane vector (free NHWC reshape) and runs the blocks with
        # zero-block packed weights (identical params; docs/PERFORMANCE.md
        # "pack2").
        outs = []
        for i, x in enumerate(xs):
            c = self.channels[i]
            k = (_pack_factor(c, x.shape[2])
                 if self.pack and not self.se_ratio and not self.gc_ratio
                 else 1)
            if k > 1:
                b0, hh, ww, _ = x.shape
                z = x.reshape(b0, hh, ww // k, k * c)      # free NHWC view
                for b in range(self.num_blocks):
                    z = Pack2BasicBlock(c, bn_frozen=self.bn_frozen, k=k,
                                        dtype=self.dtype,
                                        name=f'branch{i}_block{b}')(z, train)
                x = z.reshape(b0, hh, ww, c)
            else:
                for b in range(self.num_blocks):
                    x = BasicBlock(c, bn_frozen=self.bn_frozen,
                                   se_ratio=self.se_ratio,
                                   gc_ratio=self.gc_ratio, dtype=self.dtype,
                                   name=f'branch{i}_block{b}')(x, train)
            outs.append(x)
        if n == 1:
            return outs

        # full fuse: out[i] = relu(sum_j T_ij(out[j]))
        fused = []
        for i in range(n):
            acc = None
            for j in range(n):
                y = outs[j]
                if j > i:
                    # lower-res → 1x1 conv to C_i, bn, nearest upsample
                    y = _conv(self.channels[i], 1, name=f'fuse{i}_{j}_conv',
                              dtype=self.dtype)(y)
                    y = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen,
                             name=f'fuse{i}_{j}_bn')(y, train)
                    y = resize(y, shape=outs[i].shape[1:3], method='nearest')
                elif j < i:
                    # higher-res → chain of strided 3x3 convs
                    for s in range(i - j):
                        last = s == i - j - 1
                        c = self.channels[i] if last else self.channels[j]
                        y = _conv(c, 3, 2, name=f'fuse{i}_{j}_down{s}_conv',
                                  dtype=self.dtype)(y)
                        y = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen,
                                 name=f'fuse{i}_{j}_down{s}_bn')(y, train)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    """HRNetV2 trunk returning the 4-branch multi-resolution features."""

    hrnet_type: str = 'hrnetv2_w18'
    bn_frozen: bool = False
    se_ratio: Optional[int] = None
    gc_ratio: Optional[float] = None
    pack_branches: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = HRNET_WIDTHS[self.hrnet_type]
        kw = dict(bn_frozen=self.bn_frozen, dtype=self.dtype)

        # stem: two stride-2 3x3 convs
        for i in (1, 2):
            x = _conv(64, 3, 2, name=f'conv{i}', dtype=self.dtype)(x)
            x = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen,
                     name=f'bn{i}')(x, train)
            x = nn.relu(x)

        # stage1: 4 bottlenecks at 64 (output 256)
        for b in range(4):
            x = Bottleneck(64, downsample=(b == 0), bn_frozen=self.bn_frozen,
                           dtype=self.dtype, name=f'layer1_block{b}')(x, train)

        # transitions + stages
        xs = [x]
        for stage_idx, n_branches in enumerate((2, 3, 4)):
            # transition: adapt existing branches + create the new one
            new_xs = []
            for i in range(n_branches):
                if i < len(xs):
                    src = xs[i]
                    if src.shape[-1] != widths[i]:
                        y = _conv(widths[i], 3, 1,
                                  name=f'transition{stage_idx + 1}_{i}_conv',
                                  dtype=self.dtype)(src)
                        y = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen,
                                 name=f'transition{stage_idx + 1}_{i}_bn')(y, train)
                        new_xs.append(nn.relu(y))
                    else:
                        new_xs.append(src)
                else:
                    y = _conv(widths[i], 3, 2,
                              name=f'transition{stage_idx + 1}_{i}_conv',
                              dtype=self.dtype)(xs[-1])
                    y = Norm('bn', dtype=self.dtype, frozen=self.bn_frozen,
                             name=f'transition{stage_idx + 1}_{i}_bn')(y, train)
                    new_xs.append(nn.relu(y))
            xs = new_xs
            # modules
            for m in range(STAGE_MODULES[stage_idx]):
                xs = HighResolutionModule(
                    widths[:n_branches], BLOCKS_PER_BRANCH,
                    se_ratio=self.se_ratio, gc_ratio=self.gc_ratio,
                    pack=self.pack_branches, **kw,
                    name=f'stage{stage_idx + 2}_module{m}')(xs, train)
        return xs


for _name in HRNET_WIDTHS:
    registry.MODEL.register(_name, (lambda n: lambda **kw: HRNet(hrnet_type=n, **kw))(_name))


@registry.MODEL.register()
class HRNetEncoder(ERModule):
    """Config surface parity with ``ever/module/hrnet.py:29-108``."""

    def set_default_config(self):
        self.config.update(dict(
            hrnet_type='hrnetv2_w18',
            pretrained=False,
            weight_path=None,
            norm_eval=False,
            frozen_stages=-1,
            with_cp=False,
            se_ratio=None,
            gc_ratio=None,
            pack_branches=False,
            dtype='float32',
        ))

    def setup(self):
        kw = dict(
            hrnet_type=self.config.hrnet_type,
            bn_frozen=self.config.norm_eval,
            se_ratio=self.config.se_ratio,
            gc_ratio=self.config.gc_ratio,
            pack_branches=self.config.get('pack_branches', False),
            dtype=jnp.dtype(self.config.dtype),
        )
        self.hrnet = (nn.remat(HRNet, static_argnums=(2,))(**kw) if self.config.with_cp
                      else HRNet(**kw))

    def __call__(self, x, train: bool = False):
        return self.hrnet(x, train)

    def output_channels(self) -> Tuple[int, ...]:
        return HRNET_WIDTHS[self.config.hrnet_type]

    def frozen_param_prefixes(self) -> Sequence[str]:
        """frozen_stages semantics: 0 → stem; k → stem + stages up to k
        (parity: mmcv-style ``frozen_stages`` in ``_hrnet.py``)."""
        fs = int(self.config.frozen_stages)
        prefixes = []
        if fs >= 0:
            prefixes += ['hrnet/conv1', 'hrnet/bn1', 'hrnet/conv2', 'hrnet/bn2']
        if fs >= 1:
            prefixes += ['hrnet/layer1']
        for s in (2, 3, 4):
            if fs >= s:
                prefixes += [f'hrnet/stage{s}', f'hrnet/transition{s - 1}']
        return prefixes
