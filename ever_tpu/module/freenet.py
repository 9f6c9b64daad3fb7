"""FreeNet: patch-free end-to-end hyperspectral image classification.

The reference's headline scope includes hyperspectral classification
(``README.md:36-55``: FPGA/FreeNet, TGRS'20, is a downstream project built on
the framework).  The capabilities it needs — many-band inputs, spectral
attention, whole-scene fully-convolutional training with sparse ground truth
(CE over labeled pixels only) — are provided here as a first-class model.

Architecture (faithful to the FPGA paper): an encoder of conv-GN-relu blocks
with spectral (channel) attention gates, a lateral-fusion decoder, and a
pixel classifier; GroupNorm (not BatchNorm) because hyperspectral scenes
train with batch = 1 whole scene.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ever_tpu.core import registry
from ever_tpu.interface.module import ERModule
from ever_tpu.module import loss as L
from ever_tpu.module.ops import ConvBlock, global_avg_pool, max_pool, resize

__all__ = ['SpectralAttention', 'FreeNet']

Dtype = Any


@registry.OP.register()
class SpectralAttention(nn.Module):
    """Band/channel gate: global spatial pool → bottleneck MLP → sigmoid."""

    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = global_avg_pool(x)
        s = nn.relu(nn.Conv(max(c // self.reduction, 4), (1, 1),
                            dtype=self.dtype, name='reduce')(s))
        s = nn.sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype, name='expand')(s))
        return x * s


class _FreeNetBlock(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(self.features, 3, norm='gn', dtype=self.dtype,
                      name='conv1')(x, train)
        x = ConvBlock(self.features, 3, norm='gn', dtype=self.dtype,
                      name='conv2')(x, train)
        return SpectralAttention(dtype=self.dtype, name='spec_attn')(x)


@registry.MODEL.register()
class FreeNet(ERModule):
    """Whole-scene hyperspectral classifier.

    Training contract: ``(x [N,H,W,bands], y [N,H,W])`` with unlabeled pixels
    = ``ignore_index`` (hyperspectral GT is sparse); returns
    ``{cls_loss}``.  Eval: per-pixel class probabilities.
    """

    def set_default_config(self):
        self.config.update(dict(
            in_channels=200,            # documentation; inferred from input
            stage_channels=(96, 128, 192, 256),
            classes=16,
            loss=dict(ignore_index=255),
            dtype='float32',
        ))

    @nn.compact
    def __call__(self, x, y: Optional[jnp.ndarray] = None, train: bool = False):
        dtype = jnp.dtype(self.config.dtype)
        chans = tuple(self.config.stage_channels)
        h = x.astype(dtype)

        # encoder with lateral taps; downsample between stages
        laterals = []
        for i, c in enumerate(chans):
            h = _FreeNetBlock(c, dtype=dtype, name=f'enc{i}')(h, train)
            laterals.append(h)
            if i != len(chans) - 1:
                h = max_pool(h, 2, 2, padding='VALID')

        # lateral-fusion decoder: upsample-and-add back to full resolution
        out = laterals[-1]
        for i in range(len(chans) - 2, -1, -1):
            out = resize(out, shape=laterals[i].shape[1:3], method='bilinear')
            lat = ConvBlock(chans[i], 1, norm='gn', dtype=dtype,
                            name=f'lat{i}')(laterals[i], train)
            out = ConvBlock(chans[i], 3, norm='gn', dtype=dtype,
                            name=f'fuse{i}')(out, train) + lat

        logits = nn.Conv(int(self.config.classes), (1, 1), dtype=dtype,
                         name='classifier')(out).astype(jnp.float32)
        if train and y is not None:
            ignore = int(self.config.loss.get('ignore_index', 255))
            return dict(cls_loss=L.softmax_ce_loss_with_logits(
                logits, y, ignore_index=ignore))
        return jax.nn.softmax(logits, axis=-1)
