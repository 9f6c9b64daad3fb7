"""FactSeg: foreground-activation dual-branch small-object segmentation.

The reference repo ships the *framework capabilities* FactSeg (TGRS'21,
``README.md:40``) builds on — FPN, dual-branch decoders, joint loss — and the
model itself lives in the downstream Z-Zheng/FactSeg project.  This module
provides the complete model natively: a siamese-free encoder + FPN with two
AssymetricDecoder branches (binary foreground activation + multi-class
semantic) and the collaborative-probability (CP) loss that modulates semantic
probabilities by the foreground activation.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ever_tpu.core import registry
from ever_tpu.interface.module import ERModule
from ever_tpu.module import loss as L
from ever_tpu.module.fpn import FPN, AssymetricDecoder
from ever_tpu.module.resnet import ResNetEncoder

__all__ = ['FactSeg']


@registry.MODEL.register()
class FactSeg(ERModule):
    """Dual-branch (foreground-activation ⊕ semantic) segmentation.

    - FA branch: binary foreground logits (dice + OHEM-BCE friendly);
    - semantic branch: C-class logits;
    - collaborative probability: ``p = softmax(sem) * sigmoid(fa)`` with the
      background channel taking ``1 - sigmoid(fa)``.

    Training contract: ``(x, y)`` with ``y`` int labels, class 0 =
    background; returns ``{cls_loss, fa_loss[, dice_loss]}``.
    """

    def set_default_config(self):
        self.config.update(dict(
            encoder=dict(resnet_type='resnet50'),
            fpn=dict(in_channels_list=(256, 512, 1024, 2048), out_channels=256),
            decoder=dict(in_channels=256, out_channels=128,
                         in_feat_output_strides=(4, 8, 16, 32),
                         out_feat_output_stride=4),
            classes=16,
            loss=dict(ignore_index=255,
                      fa=dict(),                       # binary CE on FA branch
                      dice=dict(smooth_value=1.0),     # dice on FA branch
                      sem=dict()),                     # CE on joint probability
            dtype='float32',
        ))

    def setup(self):
        dtype = self.config.dtype
        enc = dict(self.config.encoder)
        enc.setdefault('dtype', dtype)
        self.encoder = ResNetEncoder(enc)
        jdtype = jnp.dtype(dtype)
        self.fa_fpn = FPN(dtype=jdtype, **self.config.fpn.to_dict())
        self.sem_fpn = FPN(dtype=jdtype, **self.config.fpn.to_dict())
        dec = self.config.decoder.to_dict()
        self.fa_decoder = AssymetricDecoder(dtype=jdtype, **dec)
        self.sem_decoder = AssymetricDecoder(dtype=jdtype, **dec)
        self.fa_cls = nn.Conv(1, (1, 1), dtype=jdtype)
        self.sem_cls = nn.Conv(int(self.config.classes), (1, 1), dtype=jdtype)

    def _forward_logits(self, x, train):
        dtype = jnp.dtype(self.config.dtype)
        feats = self.encoder(x.astype(dtype), train)
        fa = self.fa_decoder(list(self.fa_fpn(feats, train)), train)
        sem = self.sem_decoder(list(self.sem_fpn(feats, train)), train)
        from ever_tpu.module.ops import resize
        fa = resize(self.fa_cls(fa), scale=4.0, method='bilinear').astype(jnp.float32)
        sem = resize(self.sem_cls(sem), scale=4.0, method='bilinear').astype(jnp.float32)
        return fa, sem

    @staticmethod
    def joint_probability(fa_logit, sem_logit):
        """Collaborative probability: semantic softmax modulated by the
        foreground activation; background = 1 - sigmoid(fa)."""
        p_fg = jax.nn.sigmoid(fa_logit)                         # [N,H,W,1]
        p_sem = jax.nn.softmax(sem_logit, axis=-1)              # [N,H,W,C]
        fg_classes = p_sem[..., 1:]
        fg_norm = fg_classes / jnp.maximum(
            jnp.sum(fg_classes, axis=-1, keepdims=True), 1e-7)
        joint = jnp.concatenate([1.0 - p_fg, p_fg * fg_norm], axis=-1)
        return joint

    def __call__(self, x, y: Optional[jnp.ndarray] = None, train: bool = False):
        fa, sem = self._forward_logits(x, train)
        joint = self.joint_probability(fa, sem)
        if train and y is not None:
            lcfg = self.config.loss
            ignore = int(lcfg.get('ignore_index', 255))
            binary_y = jnp.where(y == ignore, ignore, (y > 0).astype(y.dtype))
            out = {}
            # semantic CE on the (log) joint probability
            logp = jnp.log(jnp.maximum(joint, 1e-7))
            out['cls_loss'] = L.softmax_ce_loss_with_logits(
                logp, y, ignore_index=ignore)
            if lcfg.get('fa') is not None:
                out['fa_loss'] = L.binary_cross_entropy_with_logits(
                    fa[..., 0], binary_y.astype(jnp.float32), ignore_index=ignore)
            if lcfg.get('dice') is not None:
                # `is not None` like the fa gate: dice=dict() means
                # "use dice defaults", not "disable dice"
                out['dice_loss'] = L.dice_loss_with_logits(
                    fa, binary_y, ignore_index=ignore, **dict(lcfg.dice))
            return out
        return joint
