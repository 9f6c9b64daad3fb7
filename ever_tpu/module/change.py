"""Bi-temporal change detection models: ChangeStar/ChangeMixin, ChangeMask,
ChangeOS.

These papers (ICCV'21 / ISPRS'22 / RSE'21, reference ``README.md:41-51``) are
downstream projects built ON the reference framework; the BASELINE configs
require their capabilities — bi-temporal pair pipelines, dual-branch change
heads, damage assessment with whole-scene sliding-window deployment.  Here
they are first-class models.

Bi-temporal input convention: ``x`` is ``[N, H, W, 2*C]`` (t1 ‖ t2 stacked on
channels) or a tuple ``(x1, x2)``; labels are a dict or tuple of
``(semantic_t1[, semantic_t2], change)`` depending on the model.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ever_tpu.core import registry
from ever_tpu.interface.module import ERModule
from ever_tpu.module import loss as L
from ever_tpu.module.fpn import FPN, AssymetricDecoder
from ever_tpu.module.ops import ConvBlock, resize
from ever_tpu.module.resnet import ResNetEncoder

__all__ = ['ChangeMixin', 'ChangeStar', 'ChangeMask', 'ChangeOS',
           'split_bitemporal']

Dtype = Any


def split_bitemporal(x):
    """[N,H,W,2C] → (t1, t2); tuples pass through."""
    if isinstance(x, (tuple, list)):
        return x[0], x[1]
    c = x.shape[-1] // 2
    return x[..., :c], x[..., c:]


class _SharedOrderConv(nn.Module):
    """``nn.Conv``-compatible kernel ``[3,3,2C,F]`` applied as ONE
    2F-output-channel conv that computes BOTH temporal orders on the N
    batch: ``conv(f1‖f2, W)`` and ``conv(f2‖f1, W)`` = ``conv(f1‖f2, Wsw)``
    where ``Wsw`` swaps the two input-channel halves.  Identical parameters
    and outputs to running the F-channel conv twice on the 2N batch, at
    HALF the lane-padding waste (F=16 pads to the 128-lane tile either way;
    2F fills twice as much of it per MXU pass)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        c2 = z.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, c2, self.features), jnp.float32)
        c = c2 // 2
        w_swapped = jnp.concatenate([kernel[:, :, c:], kernel[:, :, :c]],
                                    axis=2)
        w_both = jnp.concatenate([kernel, w_swapped], axis=3).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            z.astype(self.dtype), w_both, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class _OrderStackedConv0(nn.Module):
    """Drop-in for ``ConvBlock(name='conv0')`` in the order-stacked layout:
    the 2F-channel shared-order conv on the N batch, reshaped to the
    canonical ``[2N, H, W, F]`` both-orders batch BEFORE the norm, so BN
    statistics pool over both orders exactly as the stacked-batch FCN's BN
    does.  Parameter tree identical to the ConvBlock it replaces
    (``conv0/Conv_0/kernel`` + ``conv0/Norm_0/*``)."""

    features: int
    norm: str = 'bn'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = False):
        from ever_tpu.module.ops import Norm
        y = _SharedOrderConv(self.features, dtype=self.dtype,
                             name='Conv_0')(z)
        n, h, w, _ = y.shape
        y = y.reshape(n, h, w, 2, self.features)
        y = jnp.concatenate([y[:, :, :, 0], y[:, :, :, 1]], axis=0)
        y = Norm(self.norm, dtype=self.dtype)(y, train)
        return nn.relu(y)


@registry.OP.register()
class ChangeMixin(nn.Module):
    """ChangeStar's change detector (ICCV'21).

    Concatenates bi-temporal dense features in BOTH temporal orders, runs a
    small FCN on each, and returns the pair of change logits.  Training uses
    the temporal-symmetry loss: both orders supervised with the same change
    label (change is symmetric).

    ``order_stacked=True`` computes the first conv (the FLOP-heavy 2C→F
    reduction) as one 2F-channel conv on the N batch instead of an
    F-channel conv on the 2N both-orders batch — identical params and
    outputs (``tests/test_model_zoo.py``), half the MXU lane-padding waste
    of the F=16-channel output (VERDICT r3 #4; measured on chip,
    docs/PERFORMANCE.md "ChangeStar").
    """

    in_channels: int = 256          # per-temporal feature channels (parity doc)
    inner_channels: int = 16
    num_convs: int = 4
    scale_factor: float = 4.0
    order_stacked: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, f1, f2, train: bool = False):
        def tail(x, start):
            for i in range(start, self.num_convs):
                x = ConvBlock(self.inner_channels, 3, norm='bn',
                              dtype=self.dtype, name=f'conv{i}')(x, train)
            x = nn.Conv(1, (3, 3), padding='SAME', dtype=self.dtype,
                        name='cls')(x)
            return resize(x, scale=self.scale_factor,
                          method='bilinear').astype(jnp.float32)

        if self.order_stacked and self.num_convs >= 1:
            z = jnp.concatenate([f1, f2], axis=-1)
            x = _OrderStackedConv0(self.inner_channels, norm='bn',
                                   dtype=self.dtype, name='conv0')(z, train)
            logits = tail(x, 1)
        else:
            # weight sharing across the two orders: one FCN applied to a
            # stacked batch (single trace → single set of params)
            both = jnp.concatenate([
                jnp.concatenate([f1, f2], axis=-1),
                jnp.concatenate([f2, f1], axis=-1)], axis=0)
            logits = tail(both, 0)
        n = f1.shape[0]
        return logits[:n], logits[n:]


@registry.MODEL.register()
class ChangeStar(ERModule):
    """Siamese FarSeg-style segmentation + ChangeMixin (ChangeStar, ICCV'21).

    Forward (train): ``(x, labels)`` where ``x`` is bi-temporal and ``labels``
    is ``{'masks': [N,H,W,2] per-temporal semantic, 'change': [N,H,W]}``
    (``change`` optional — ChangeStar can train from single-temporal data with
    pseudo-pairs, in which case the xor of the two semantic masks supervises
    change).  Eval: returns ``(seg_prob_t1, seg_prob_t2, change_prob)``.
    """

    def set_default_config(self):
        self.config.update(dict(
            encoder=dict(resnet_type='resnet50'),
            fpn=dict(in_channels_list=(256, 512, 1024, 2048), out_channels=256),
            decoder=dict(in_channels=256, out_channels=256,
                         in_feat_output_strides=(4, 8, 16, 32),
                         out_feat_output_stride=4),
            changemixin=dict(in_channels=512, inner_channels=16, num_convs=4,
                             scale_factor=4.0, order_stacked=True),
            classes=1,
            loss=dict(ignore_index=255,
                      seg=dict(),
                      change=dict(),
                      symmetry=True),
            dtype='float32',
        ))

    def setup(self):
        dtype = self.config.dtype
        jdtype = jnp.dtype(dtype)
        enc = dict(self.config.encoder)
        enc.setdefault('dtype', dtype)
        self.encoder = ResNetEncoder(enc)
        self.fpn = FPN(dtype=jdtype, **self.config.fpn.to_dict())
        self.decoder = AssymetricDecoder(dtype=jdtype, **self.config.decoder.to_dict())
        self.seg_cls = nn.Conv(int(self.config.classes), (1, 1), dtype=jdtype)
        self.changemixin = ChangeMixin(dtype=jdtype,
                                       **self.config.changemixin.to_dict())

    def _dense_features(self, x, train):
        dtype = jnp.dtype(self.config.dtype)
        feats = self.encoder(x.astype(dtype), train)
        fpn_feats = self.fpn(feats, train)
        return self.decoder(list(fpn_feats), train)   # [N, H/4, W/4, C]

    def __call__(self, x, y=None, train: bool = False):
        x1, x2 = split_bitemporal(x)
        n = x1.shape[0]
        # siamese: one encoder trace over the stacked temporal batch
        stacked = jnp.concatenate([x1, x2], axis=0)
        dense = self._dense_features(stacked, train)
        f1, f2 = dense[:n], dense[n:]
        seg_logits = resize(self.seg_cls(dense), scale=4.0,
                            method='bilinear').astype(jnp.float32)
        s1, s2 = seg_logits[:n], seg_logits[n:]
        c12, c21 = self.changemixin(f1, f2, train)

        if train and y is not None:
            lcfg = self.config.loss
            ignore = int(lcfg.get('ignore_index', 255))
            masks = y['masks'] if isinstance(y, dict) else y
            if isinstance(masks, (tuple, list)):
                # the documented tuple form (module docstring):
                # (semantic_t1[, semantic_t2], change)
                parts = list(masks)
                change_t = parts.pop() if len(parts) > 1 else None
                m1 = parts[0]
                m2 = parts[1] if len(parts) > 1 else None
                if change_t is not None and not isinstance(y, dict):
                    y = dict(masks=None, change=change_t)
                masks = None
            elif masks.ndim == 4:
                m1 = masks[..., 0]
                m2 = masks[..., 1] if masks.shape[-1] > 1 else None
            else:
                # [N,H,W]: single-temporal mask (ChangeStar's original
                # single-temporal supervision) — slicing [..., 0] here would
                # cut the WIDTH axis
                m1, m2 = masks, None
            out = {}
            out['seg_loss'] = L.binary_cross_entropy_with_logits(
                s1[..., 0], m1.astype(jnp.float32), ignore_index=ignore)
            if m2 is not None:
                out['seg_loss'] = out['seg_loss'] + L.binary_cross_entropy_with_logits(
                    s2[..., 0], m2.astype(jnp.float32), ignore_index=ignore)
            change = (y.get('change') if isinstance(y, dict) else None)
            if change is None and m2 is not None:
                valid = (m1 != ignore) & (m2 != ignore)
                change = jnp.where(valid, (m1 != m2).astype(jnp.int32), ignore)
            if change is not None:
                cf = change.astype(jnp.float32)
                out['change_loss'] = L.binary_cross_entropy_with_logits(
                    c12[..., 0], cf, ignore_index=ignore)
                if lcfg.get('symmetry', True):
                    out['change_loss'] = 0.5 * (
                        out['change_loss'] + L.binary_cross_entropy_with_logits(
                            c21[..., 0], cf, ignore_index=ignore))
            return out
        change_prob = 0.5 * (jax.nn.sigmoid(c12) + jax.nn.sigmoid(c21))
        return jax.nn.sigmoid(s1), jax.nn.sigmoid(s2), change_prob


@registry.MODEL.register()
class ChangeMask(ERModule):
    """Semantic-change + binary-change dual decoder (ChangeMask, ISPRS'22).

    Siamese encoder; a semantic decoder per temporal frame (shared weights)
    and a change decoder over temporal-fused features (concat + difference).
    Training labels: ``{'masks': [N,H,W,2] semantic, 'change': [N,H,W]}``;
    eval returns ``(sem_prob_t1, sem_prob_t2, change_prob)``.
    """

    def set_default_config(self):
        self.config.update(dict(
            encoder=dict(resnet_type='resnet50'),
            fpn=dict(in_channels_list=(256, 512, 1024, 2048), out_channels=256),
            decoder=dict(in_channels=256, out_channels=256,
                         in_feat_output_strides=(4, 8, 16, 32),
                         out_feat_output_stride=4),
            classes=7,
            loss=dict(ignore_index=255, sem=dict(), change=dict(),
                      consistency_weight=0.0),
            dtype='float32',
        ))

    def setup(self):
        dtype = self.config.dtype
        jdtype = jnp.dtype(dtype)
        enc = dict(self.config.encoder)
        enc.setdefault('dtype', dtype)
        self.encoder = ResNetEncoder(enc)
        self.fpn = FPN(dtype=jdtype, **self.config.fpn.to_dict())
        dec = self.config.decoder.to_dict()
        self.sem_decoder = AssymetricDecoder(dtype=jdtype, **dec)
        self.change_decoder = AssymetricDecoder(dtype=jdtype, **dec)
        self.sem_cls = nn.Conv(int(self.config.classes), (1, 1), dtype=jdtype)
        self.change_cls = nn.Conv(1, (1, 1), dtype=jdtype)

    def __call__(self, x, y=None, train: bool = False):
        dtype = jnp.dtype(self.config.dtype)
        x1, x2 = split_bitemporal(x)
        n = x1.shape[0]
        stacked = jnp.concatenate([x1, x2], axis=0).astype(dtype)
        feats = self.encoder(stacked, train)
        fpn_feats = list(self.fpn(feats, train))
        sem_dense = self.sem_decoder(fpn_feats, train)
        sem_logits = resize(self.sem_cls(sem_dense), scale=4.0,
                            method='bilinear').astype(jnp.float32)
        s1, s2 = sem_logits[:n], sem_logits[n:]
        # temporal fusion per FPN level: [f1‖f2, |f1-f2|]
        fused = [jnp.concatenate([f[:n], f[n:], jnp.abs(f[:n] - f[n:])], axis=-1)
                 for f in fpn_feats]
        change_dense = self.change_decoder(fused, train)
        c = resize(self.change_cls(change_dense), scale=4.0,
                   method='bilinear').astype(jnp.float32)

        if train and y is not None:
            lcfg = self.config.loss
            ignore = int(lcfg.get('ignore_index', 255))
            masks = y['masks']
            m1, m2 = masks[..., 0], masks[..., 1]
            change = y['change']
            out = dict(
                sem_loss=(L.softmax_ce_loss_with_logits(s1, m1, ignore_index=ignore)
                          + L.softmax_ce_loss_with_logits(s2, m2, ignore_index=ignore)),
                change_loss=L.binary_cross_entropy_with_logits(
                    c[..., 0], change.astype(jnp.float32), ignore_index=ignore),
            )
            w = float(lcfg.get('consistency_weight', 0.0))
            if w > 0:
                # temporal consistency: unchanged pixels should keep class
                p1 = jax.nn.softmax(s1, axis=-1)
                p2 = jax.nn.softmax(s2, axis=-1)
                unchanged = (change == 0).astype(jnp.float32)[..., None]
                out['consistency_loss'] = w * jnp.mean(
                    unchanged * jnp.abs(p1 - p2))
            return out
        return (jax.nn.softmax(s1, axis=-1), jax.nn.softmax(s2, axis=-1),
                jax.nn.sigmoid(c))


@registry.MODEL.register()
class ChangeOS(ERModule):
    """Building damage assessment (ChangeOS, RSE'21): localization branch on
    the pre-event frame + multi-class damage branch on bi-temporal fusion.

    Labels: ``{'loc': [N,H,W] binary buildings, 'damage': [N,H,W] damage
    classes}``.  Eval returns ``(loc_prob, damage_prob)``; whole-scene
    deployment composes with ``ever_tpu.magic.tiled_inference``.
    """

    def set_default_config(self):
        self.config.update(dict(
            encoder=dict(resnet_type='resnet50'),
            fpn=dict(in_channels_list=(256, 512, 1024, 2048), out_channels=256),
            decoder=dict(in_channels=256, out_channels=256,
                         in_feat_output_strides=(4, 8, 16, 32),
                         out_feat_output_stride=4),
            damage_classes=5,
            loss=dict(ignore_index=255),
            dtype='float32',
        ))

    def setup(self):
        dtype = self.config.dtype
        jdtype = jnp.dtype(dtype)
        enc = dict(self.config.encoder)
        enc.setdefault('dtype', dtype)
        self.encoder = ResNetEncoder(enc)
        self.fpn = FPN(dtype=jdtype, **self.config.fpn.to_dict())
        dec = self.config.decoder.to_dict()
        self.loc_decoder = AssymetricDecoder(dtype=jdtype, **dec)
        self.dam_decoder = AssymetricDecoder(dtype=jdtype, **dec)
        self.loc_cls = nn.Conv(1, (1, 1), dtype=jdtype)
        self.dam_cls = nn.Conv(int(self.config.damage_classes), (1, 1), dtype=jdtype)

    def __call__(self, x, y=None, train: bool = False):
        dtype = jnp.dtype(self.config.dtype)
        x1, x2 = split_bitemporal(x)
        n = x1.shape[0]
        stacked = jnp.concatenate([x1, x2], axis=0).astype(dtype)
        feats = self.encoder(stacked, train)
        fpn_feats = list(self.fpn(feats, train))
        # localization: pre-event features only
        loc_dense = self.loc_decoder([f[:n] for f in fpn_feats], train)
        loc = resize(self.loc_cls(loc_dense), scale=4.0,
                     method='bilinear').astype(jnp.float32)
        # damage: bi-temporal concat
        fused = [jnp.concatenate([f[:n], f[n:]], axis=-1) for f in fpn_feats]
        dam_dense = self.dam_decoder(fused, train)
        dam = resize(self.dam_cls(dam_dense), scale=4.0,
                     method='bilinear').astype(jnp.float32)

        if train and y is not None:
            ignore = int(self.config.loss.get('ignore_index', 255))
            return dict(
                loc_loss=L.binary_cross_entropy_with_logits(
                    loc[..., 0], y['loc'].astype(jnp.float32), ignore_index=ignore),
                damage_loss=L.softmax_ce_loss_with_logits(
                    dam, y['damage'], ignore_index=ignore),
            )
        return jax.nn.sigmoid(loc), jax.nn.softmax(dam, axis=-1)
