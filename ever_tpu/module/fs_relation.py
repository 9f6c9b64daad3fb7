"""FarSeg foreground-scene relation modules + FarSegHead + full FarSeg model.

Parity target: ``ever/module/fs_relation.py:8-206`` (FSRelation from the
CVPR'20 FarSeg paper, FSRelationV2 from FarSeg++, and the registered
``FarSegHead`` = FPN → scene pooling → FSRelation → AssymetricDecoder).
The full ``FarSeg`` ERModule (encoder + head + loss) is the framework's
flagship/benchmark model (BASELINE.json: FarSeg-R50 on LoveDA).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ever_tpu.core import registry
from ever_tpu.interface.module import ERModule
from ever_tpu.module.fpn import FPN, AssymetricDecoder
from ever_tpu.module.ops import ConvBlock, global_avg_pool
from ever_tpu.module.resnet import ResNetEncoder

__all__ = ['FSRelation', 'FSRelationV2', 'FarSegHead', 'FarSeg']

Dtype = Any


def _relation(scene_feat, content_feat):
    """sigmoid(<scene, content>) over channels, fp32 accumulate → [N,1,1] map."""
    r = jnp.sum((scene_feat * content_feat).astype(jnp.float32), axis=-1, keepdims=True)
    return nn.sigmoid(r).astype(content_feat.dtype)


@registry.OP.register()
class FSRelation(nn.Module):
    """Foreground-scene relation gating (parity: ``fs_relation.py:8-73``).

    A scene embedding ([N,1,1,C]) is projected per scale (or shared), dotted
    with per-scale content encodings, and the sigmoid relation map gates the
    re-encoded features.
    """

    scene_embedding_channels: int   # config parity; inferred from input
    in_channels_list: Sequence[int]
    out_channels: int
    scale_aware_proj: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, scene_feature, features: Sequence[jnp.ndarray],
                 train: bool = False):
        n = len(features)

        def scene_encoder(name):
            def enc(s):
                s = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name=f'{name}_fc1')(s)
                s = nn.relu(s)
                return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name=f'{name}_fc2')(s)
            return enc

        if self.scale_aware_proj:
            scene_feats = [scene_encoder(f'scene_enc{i}')(scene_feature) for i in range(n)]
        else:
            sf = scene_encoder('scene_enc')(scene_feature)
            scene_feats = [sf] * n

        content = [ConvBlock(self.out_channels, 1, norm='bn', dtype=self.dtype,
                             name=f'content_enc{i}')(f, train)
                   for i, f in enumerate(features)]
        re_enc = [ConvBlock(self.out_channels, 1, norm='bn', dtype=self.dtype,
                            name=f'feature_reenc{i}')(f, train)
                  for i, f in enumerate(features)]
        relations = [_relation(sf, cf) for sf, cf in zip(scene_feats, content)]
        return [r * p for r, p in zip(relations, re_enc)]


@registry.OP.register()
class FSRelationV2(nn.Module):
    """FarSeg++ variant (parity: ``fs_relation.py:76-163``): GN'd scene MLP,
    gated features concatenated with the originals and projected back with
    conv-bn-relu-dropout."""

    scene_embedding_channels: int
    in_channels_list: Sequence[int]
    out_channels: int
    scale_aware_proj: bool = False
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, scene_feature, features: Sequence[jnp.ndarray],
                 train: bool = False):
        n = len(features)

        def scene_encoder(name):
            def enc(s):
                s = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name=f'{name}_fc1')(s)
                s = nn.GroupNorm(num_groups=min(32, self.out_channels),
                                 dtype=self.dtype, name=f'{name}_gn1')(s)
                s = nn.relu(s)
                s = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name=f'{name}_fc2')(s)
                s = nn.GroupNorm(num_groups=min(32, self.out_channels),
                                 dtype=self.dtype, name=f'{name}_gn2')(s)
                return nn.relu(s)
            return enc

        def project(x, name):
            y = ConvBlock(self.out_channels, 1, norm='bn', dtype=self.dtype,
                          name=f'{name}_conv')(x, train)
            if self.dropout_rate > 0:
                # reference nn.Dropout2d (fs_relation.py:102,119): channel
                # dropout, not per-element
                y = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2),
                               deterministic=not train)(y)
            return y

        if self.scale_aware_proj:
            scene_feats = [scene_encoder(f'scene_enc{i}')(scene_feature) for i in range(n)]
        else:
            sf = scene_encoder('scene_enc')(scene_feature)
            scene_feats = [sf] * n

        content = [ConvBlock(self.out_channels, 1, norm='bn', dtype=self.dtype,
                             name=f'content_enc{i}')(f, train)
                   for i, f in enumerate(features)]
        re_enc = [ConvBlock(self.out_channels, 1, norm='bn', dtype=self.dtype,
                            name=f'feature_reenc{i}')(f, train)
                  for i, f in enumerate(features)]
        relations = [_relation(sf, cf) for sf, cf in zip(scene_feats, content)]
        refined = [jnp.concatenate([r * p, o], axis=-1)
                   for r, p, o in zip(relations, re_enc, features)]
        return [project(x, f'project{i}') for i, x in enumerate(refined)]


@registry.MODEL.register()
class FarSegHead(ERModule):
    """FPN → scene avg-pool → FSRelation → AssymetricDecoder.

    Config surface parity: ``ever/module/fs_relation.py:167-206``.
    Input: multi-scale feature list; output: decoder map (logits when a
    classifier_config is set).
    """

    def set_default_config(self):
        self.config.update(dict(
            fpn=dict(
                in_channels_list=(256, 512, 1024, 2048),
                out_channels=256,
            ),
            relation_type='v1',      # 'v1' (FarSeg) | 'v2' (FarSeg++)
            fs_relation=dict(
                scene_embedding_channels=2048,
                in_channels_list=(256, 256, 256, 256),
                out_channels=256,
                scale_aware_proj=True,
            ),
            fpn_decoder=dict(
                in_channels=256,
                out_channels=256,
                in_feat_output_strides=(4, 8, 16, 32),
                out_feat_output_stride=4,
                classifier_config=dict(
                    scale_factor=4.0,
                    num_classes=1,
                    kernel_size=1,
                ),
            ),
            dtype='float32',
        ))

    @nn.compact
    def __call__(self, feature_list, train: bool = False):
        dtype = jnp.dtype(self.config.dtype)
        fpn_feats = FPN(dtype=dtype, name='fpn',
                        **self.config.fpn.to_dict())(feature_list, train)
        scene_embedding = global_avg_pool(feature_list[-1])
        # relation_type 'v2' = FarSeg++ (FarSeg++ TPAMI'23,
        # ``fs_relation.py:76-163``): GN'd scene MLP + gated features
        # concatenated with the originals and projected back
        rel_cls = (FSRelationV2 if self.config.get('relation_type', 'v1') == 'v2'
                   else FSRelation)
        refined = rel_cls(dtype=dtype, name='fs_relation',
                          **self.config.fs_relation.to_dict())(
            scene_embedding, list(fpn_feats), train)
        dec_cfg = self.config.fpn_decoder.to_dict()
        return AssymetricDecoder(dtype=dtype, name='fpn_decoder',
                                 **dec_cfg)(refined, train)


@registry.MODEL.register()
class FarSeg(ERModule):
    """Complete FarSeg segmentation model: ResNet encoder + FarSegHead + loss.

    The flagship/benchmark model (BASELINE.json: FarSeg-R50, LoveDA 512²).
    The reference keeps the full model in a downstream project; the framework
    capabilities it relies on are exactly encoder+head+loss composition.

    Training contract: ``__call__(x, y, train=True)`` → loss dict
    (``cls_loss`` cross-entropy with ignore_index, optional ``dice_loss``);
    eval: softmax logits at input resolution.
    """

    def set_default_config(self):
        self.config.update(dict(
            encoder=dict(
                resnet_type='resnet50',
                pretrained=False,
                output_stride=32,
                with_cp=(False, False, False, False),
            ),
            head=dict(
                fpn=dict(in_channels_list=(256, 512, 1024, 2048), out_channels=256),
                fs_relation=dict(scene_embedding_channels=2048,
                                 in_channels_list=(256, 256, 256, 256),
                                 out_channels=256, scale_aware_proj=True),
                fpn_decoder=dict(in_channels=256, out_channels=256,
                                 in_feat_output_strides=(4, 8, 16, 32),
                                 out_feat_output_stride=4),
            ),
            classes=7,
            loss=dict(
                ignore_index=255,
                ce=dict(),
                dice=None,          # e.g. dict(smooth_value=1.0) to enable
            ),
            dtype='float32',
        ))

    def setup(self):
        dtype = self.config.dtype
        enc_cfg = self.config.encoder.unfrozen() if hasattr(self.config.encoder, 'unfrozen') \
            else self.config.encoder
        enc_cfg = dict(enc_cfg)
        enc_cfg.setdefault('dtype', dtype)
        self.encoder = ResNetEncoder(enc_cfg)
        head_cfg = dict(self.config.head)
        head_cfg['fpn_decoder'] = dict(head_cfg['fpn_decoder'])
        head_cfg['fpn_decoder']['classifier_config'] = dict(
            scale_factor=4.0, num_classes=int(self.config.classes), kernel_size=1)
        head_cfg['dtype'] = dtype
        self.head = FarSegHead(head_cfg)

    def __call__(self, x, y: Optional[jnp.ndarray] = None, train: bool = False):
        dtype = jnp.dtype(self.config.dtype)
        feats = self.encoder(x.astype(dtype), train)
        logits = self.head(feats, train)
        logits = logits.astype(jnp.float32)
        if train and y is not None:
            from ever_tpu.module import loss as L
            lcfg = self.config.loss
            ignore = int(lcfg.get('ignore_index', 255))
            out = dict(cls_loss=L.softmax_ce_loss_with_logits(logits, y,
                                                              ignore_index=ignore))
            if lcfg.get('dice'):
                out['dice_loss'] = L.dice_loss_with_logits(
                    logits, y, ignore_index=ignore, **dict(lcfg.dice))
            return out
        return nn.softmax(logits, axis=-1)
