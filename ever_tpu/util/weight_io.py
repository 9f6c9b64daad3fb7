"""Weight loading / conversion utilities.

Parity target: ``ever/interface/module.py:31-68`` (``init_from_weight_file``:
load, unwrap checkpoint dict, strip ``module.``/``_orig_mod.`` prefixes, drop
keys matching an ``excepts`` regex, non-strict load with missing/unexpected
logging) plus the torchvision-``.pth`` pretrained path incl. first-conv
channel recycling (``ever/module/resnet.py:55-69``).

Formats:
- ``.ckpt`` / ``.msgpack`` — this framework's flax-msgpack checkpoints;
- ``.npz`` — flat ``{'params/a/b': array}`` archives;
- ``.pth`` / ``.pt`` — torch state dicts (requires the CPU torch wheel);
  torchvision-style ResNet keys are converted automatically.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger('ever_tpu.weight_io')

__all__ = ['load_weights', 'flatten_tree', 'unflatten_tree',
           'convert_torch_resnet', 'convert_torch_densenet',
           'convert_torch_dinov3_vit', 'convert_torch_hrnet',
           'convert_torch_convnext', 'convert_torch_efficientnet',
           'convert_torch_resnest', 'patch_first_conv']


def flatten_tree(tree: Any, prefix: str = '') -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict) or hasattr(tree, 'items'):
        for k, v in tree.items():
            out.update(flatten_tree(v, f'{prefix}{k}/'))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> dict:
    root: dict = {}
    for key, value in flat.items():
        parts = key.split('/')
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return root


def _strip_prefixes(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop DDP/compile torch prefixes (parity: ``checkpoint.py:144-161``).

    ``_orig_mod.`` is removed ANYWHERE in the key (the reference does
    ``k.replace('_orig_mod.', '')`` — torch.compile on a SUBmodule yields
    keys like ``encoder._orig_mod.layer1...``); ``module.`` only leads."""
    out = {}
    for k, v in flat.items():
        if k.startswith('module.'):
            k = k[len('module.'):]
        if '_orig_mod.' in k:
            k = k.replace('_orig_mod.', '')
        out[k] = v
    return out


def patch_first_conv(kernel: np.ndarray, new_in_channels: int,
                     default_in_channels: int = 3) -> np.ndarray:
    """Recycle pretrained RGB stem weights for N input channels.

    HWIO layout; channel i copies pretrained channel ``i % 3`` and the whole
    kernel is rescaled by ``3/N`` (parity: ``ever/module/resnet.py:55-69``).
    """
    h, w, _, o = kernel.shape
    new = np.empty((h, w, new_in_channels, o), kernel.dtype)
    for i in range(new_in_channels):
        new[:, :, i] = kernel[:, :, i % default_in_channels]
    return new * (default_in_channels / new_in_channels)


# -- torchvision ResNet conversion ------------------------------------------

_TORCH_RESNET_RE = re.compile(
    r'^(?:resnet\.)?(layer\d+)\.(\d+)\.(conv\d|bn\d|downsample)(?:\.(\d))?\.(.+)$')


def _bn_entries(dst: Dict[str, np.ndarray], base: str, leaf: str, value: np.ndarray):
    mapping = {
        'weight': ('params', 'scale'),
        'bias': ('params', 'bias'),
        'running_mean': ('batch_stats', 'mean'),
        'running_var': ('batch_stats', 'var'),
    }
    if leaf in mapping:
        coll, name = mapping[leaf]
        dst[f'{coll}/{base}/BatchNorm_0/{name}'] = value


def convert_torch_resnet(state_dict: Dict[str, np.ndarray],
                         deep_stem: bool = False) -> Dict[str, np.ndarray]:
    """torchvision ResNet state_dict → flat {collection/path: array} matching
    ``ever_tpu.module.resnet.ResNet`` (NHWC/HWIO)."""
    flat: Dict[str, np.ndarray] = {}
    sd = _strip_prefixes({k: np.asarray(v) for k, v in state_dict.items()})

    def conv_kernel(v):
        return np.transpose(v, (2, 3, 1, 0))  # OIHW → HWIO

    for k, v in sd.items():
        if k.endswith('num_batches_tracked') or k.startswith('fc.'):
            continue
        if k in ('conv1.weight',):
            flat['params/conv1/kernel'] = conv_kernel(v)
            continue
        if k.startswith('bn1.'):
            _bn_entries(flat, 'bn1', k.split('.', 1)[1], v)
            continue
        if deep_stem and k.startswith('stem.'):
            # stem.{0,3,6} convs / stem.{1,4,7} bns
            idx, leaf = k.split('.')[1], k.split('.', 2)[2]
            conv_map = {'0': 'stem_conv1', '3': 'stem_conv2', '6': 'stem_conv3'}
            bn_map = {'1': 'stem_bn1', '4': 'stem_bn2', '7': 'stem_bn3'}
            if idx in conv_map and leaf == 'weight':
                flat[f'params/{conv_map[idx]}/kernel'] = conv_kernel(v)
            elif idx in bn_map:
                _bn_entries(flat, bn_map[idx], leaf, v)
            continue
        m = _TORCH_RESNET_RE.match(k)
        if not m:
            logger.debug('unmapped torch key: %s', k)
            continue
        layer, block, part, sub, leaf = m.groups()
        base = f'{layer}/block{block}'
        if part.startswith('conv') and leaf == 'weight':
            flat[f'params/{base}/{part}/kernel'] = conv_kernel(v)
        elif part.startswith('bn'):
            _bn_entries(flat, f'{base}/{part}', leaf, v)
        elif part == 'downsample':
            if sub == '0' and leaf == 'weight':
                flat[f'params/{base}/downsample_conv/kernel'] = conv_kernel(v)
            elif sub == '1':
                _bn_entries(flat, f'{base}/downsample_bn', leaf, v)
    return flat


_TORCH_DENSENET_RE = re.compile(
    r'^(?:features\.)?denseblock(\d+)\.denselayer(\d+)\.(norm\d|conv\d)\.(.+)$')
_TORCH_DENSENET_TRANS_RE = re.compile(
    r'^(?:features\.)?transition(\d+)\.(norm|conv)\.(.+)$')


def convert_torch_densenet(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """torchvision/vendored DenseNet state_dict → flat tree matching
    ``ever_tpu.module.densenet.DenseNet``."""
    flat: Dict[str, np.ndarray] = {}
    sd = _strip_prefixes({k: np.asarray(v) for k, v in state_dict.items()})

    def conv_kernel(v):
        return np.transpose(v, (2, 3, 1, 0))

    for k, v in sd.items():
        if k.endswith('num_batches_tracked') or k.startswith('classifier'):
            continue
        k2 = k[len('features.'):] if k.startswith('features.') else k
        if k2 == 'conv0.weight':
            flat['params/conv0/kernel'] = conv_kernel(v)
            continue
        if k2.startswith('norm0.'):
            _bn_entries(flat, 'norm0', k2.split('.', 1)[1], v)
            continue
        m = _TORCH_DENSENET_RE.match(k2)
        if m:
            b, l, part, leaf = m.groups()
            base = f'denseblock{b}_layer{l}'
            if part.startswith('conv') and leaf == 'weight':
                flat[f'params/{base}/{part}/kernel'] = conv_kernel(v)
            elif part.startswith('norm'):
                _bn_entries(flat, f'{base}/{part}', leaf, v)
            continue
        m = _TORCH_DENSENET_TRANS_RE.match(k2)
        if m:
            b, part, leaf = m.groups()
            if part == 'conv' and leaf == 'weight':
                flat[f'params/transition{b}_conv/kernel'] = conv_kernel(v)
            elif part == 'norm':
                _bn_entries(flat, f'transition{b}_norm', leaf, v)
            continue
        logger.debug('unmapped densenet key: %s', k)
    return flat


_TORCH_VIT_BLOCK_RE = re.compile(
    r'^blocks\.(\d+)\.(norm1|norm2|attn\.qkv|attn\.proj|mlp\.fc1|mlp\.fc2|'
    r'mlp\.w1|mlp\.w2|mlp\.w3|ls1|ls2)\.(weight|bias|gamma)$')


def convert_torch_dinov3_vit(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """DINOv3 ViT state_dict → flat tree matching
    ``ever_tpu.module.vit.DinoVisionTransformer``.

    Enables migrating the published satellite-pretrained checkpoints
    (``vitl16_sat493m`` etc., ``vision_transformer.py:430-476``).  Linear
    weights transpose [out,in]→[in,out]; the patchifier conv OIHW→HWIO; the
    SwiGLU ``w1``/``w2`` pair fuses into our single ``w12`` matmul; the
    ``mask_k_bias`` trick (``attention.py:30-41``: qkv bias multiplied by a
    0/1 ``bias_mask`` buffer that zeroes the K third) is baked into the bias
    at conversion time.  Dropped: ``mask_token`` + ``local_cls_norm``
    (iBOT/DINO-training-only, ``vision_transformer.py:191,250-253``) and the
    persistent ``rope_embed.periods`` buffer (recomputed from config).
    """
    sd = _strip_prefixes({k: np.asarray(v) for k, v in state_dict.items()})
    # bake the masked K bias in, then drop the mask buffers
    for k in [k for k in sd if k.endswith('attn.qkv.bias_mask')]:
        bias_key = k[:-len('_mask')]
        if bias_key in sd:
            sd[bias_key] = sd[bias_key] * np.nan_to_num(sd[k], nan=1.0)
        del sd[k]
    flat: Dict[str, np.ndarray] = {}
    w12: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        if k in ('cls_token', 'storage_tokens'):
            flat[f'params/{k}'] = v
            continue
        if k == 'patch_embed.proj.weight':
            flat['params/patch_embed/proj/kernel'] = np.transpose(v, (2, 3, 1, 0))
            continue
        if k == 'patch_embed.proj.bias':
            flat['params/patch_embed/proj/bias'] = v
            continue
        if k in ('norm.weight', 'cls_norm.weight'):
            base = k.split('.')[0]
            flat[f'params/{base}/scale'] = v
            continue
        if k in ('norm.bias', 'cls_norm.bias'):
            base = k.split('.')[0]
            flat[f'params/{base}/bias'] = v
            continue
        m = _TORCH_VIT_BLOCK_RE.match(k)
        if m:
            idx, part, leaf = m.groups()
            if part in ('mlp.w1', 'mlp.w2'):
                slot = w12.setdefault(f'params/block{idx}/mlp/w12', {})
                slot[part[-1] + leaf] = v
                continue
            part = part.replace('attn.', 'attn/').replace('mlp.', 'mlp/')
            if leaf == 'weight':
                if part in ('norm1', 'norm2'):
                    flat[f'params/block{idx}/{part}/scale'] = v
                else:
                    flat[f'params/block{idx}/{part}/kernel'] = v.T
            elif leaf == 'bias':
                flat[f'params/block{idx}/{part}/bias'] = v
            elif leaf == 'gamma':
                flat[f'params/block{idx}/{part}/gamma'] = v
            continue
        if k == 'mask_token' or k.startswith(('rope_embed.', 'local_cls_norm.')):
            continue
        logger.debug('unmapped dinov3 key: %s', k)
    for base, parts in w12.items():
        flat[f'{base}/kernel'] = np.concatenate(
            [parts['1weight'].T, parts['2weight'].T], axis=1)
        if '1bias' in parts:
            flat[f'{base}/bias'] = np.concatenate([parts['1bias'], parts['2bias']])
    return flat


_TORCH_HRNET_BLOCK_RE = re.compile(
    r'^(layer1|stage\d\.\d+\.branches\.\d+)\.(\d+)\.'
    r'(conv\d|bn\d|downsample)(?:\.(\d))?\.(.+)$')
_TORCH_HRNET_TRANS_RE = re.compile(
    r'^transition(\d)\.(\d+)\.(?:(\d+)\.)?([01])\.(.+)$')
_TORCH_HRNET_FUSE_RE = re.compile(
    r'^stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)(?:\.(\d+))?\.(.+)$')


def convert_torch_hrnet(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Vendored HRNetV2 state_dict (``ever/module/_hrnet.py``) → flat tree
    matching ``ever_tpu.module.hrnet.HRNet``.

    Key geometry: stem ``conv1/bn1/conv2/bn2``; ``layer1.{b}`` bottlenecks →
    ``layer1_block{b}``; ``transition{t}.{i}`` Sequential(conv,bn[,relu])
    (new branches wrap one more Sequential level, ``_hrnet.py:481-504``) →
    ``transition{t}_{i}_conv``/``_bn``; ``stage{s}.{m}.branches.{i}.{b}`` →
    ``stage{s}_module{m}/branch{i}_block{b}``; fuse layers
    (``_hrnet.py:335-370``): j>i = Sequential(conv1x1,bn,upsample) →
    ``fuse{i}_{j}_conv``/``_bn``; j<i = chain of Sequential(conv3x3,bn[,relu])
    → ``fuse{i}_{j}_down{step}_conv``/``_bn``.
    """
    flat: Dict[str, np.ndarray] = {}
    sd = _strip_prefixes({k: np.asarray(v) for k, v in state_dict.items()})

    def conv_kernel(v):
        return np.transpose(v, (2, 3, 1, 0))

    for k, v in sd.items():
        if k.endswith('num_batches_tracked') or k.startswith(
                ('incre_modules', 'downsamp_modules', 'final_layer',
                 'classifier')):
            continue
        if k == 'conv1.weight':
            flat['params/conv1/kernel'] = conv_kernel(v)
            continue
        if k == 'conv2.weight':
            flat['params/conv2/kernel'] = conv_kernel(v)
            continue
        if k.startswith(('bn1.', 'bn2.')):
            base, leaf = k.split('.', 1)
            _bn_entries(flat, base, leaf, v)
            continue
        m = _TORCH_HRNET_BLOCK_RE.match(k)
        if m:
            where, block, part, sub, leaf = m.groups()
            if where == 'layer1':
                base = f'layer1_block{block}'
            else:
                s, mod, br = re.match(r'stage(\d)\.(\d+)\.branches\.(\d+)',
                                      where).groups()
                base = f'stage{s}_module{mod}/branch{br}_block{block}'
            if part.startswith('conv') and leaf == 'weight':
                flat[f'params/{base}/{part}/kernel'] = conv_kernel(v)
            elif part.startswith('bn'):
                _bn_entries(flat, f'{base}/{part}', leaf, v)
            elif part == 'downsample':
                if sub == '0' and leaf == 'weight':
                    flat[f'params/{base}/downsample_conv/kernel'] = conv_kernel(v)
                elif sub == '1':
                    _bn_entries(flat, f'{base}/downsample_bn', leaf, v)
            continue
        m = _TORCH_HRNET_TRANS_RE.match(k)
        if m:
            t, i, _, idx, leaf = m.groups()
            base = f'transition{t}_{i}'
            if idx == '0' and leaf == 'weight':
                flat[f'params/{base}_conv/kernel'] = conv_kernel(v)
            elif idx == '1':
                _bn_entries(flat, f'{base}_bn', leaf, v)
            continue
        m = _TORCH_HRNET_FUSE_RE.match(k)
        if m:
            s, mod, i, j, a, b, leaf = m.groups()
            prefix = f'stage{s}_module{mod}/fuse{i}_{j}'
            if b is None:                     # j > i: Sequential(conv, bn, up)
                base, idx = prefix, a
            else:                             # j < i: chain step a
                base, idx = f'{prefix}_down{a}', b
            if idx == '0' and leaf == 'weight':
                flat[f'params/{base}_conv/kernel'] = conv_kernel(v)
            elif idx == '1':
                _bn_entries(flat, f'{base}_bn', leaf, v)
            continue
        logger.debug('unmapped hrnet key: %s', k)
    return flat


_TORCH_CONVNEXT_BLOCK_RE = re.compile(
    r'^stages\.(\d)\.(\d+)\.(dwconv|norm|pwconv1|pwconv2|gamma)(?:\.(.+))?$')


def convert_torch_convnext(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """DINOv3-vendored ConvNeXt state_dict → flat tree matching
    ``ever_tpu.module.convnext.ConvNeXt``.

    Parity: ``ever/module/dinov3/models/convnext.py:116-192`` —
    ``downsample_layers.0`` = (stem conv 4x4/4, LN); ``downsample_layers.s``
    (s>=1) = (LN, conv 2x2/2); ``stages.s.b`` = dw7x7 → LN → Linear 4x →
    Linear → gamma.  Convs transpose OIHW→HWIO (depthwise [D,1,7,7] →
    [7,7,1,D]); Linears transpose [out,in]→[in,out].  The final token-path
    ``norm`` (applied to pooled tokens in the DINO head, not the trunk
    features) is dropped.
    """
    sd = _strip_prefixes({k: np.asarray(v) for k, v in state_dict.items()})
    flat: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        m = re.match(r'^downsample_layers\.(\d)\.([01])\.(weight|bias)$', k)
        if m:
            s, idx, leaf = m.groups()
            s = int(s)
            if s == 0:
                name = 'stem_conv' if idx == '0' else 'stem_norm'
                is_conv = idx == '0'
            else:
                name = f'down{s}_norm' if idx == '0' else f'down{s}_conv'
                is_conv = idx == '1'
            if is_conv:
                key = 'kernel' if leaf == 'weight' else 'bias'
                val = np.transpose(v, (2, 3, 1, 0)) if leaf == 'weight' else v
            else:
                key = 'scale' if leaf == 'weight' else 'bias'
                val = v
            flat[f'params/{name}/{key}'] = val
            continue
        m = _TORCH_CONVNEXT_BLOCK_RE.match(k)
        if m:
            s, b, part, leaf = m.groups()
            base = f'params/stage{s}_block{b}'
            if part == 'gamma':
                flat[f'{base}/gamma/gamma'] = v
            elif part == 'dwconv':
                if leaf == 'weight':
                    flat[f'{base}/dwconv/kernel'] = np.transpose(v, (2, 3, 1, 0))
                else:
                    flat[f'{base}/dwconv/bias'] = v
            elif part == 'norm':
                flat[f'{base}/norm/{"scale" if leaf == "weight" else "bias"}'] = v
            else:  # pwconv1/2 are torch Linears
                if leaf == 'weight':
                    flat[f'{base}/{part}/kernel'] = v.T
                else:
                    flat[f'{base}/{part}/bias'] = v
            continue
        if k.startswith('norm.') or k.startswith('head.'):
            continue
        logger.debug('unmapped convnext key: %s', k)
    return flat


def convert_torch_farseg_head(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Reference ``FarSegHead`` state_dict → flat tree matching
    ``ever_tpu.module.fs_relation.FarSegHead``.

    Handles the conv-bias/BN redundancy: the reference's content/re-encoders
    are ``Conv2d(bias=True) + BN``; ours are bias-free conv + BN, so the conv
    bias is folded into the BN running mean (``mean' = mean - bias``) —
    mathematically identical in eval mode and after any amount of training.
    """
    sd = _strip_prefixes({k: np.asarray(v) for k, v in state_dict.items()})
    flat: Dict[str, np.ndarray] = {}

    def ck(v):  # conv kernel OIHW→HWIO
        return np.transpose(v, (2, 3, 1, 0))

    def conv_bn(src_prefix, dst_base):
        """map Sequential[conv(0), bn(1)] folding conv bias into bn mean."""
        w = sd.get(f'{src_prefix}.0.weight')
        if w is not None:
            flat[f'params/{dst_base}/Conv_0/kernel'] = ck(w)
        bias = sd.get(f'{src_prefix}.0.bias')
        for leaf, coll, name in (('weight', 'params', 'scale'),
                                 ('bias', 'params', 'bias'),
                                 ('running_var', 'batch_stats', 'var')):
            v = sd.get(f'{src_prefix}.1.{leaf}')
            if v is not None:
                flat[f'{coll}/{dst_base}/Norm_0/BatchNorm_0/{name}'] = v
        mean = sd.get(f'{src_prefix}.1.running_mean')
        if mean is not None:
            if bias is not None:
                mean = mean - bias
            flat[f'batch_stats/{dst_base}/Norm_0/BatchNorm_0/mean'] = mean

    n_levels = len({k.split('.')[1] for k in sd if k.startswith('fpn.fpn_inner')})
    for i in range(1, n_levels + 1):
        flat[f'params/fpn/fpn_inner{i}/kernel'] = ck(sd[f'fpn.fpn_inner{i}.0.weight'])
        if f'fpn.fpn_inner{i}.0.bias' in sd:
            flat[f'params/fpn/fpn_inner{i}/bias'] = sd[f'fpn.fpn_inner{i}.0.bias']
        flat[f'params/fpn/fpn_layer{i}/Conv_0/kernel'] = ck(sd[f'fpn.fpn_layer{i}.0.weight'])
        if f'fpn.fpn_layer{i}.0.bias' in sd:
            flat[f'params/fpn/fpn_layer{i}/Conv_0/bias'] = sd[f'fpn.fpn_layer{i}.0.bias']

    # fs_relation
    scale_aware = any(k.startswith('fs_relation.scene_encoder.0.0')
                      for k in sd)
    if scale_aware:
        n_scene = len({k.split('.')[2] for k in sd
                       if k.startswith('fs_relation.scene_encoder.')})
        for i in range(n_scene):
            for j, fc in ((0, 'fc1'), (2, 'fc2')):
                flat[f'params/fs_relation/scene_enc{i}_{fc}/kernel'] = \
                    ck(sd[f'fs_relation.scene_encoder.{i}.{j}.weight'])
                flat[f'params/fs_relation/scene_enc{i}_{fc}/bias'] = \
                    sd[f'fs_relation.scene_encoder.{i}.{j}.bias']
    else:
        for j, fc in ((0, 'fc1'), (2, 'fc2')):
            flat[f'params/fs_relation/scene_enc_{fc}/kernel'] = \
                ck(sd[f'fs_relation.scene_encoder.{j}.weight'])
            flat[f'params/fs_relation/scene_enc_{fc}/bias'] = \
                sd[f'fs_relation.scene_encoder.{j}.bias']
    i = 0
    while f'fs_relation.content_encoders.{i}.0.weight' in sd:
        conv_bn(f'fs_relation.content_encoders.{i}',
                f'fs_relation/content_enc{i}')
        conv_bn(f'fs_relation.feature_reencoders.{i}',
                f'fs_relation/feature_reenc{i}')
        i += 1

    # decoder blocks: blocks.{b} = Sequential of layer Sequentials
    # [conv(0), bn(1), relu(2), up(3)]
    b = 0
    while f'fpn_decoder.blocks.{b}.0.0.weight' in sd:
        l = 0
        while f'fpn_decoder.blocks.{b}.{l}.0.weight' in sd:
            conv_bn_src = f'fpn_decoder.blocks.{b}.{l}'
            dst = f'fpn_decoder/block{b}_conv{l}'
            flat[f'params/{dst}/Conv_0/kernel'] = ck(sd[f'{conv_bn_src}.0.weight'])
            for leaf, coll, name in (('weight', 'params', 'scale'),
                                     ('bias', 'params', 'bias'),
                                     ('running_mean', 'batch_stats', 'mean'),
                                     ('running_var', 'batch_stats', 'var')):
                v = sd.get(f'{conv_bn_src}.1.{leaf}')
                if v is not None:
                    flat[f'{coll}/{dst}/Norm_0/BatchNorm_0/{name}'] = v
            l += 1
        b += 1
    if 'fpn_decoder.classifier.0.weight' in sd:
        flat['params/fpn_decoder/classifier/kernel'] = \
            ck(sd['fpn_decoder.classifier.0.weight'])
        flat['params/fpn_decoder/classifier/bias'] = \
            sd['fpn_decoder.classifier.0.bias']
    return flat


# -- efficientnet_pytorch conversion -----------------------------------------

def convert_torch_efficientnet(state_dict: Dict[str, np.ndarray],
                               model_name: Optional[str] = None
                               ) -> Dict[str, np.ndarray]:
    """``efficientnet_pytorch`` state_dict → flat tree matching
    ``ever_tpu.module.efficientnet.EfficientNet``.

    The package stores MBConv blocks as a flat ``_blocks.{i}`` list
    (what the reference's ``EFNetEncoder`` wraps,
    ``ever/module/efficientnet.py:8-36``); the flat index is re-staged via
    the compound-scaling repeat counts.  ``model_name`` is inferred from the
    block count when omitted.
    """
    from ever_tpu.module.efficientnet import EFFICIENTNET_SPECS, stage_repeats

    sd = _strip_prefixes({k: np.asarray(v) for k, v in state_dict.items()})
    n_blocks = len({k.split('.')[1] for k in sd if k.startswith('_blocks.')})
    if model_name is None:
        for name in EFFICIENTNET_SPECS:
            if sum(stage_repeats(name)) == n_blocks:
                model_name = name
                break
        else:
            raise ValueError(f'cannot infer efficientnet variant from '
                             f'{n_blocks} blocks')
    repeats = stage_repeats(model_name)
    stage_of = {}
    flat_idx = 0
    for si, r in enumerate(repeats):
        for li in range(r):
            stage_of[flat_idx] = (si, li)
            flat_idx += 1

    def ck(v):   # OIHW → HWIO (depthwise (C,1,k,k) → (k,k,1,C) likewise)
        return np.transpose(v, (2, 3, 1, 0))

    out: Dict[str, np.ndarray] = {}
    conv_map = {'_expand_conv': 'expand_conv', '_depthwise_conv': 'dw_conv',
                '_project_conv': 'project_conv'}
    se_map = {'_se_reduce': 'se_reduce', '_se_expand': 'se_expand'}
    bn_map = {'_bn0': 'expand_bn', '_bn1': 'dw_bn', '_bn2': 'project_bn'}
    for k, v in sd.items():
        if k.endswith('num_batches_tracked'):
            continue
        if k == '_conv_stem.weight':
            out['params/stem_conv/kernel'] = ck(v)
            continue
        if k.startswith('_bn0.'):
            _bn_entries(out, 'stem_bn', k.split('.', 1)[1], v)
            continue
        if k.startswith('_blocks.'):
            _, idx, part, leaf = k.split('.', 3)
            si, li = stage_of[int(idx)]
            base = f'stage{si}_block{li}'
            # a block without expansion has no _expand_conv/_bn0; its _bn1
            # is still the depthwise bn — naming is positional in the package
            if part in conv_map and leaf == 'weight':
                out[f'params/{base}/{conv_map[part]}/kernel'] = ck(v)
            elif part in se_map:
                if leaf == 'weight':
                    out[f'params/{base}/{se_map[part]}/kernel'] = ck(v)
                else:
                    out[f'params/{base}/{se_map[part]}/bias'] = v
            elif part in bn_map:
                _bn_entries(out, f'{base}/{bn_map[part]}', leaf, v)
            continue
        # _conv_head / top-level _bn1 / _fc are the classification head —
        # the encoder taps stop before them (efficientnet.py:21-31)
        if k.startswith(('_conv_head.', '_bn1.', '_fc.')):
            continue
        logger.debug('unmapped efficientnet key: %s', k)
    return out


# -- resnest conversion -------------------------------------------------------

_TORCH_RESNEST_RE = re.compile(
    r'^(layer\d+)\.(\d+)\.(conv\d|bn\d|downsample)(?:\.(\w+))?\.(.+)$')


def convert_torch_resnest(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """``resnest`` package state_dict → flat tree matching
    ``ever_tpu.module.resnest.ResNeSt`` (what the reference's
    ``ResNeStEncoder`` wraps, ``ever/module/resnest.py:17-89``).

    Deep stem: ``conv1.{0,3,6}`` convs + ``conv1.{1,4}``/``bn1`` bns; split
    attention lives at ``layerX.Y.conv2.{conv,bn0,fc1,bn1,fc2}``; ResNeSt-D
    downsample is ``downsample.{1,2}`` (``downsample.0`` is the parameterless
    avg-pool).
    """
    sd = _strip_prefixes({k: np.asarray(v) for k, v in state_dict.items()})

    def ck(v):
        return np.transpose(v, (2, 3, 1, 0))

    out: Dict[str, np.ndarray] = {}
    stem_convs = {'0': 'stem_conv1', '3': 'stem_conv2', '6': 'stem_conv3'}
    stem_bns = {'1': 'stem_bn1', '4': 'stem_bn2'}
    for k, v in sd.items():
        if k.endswith('num_batches_tracked') or k.startswith('fc.'):
            continue
        if k.startswith('conv1.'):
            idx, leaf = k.split('.')[1], k.split('.', 2)[2]
            if idx in stem_convs and leaf == 'weight':
                out[f'params/{stem_convs[idx]}/kernel'] = ck(v)
            elif idx in stem_bns:
                _bn_entries(out, stem_bns[idx], leaf, v)
            continue
        if k.startswith('bn1.'):
            _bn_entries(out, 'stem_bn3', k.split('.', 1)[1], v)
            continue
        m = _TORCH_RESNEST_RE.match(k)
        if not m:
            logger.debug('unmapped resnest key: %s', k)
            continue
        layer, block, part, sub, leaf = m.groups()
        base = f'{layer}_block{block}'
        if part == 'conv2':        # SplAtConv2d
            if sub == 'conv' and leaf == 'weight':
                out[f'params/{base}/splat/conv/kernel'] = ck(v)
            elif sub in ('fc1', 'fc2'):
                if leaf == 'weight':
                    out[f'params/{base}/splat/{sub}/kernel'] = ck(v)
                else:
                    out[f'params/{base}/splat/{sub}/bias'] = v
            elif sub in ('bn0', 'bn1'):
                _bn_entries(out, f'{base}/splat/{sub}', leaf, v)
        elif part.startswith('conv') and leaf == 'weight':
            out[f'params/{base}/{part}/kernel'] = ck(v)
        elif part.startswith('bn'):
            _bn_entries(out, f'{base}/{part}', leaf, v)
        elif part == 'downsample':
            if sub == '1' and leaf == 'weight':
                out[f'params/{base}/downsample_conv/kernel'] = ck(v)
            elif sub == '2':
                _bn_entries(out, f'{base}/downsample_bn', leaf, v)
    return out


# -- generic load ------------------------------------------------------------

def _read_file(path: str) -> Dict[str, np.ndarray]:
    """Read any supported format into flat {collection/path: array}."""
    if path.endswith(('.pth', '.pt')):
        import torch
        obj = torch.load(path, map_location='cpu', weights_only=False)
        if isinstance(obj, dict) and 'state_dict' in obj:
            obj = obj['state_dict']
        if isinstance(obj, dict) and 'model' in obj and isinstance(obj['model'], dict):
            obj = obj['model']
        sd = {k: v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
              for k, v in obj.items()}
        if any('denseblock' in k for k in sd):
            return convert_torch_densenet(sd)
        if any(k.startswith('fs_relation.') for k in sd):
            return convert_torch_farseg_head(sd)
        if 'cls_token' in sd and any(k.startswith('blocks.') for k in sd):
            return convert_torch_dinov3_vit(sd)
        if any('fuse_layers' in k for k in sd):
            return convert_torch_hrnet(sd)
        if any(k.startswith('downsample_layers.') for k in sd):
            return convert_torch_convnext(sd)
        if any(k.startswith('_conv_stem.') for k in sd):
            return convert_torch_efficientnet(sd)
        if any('.conv2.fc1.' in k for k in sd):
            return convert_torch_resnest(sd)
        deep_stem = any(k.startswith('stem.') for k in sd)
        return convert_torch_resnet(sd, deep_stem=deep_stem)
    if path.endswith('.npz'):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    # our msgpack checkpoints
    from ever_tpu.core.checkpoint import CheckPoint, is_checkpoint
    obj = CheckPoint.load(path)
    if is_checkpoint(obj):
        obj = obj['model']
    return flatten_tree(obj)


def _find_subtree_offset(src_keys, dst_keys) -> Optional[str]:
    """Find a prefix to prepend to source keys so they land inside the target
    tree (e.g. encoder weights loading into ``encoder/resnet/...``).

    The candidate that lands the MOST source keys wins — judging from a
    single sample key silently chose no offset (loading zero tensors)
    whenever that one key happened to be absent from the model (filtered by
    ``excepts``, dropped cls token, renamed layer, ...)."""
    dst_keys = set(dst_keys)
    split = [k.split('/', 1) for k in src_keys]
    best, best_hits = None, 0
    for cand in ('', 'resnet/', 'encoder/resnet/', 'densenet/', 'hrnet/',
                 'net/', 'encoder/densenet/', 'encoder/hrnet/', 'encoder/net/',
                 'head/', 'vit/', 'encoder/vit/'):
        hits = sum(1 for coll, rest in split
                   if f'{coll}/{cand}{rest}' in dst_keys)
        if hits > best_hits:
            best, best_hits = cand, hits
    return best


def load_weights(path: str, params, batch_stats=None,
                 excepts: Optional[str] = None,
                 log=True) -> Tuple[Any, Any]:
    """Overlay weights from ``path`` onto (params, batch_stats) pytrees.

    Non-strict: missing/unexpected keys are logged, shape mismatches skipped
    (parity: ``ever/interface/module.py:54-67``).  ``excepts`` is a regex of
    keys to drop before loading (``module.py:49-52``).
    """
    src = _read_file(path)
    if excepts:
        # anchored like the reference (pattern.match, module.py:60):
        # excepts='head' drops keys STARTING with head, not containing it.
        # Keys here are already converted ('params/layer4/...'), so also
        # match with the leading collection stripped
        pat = re.compile(excepts)

        def _drop(k: str) -> bool:
            if pat.match(k):
                return True
            return '/' in k and bool(pat.match(k.split('/', 1)[1]))

        src = {k: v for k, v in src.items() if not _drop(k)}

    dst_flat = {}
    dst_flat.update({f'params/{k}': v for k, v in flatten_tree(params).items()})
    if batch_stats is not None:
        dst_flat.update({f'batch_stats/{k}': v
                         for k, v in flatten_tree(batch_stats).items()})

    offset = _find_subtree_offset(src.keys(), dst_flat.keys()) if src else None
    loaded, missing, unexpected, mismatched = 0, [], [], []
    new_flat = dict(dst_flat)
    for k, v in src.items():
        if offset:
            coll, rest = k.split('/', 1)
            k = f'{coll}/{offset}{rest}'
        if k not in dst_flat:
            unexpected.append(k)
            continue
        if dst_flat[k].shape != v.shape:
            # stem conv channel mismatch → recycle channels (patch_first_conv)
            if k.endswith('conv1/kernel') and v.ndim == 4 and \
                    dst_flat[k].shape[:2] == v.shape[:2] and dst_flat[k].shape[3] == v.shape[3]:
                # recycle from the kernel's ACTUAL in-channel count — the
                # default of 3 crashes on 1-channel sources and mis-scales
                # any non-RGB source
                v = patch_first_conv(v, dst_flat[k].shape[2],
                                     default_in_channels=v.shape[2])
            else:
                mismatched.append((k, v.shape, dst_flat[k].shape))
                continue
        new_flat[k] = v.astype(dst_flat[k].dtype)
        loaded += 1
    missing = [k for k in dst_flat if k not in {
        (f"{kk.split('/', 1)[0]}/{offset}{kk.split('/', 1)[1]}" if offset else kk)
        for kk in src}]
    if log:
        logger.info('load_weights(%s): loaded %d tensors; %d missing, %d unexpected, %d mismatched',
                    path, loaded, len(missing), len(unexpected), len(mismatched))
        for k, s_src, s_dst in mismatched:
            logger.warning('shape mismatch %s: file %s vs model %s', k, s_src, s_dst)

    new_tree = unflatten_tree(new_flat)
    new_params = new_tree.get('params', {})
    new_bs = new_tree.get('batch_stats', batch_stats) if batch_stats is not None else None
    return new_params, new_bs
