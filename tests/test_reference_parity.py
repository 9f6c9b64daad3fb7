"""Numerical parity vs the PyTorch reference (same weights, same input).

Loads /root/reference's actual ``ResNetEncoder`` (torch, CPU), transfers its
state_dict into our flax encoder via the weight converter, and compares
multi-scale features end to end.  This pins down conv padding conventions,
dilation geometry, BN epsilon/statistics handling — the things a LoveDA mIoU
comparison would catch, without needing the dataset.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

REFERENCE = '/root/reference'


def _import_reference():
    if not os.path.isdir(REFERENCE):
        pytest.skip('reference repo not available')

    def stub(name, **attrs):
        try:
            __import__(name)
            return
        except ImportError:
            pass
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod

    class _T:
        def __init__(self, *a, **k):
            pass

    stub('wandb', run=None, init=lambda **k: None, log=lambda *a, **k: None)
    stub('prettytable', PrettyTable=type('PrettyTable', (), {}))
    stub('pandas', DataFrame=type('DataFrame', (), {}))
    stub('tqdm', tqdm=lambda x, **k: x)
    stub('albumentations', DualTransform=_T, ImageOnlyTransform=_T,
         RandomScale=_T, BasicTransform=_T, Compose=_T)
    stub('albumentations.pytorch', ToTensorV2=_T)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import ever  # noqa: F401
    return ever


@pytest.mark.parametrize('resnet_type,output_stride', [
    ('resnet18', 32),
    ('resnet50', 32),
    ('resnet50', 16),
    ('resnet50', 8),
])
def test_resnet_encoder_matches_reference(tmp_path, resnet_type, output_stride):
    _import_reference()
    from ever.module import ResNetEncoder as TorchResNetEncoder

    import jax
    import jax.numpy as jnp
    from ever_tpu.core import builder
    from ever_tpu.util import weight_io

    torch.manual_seed(0)
    ref = TorchResNetEncoder(dict(resnet_type=resnet_type, pretrained=False,
                                  output_stride=output_stride))
    ref.eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref_feats = [np.transpose(f.numpy(), (0, 2, 3, 1)) for f in ref_feats]

    # transfer weights
    pth = tmp_path / 'enc.pth'
    torch.save(ref.resnet.state_dict(), str(pth))
    ours = builder.make_model({'type': 'ResNetEncoder',
                               'params': dict(resnet_type=resnet_type,
                                              output_stride=output_stride)})
    variables = ours.init({'params': jax.random.key(0)}, jnp.asarray(x),
                          train=True)
    params, batch_stats = weight_io.load_weights(
        str(pth), variables['params'], variables['batch_stats'], log=False)
    our_feats = ours.apply({'params': params, 'batch_stats': batch_stats},
                           jnp.asarray(x))

    assert len(our_feats) == len(ref_feats)
    for i, (a, b) in enumerate(zip(our_feats, ref_feats)):
        assert a.shape == b.shape, f'level {i}: {a.shape} vs {b.shape}'
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-3, atol=1e-3,
                                   err_msg=f'feature level {i}')


def test_sliding_window_matches_reference():
    _import_reference()
    from ever.magic.bigimage.sliding_window import sliding_window as ref_sw
    from ever_tpu.magic.sliding_window import sliding_window as our_sw

    for size, k, s in [((1000, 900), 512, 256), ((100, 100), 512, 256),
                       ((777, 333), 256, 200), ((512, 512), 512, 512)]:
        np.testing.assert_array_equal(our_sw(size, k, s), ref_sw(size, k, s))


def test_lr_schedules_match_reference():
    _import_reference()
    from ever.opt.learning_rate import (
        MultiStepLearningRate as RefMS,
        PolyLearningRate as RefPoly,
        CosineAnnealingLearningRate as RefCos,
    )
    from ever_tpu.opt.learning_rate import (
        CosineAnnealingLearningRate,
        MultiStepLearningRate,
        PolyLearningRate,
    )

    class FakeOpt:
        param_groups = [{'lr': 0.0}]

    def ref_value(sched, step):
        opt = FakeOpt()
        sched.step(step, opt)
        return opt.param_groups[0]['lr']

    ref = RefPoly(base_lr=0.01, power=0.9, max_iters=100,
                  warmup=dict(type='linear', step=10, ratio=0.1))
    ours = PolyLearningRate(base_lr=0.01, power=0.9, max_iters=100,
                            warmup=dict(type='linear', step=10, ratio=0.1))
    for s in (0, 5, 10, 11, 50, 99):
        assert float(ours(s)) == pytest.approx(ref_value(ref, s), rel=1e-5), s

    ref = RefMS(steps=[30, 60], base_lr=0.1, gamma=0.1)
    ours = MultiStepLearningRate(steps=[30, 60], base_lr=0.1, gamma=0.1)
    for s in (0, 29, 31, 61, 99):
        assert float(ours(s)) == pytest.approx(ref_value(ref, s), rel=1e-5), s

    ref = RefCos(base_lr=0.1, max_iters=100, eta_min=0.001)
    ours = CosineAnnealingLearningRate(base_lr=0.1, max_iters=100, eta_min=0.001)
    for s in (0, 25, 50, 100):
        assert float(ours(s)) == pytest.approx(ref_value(ref, s), rel=1e-5), s


def test_densenet_encoder_matches_reference(tmp_path):
    _import_reference()
    from ever.module import DenseNetEncoder as TorchDenseNetEncoder

    import jax
    import jax.numpy as jnp
    from ever_tpu.core import builder
    from ever_tpu.util import weight_io

    torch.manual_seed(0)
    ref = TorchDenseNetEncoder(dict(densenet_type='densenet121',
                                    pretrained=False))
    ref.eval()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref_feats = [np.transpose(f.numpy(), (0, 2, 3, 1)) for f in ref_feats]

    pth = tmp_path / 'dense.pth'
    torch.save(ref.densenet.state_dict(), str(pth))
    ours = builder.make_model({'type': 'DenseNetEncoder',
                               'params': dict(densenet_type='densenet121')})
    variables = ours.init({'params': jax.random.key(0)}, jnp.asarray(x),
                          train=True)
    params, batch_stats = weight_io.load_weights(
        str(pth), variables['params'], variables['batch_stats'], log=False)
    our_feats = ours.apply({'params': params, 'batch_stats': batch_stats},
                           jnp.asarray(x))
    assert len(our_feats) == len(ref_feats)
    for i, (a, b) in enumerate(zip(our_feats, ref_feats)):
        assert a.shape == b.shape, f'level {i}: {a.shape} vs {b.shape}'
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-3, atol=1e-3,
                                   err_msg=f'feature level {i}')


def test_farseg_head_matches_reference(tmp_path):
    """Full FarSegHead (FPN + FSRelation + AssymetricDecoder) with
    transplanted weights; align_corners=True matches torch upsampling."""
    _import_reference()
    from ever.module.fs_relation import FarSegHead as TorchFarSegHead

    import jax
    import jax.numpy as jnp
    from ever_tpu.core import builder
    from ever_tpu.util import weight_io

    head_cfg = dict(
        fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=32),
        fs_relation=dict(scene_embedding_channels=512,
                         in_channels_list=(32,) * 4,
                         out_channels=32, scale_aware_proj=True),
        fpn_decoder=dict(in_channels=32, out_channels=32,
                         in_feat_output_strides=(4, 8, 16, 32),
                         out_feat_output_stride=4,
                         classifier_config=dict(scale_factor=4.0,
                                                num_classes=7, kernel_size=1)))
    torch.manual_seed(0)
    ref = TorchFarSegHead(dict(head_cfg))
    ref.eval()

    rng = np.random.default_rng(0)
    feats = [rng.normal(size=(1, s, s, c)).astype(np.float32)
             for s, c in ((32, 64), (16, 128), (8, 256), (4, 512))]
    with torch.no_grad():
        ref_out = ref([torch.from_numpy(np.transpose(f, (0, 3, 1, 2)))
                       for f in feats])
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))

    pth = tmp_path / 'head.pth'
    torch.save(ref.state_dict(), str(pth))

    our_cfg = dict(head_cfg)
    our_cfg['fpn_decoder'] = dict(head_cfg['fpn_decoder'], align_corners=True)
    ours = builder.make_model({'type': 'FarSegHead', 'params': our_cfg})
    jfeats = [jnp.asarray(f) for f in feats]
    variables = ours.init({'params': jax.random.key(0)}, jfeats, train=True)
    params, batch_stats = weight_io.load_weights(
        str(pth), variables['params'], variables['batch_stats'], log=False)
    our_out = ours.apply({'params': params, 'batch_stats': batch_stats}, jfeats)

    assert our_out.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(our_out), ref_out,
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize('variant', ['mlp_ln', 'swiglu_rms'])
def test_dinov3_vit_matches_reference(tmp_path, variant):
    """DINOv3 ViT trunk with transplanted weights: RoPE geometry, fused-QKV
    attention, LayerScale, storage tokens, and (variant 2) SwiGLU w1/w2→w12
    fusion + RMSNorm + masked-K qkv bias + untied cls norm."""
    _import_reference()
    from ever.module.dinov3.models.vision_transformer import (
        DinoVisionTransformer as TorchViT)

    import jax
    import jax.numpy as jnp
    import ever_tpu.module.vit as vit
    from ever_tpu.util import weight_io

    tkwargs = dict(img_size=32, patch_size=8, embed_dim=64, depth=2,
                   num_heads=2, ffn_ratio=4, qkv_bias=True,
                   layerscale_init=1e-5, n_storage_tokens=4,
                   pos_embed_rope_dtype='fp32')
    okwargs = dict(patch_size=8, n_storage_tokens=4, layerscale_init=1e-5,
                   qkv_bias=True)
    if variant == 'swiglu_rms':
        tkwargs.update(norm_layer='rmsnorm', ffn_layer='swiglu64',
                       mask_k_bias=True, untie_cls_and_patch_norms=True)
        okwargs.update(norm='rms', norm_eps=1e-5, ffn_layer='swiglu64',
                       untie_cls_and_patch_norms=True)

    torch.manual_seed(0)
    ref = TorchViT(**tkwargs).eval()
    if variant == 'swiglu_rms':
        # bias_mask inits to NaN (filled by load_state_dict in real use,
        # attention.py:36); set the canonical Q/V=1, K=0 pattern
        for blk in ref.blocks:
            m = torch.ones_like(blk.attn.qkv.bias)
            third = m.numel() // 3
            m[third:2 * third] = 0
            blk.attn.qkv.bias_mask.data = m
        # give the (zero-init) masked biases real values to transplant
        with torch.no_grad():
            for blk in ref.blocks:
                blk.attn.qkv.bias.uniform_(-0.05, 0.05)

    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.forward_features(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2))))

    pth = tmp_path / 'vit.pth'
    torch.save(ref.state_dict(), str(pth))

    vit.VIT_SPECS['vit_tiny_test'] = (2, 64, 2, 4.0,
                                      'swiglu' if variant == 'swiglu_rms' else 'mlp')
    try:
        ours = vit.DinoVisionTransformer(vit_type='vit_tiny_test', **okwargs)
        variables = ours.init({'params': jax.random.key(0)}, jnp.asarray(img))
        params, _ = weight_io.load_weights(str(pth), variables['params'],
                                           log=False)
        out = ours.apply({'params': params}, jnp.asarray(img))
    finally:
        del vit.VIT_SPECS['vit_tiny_test']

    for key in ('x_norm_clstoken', 'x_storage_tokens', 'x_norm_patchtokens'):
        np.testing.assert_allclose(np.asarray(out[key]), ref_out[key].numpy(),
                                   rtol=2e-3, atol=2e-3, err_msg=key)


def test_hrnet_encoder_matches_reference(tmp_path):
    """Full HRNetV2-w18 trunk with transplanted weights: stem, bottleneck
    stage1, transitions, 4-branch modules, and cross-resolution fuse layers
    (nearest upsample + strided-conv downsample chains)."""
    _import_reference()
    from ever.module._hrnet import hrnetv2_w18

    import jax
    import jax.numpy as jnp
    from ever_tpu.module.hrnet import HRNet
    from ever_tpu.util import weight_io

    torch.manual_seed(0)
    ref = hrnetv2_w18(pretrained=False)
    ref.eval()

    rng = np.random.default_rng(2)
    img = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(np.transpose(img, (0, 3, 1, 2))))
    ref_outs = [np.transpose(o.numpy(), (0, 2, 3, 1)) for o in ref_outs]

    pth = tmp_path / 'hrnet.pth'
    torch.save(ref.state_dict(), str(pth))

    ours = HRNet(hrnet_type='hrnetv2_w18')
    variables = ours.init({'params': jax.random.key(0)}, jnp.asarray(img))
    params, batch_stats = weight_io.load_weights(
        str(pth), variables['params'], variables['batch_stats'], log=False)
    outs = ours.apply({'params': params, 'batch_stats': batch_stats},
                      jnp.asarray(img))

    assert len(outs) == len(ref_outs) == 4
    for i, (o, r) in enumerate(zip(outs, ref_outs)):
        assert o.shape == r.shape, (i, o.shape, r.shape)
        np.testing.assert_allclose(np.asarray(o), r, rtol=2e-3, atol=2e-3,
                                   err_msg=f'branch {i}')


def test_train_trajectory_matches_reference(tmp_path):
    """Six full optimizer steps of FarSeg-R18 match the torch reference:
    same init weights, same batches, same poly LR / SGD-momentum / global
    clip — per-step losses must track.  This pins the TRAINING semantics
    (CE ignore_index, BN batch-stat updates, clip-then-step ordering,
    schedule indexing) that a LoveDA mIoU comparison would exercise."""
    _import_reference()
    import torch.nn.functional as F
    from ever.module.resnet import ResNetEncoder as TorchEncoder
    from ever.module.fs_relation import FarSegHead as TorchFarSegHead

    import jax
    import jax.numpy as jnp
    from ever_tpu.core import builder
    from ever_tpu.parallel.spmd import build_train_step, create_train_state
    from ever_tpu.util import weight_io

    classes, steps, bsz, size = 5, 6, 2, 64
    head_cfg = dict(
        fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=32),
        fs_relation=dict(scene_embedding_channels=512,
                         in_channels_list=(32,) * 4,
                         out_channels=32, scale_aware_proj=True),
        fpn_decoder=dict(in_channels=32, out_channels=32,
                         in_feat_output_strides=(4, 8, 16, 32),
                         out_feat_output_stride=4,
                         classifier_config=dict(scale_factor=4.0,
                                                num_classes=classes,
                                                kernel_size=1)))

    torch.manual_seed(0)
    t_enc = TorchEncoder(dict(resnet_type='resnet18', pretrained=False))
    t_head = TorchFarSegHead(dict(head_cfg))
    t_enc.train(), t_head.train()
    t_params = list(t_enc.parameters()) + list(t_head.parameters())
    t_opt = torch.optim.SGD(t_params, lr=0.01, momentum=0.9)

    rng = np.random.default_rng(7)
    xs = rng.normal(size=(steps, bsz, size, size, 3)).astype(np.float32)
    ys = rng.integers(0, classes, size=(steps, bsz, size, size)).astype(np.int64)
    ys[:, :, 0, 0] = 255  # exercise ignore_index

    schedule = builder.make_learningrate(
        {'type': 'poly', 'params': dict(base_lr=0.01, power=0.9, max_iters=steps)})

    t_losses = []
    for i in range(steps):
        for g in t_opt.param_groups:
            g['lr'] = float(schedule(i))
        xb = torch.from_numpy(np.transpose(xs[i], (0, 3, 1, 2)))
        yb = torch.from_numpy(ys[i])
        logits = t_head(t_enc(xb))
        loss = F.cross_entropy(logits, yb, ignore_index=255)
        t_opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(t_params, 35.0)
        t_opt.step()
        t_losses.append(float(loss))

    # the torch model has ALREADY trained in-place — re-init with the same
    # seed to recover the pre-training weights for the transplant
    torch.manual_seed(0)
    t_enc0 = TorchEncoder(dict(resnet_type='resnet18', pretrained=False))
    t_head0 = TorchFarSegHead(dict(head_cfg))
    torch.save(t_enc0.state_dict(), str(tmp_path / 'enc0.pth'))
    torch.save(t_head0.state_dict(), str(tmp_path / 'head0.pth'))

    model = builder.make_model({'type': 'FarSeg', 'params': dict(
        encoder=dict(resnet_type='resnet18'),
        head=dict(fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=32),
                  fs_relation=dict(scene_embedding_channels=512,
                                   in_channels_list=(32,) * 4,
                                   out_channels=32, scale_aware_proj=True),
                  fpn_decoder=dict(in_channels=32, out_channels=32,
                                   in_feat_output_strides=(4, 8, 16, 32),
                                   out_feat_output_stride=4,
                                   align_corners=True)),
        classes=classes,
        loss=dict(ignore_index=255, ce=dict()))})
    factory, _ = builder.make_optimizer(
        {'type': 'sgd', 'params': dict(momentum=0.9),
         'grad_clip': dict(max_norm=35.0)})
    tx = factory.build(schedule, grad_clip=dict(max_norm=35.0))

    state = create_train_state(model, tx, (xs[0], ys[0].astype(np.int32)),
                               rng=jax.random.key(0))
    params, bs = state.params, state.batch_stats
    params, bs = weight_io.load_weights(str(tmp_path / 'enc0.pth'), params, bs,
                                        log=False)
    params, bs = weight_io.load_weights(str(tmp_path / 'head0.pth'), params, bs,
                                        log=False)
    state = state.replace(params=params, batch_stats=bs)

    step = build_train_step(model, tx, schedule, donate=False)
    j_losses = []
    for i in range(steps):
        state, metrics = step(state, (jnp.asarray(xs[i]),
                                      jnp.asarray(ys[i].astype(np.int32))))
        j_losses.append(float(metrics['cls_loss']))

    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-3, atol=5e-4)


def test_convnext_encoder_matches_reference(tmp_path):
    """DINOv3-vendored ConvNeXt trunk with transplanted weights: patchify
    stem, pre-LN downsampling, dw7x7/LN/MLP/LayerScale blocks — per-stage
    features match the torch reference (``dinov3/models/convnext.py``)."""
    _import_reference()
    from ever.module.dinov3.models.convnext import ConvNeXt as TorchConvNeXt

    import jax
    import jax.numpy as jnp
    from ever_tpu.module.convnext import ConvNeXt
    from ever_tpu.util import weight_io

    torch.manual_seed(0)
    depths, dims = (2, 2, 2, 2), (16, 32, 64, 128)
    ref = TorchConvNeXt(depths=list(depths), dims=list(dims)).eval()

    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
        ref_feats = []
        for i in range(4):
            x = ref.stages[i](ref.downsample_layers[i](x))
            ref_feats.append(np.transpose(x.numpy(), (0, 2, 3, 1)))

    pth = tmp_path / 'convnext.pth'
    torch.save(ref.state_dict(), str(pth))

    from ever_tpu.module import convnext as cn
    cn.CONVNEXT_SPECS['convnext_test'] = (depths, dims)
    try:
        ours = ConvNeXt(model_name='convnext_test')
        variables = ours.init({'params': jax.random.key(0)}, jnp.asarray(img))
        params, _ = weight_io.load_weights(str(pth), variables['params'],
                                           log=False)
        feats = ours.apply({'params': params}, jnp.asarray(img))
    finally:
        del cn.CONVNEXT_SPECS['convnext_test']

    for i, (got, want) in enumerate(zip(feats, ref_feats)):
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                                   atol=2e-3, err_msg=f'stage {i}')
