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

# heavyweight deep-parity battery: excluded from the default run (pyproject
# addopts); run with `pytest -m parity` or `-m 'parity or not parity'`
pytestmark = pytest.mark.parity

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

    class _PrettyTable:
        # functional enough for ever.metric.pixel's AccTable (field_names /
        # add_row / _rows / get_string) — an inert stub would poison the
        # metric-parity comparisons if this module imports `ever` first
        def __init__(self, field_names=None, **kw):
            self.field_names = list(field_names) if field_names else []
            self._rows = []

        def add_row(self, row):
            self._rows.append(list(row))

        def get_string(self):
            rows = [self.field_names] + self._rows
            return '\n'.join(' | '.join(str(c) for c in r) for r in rows)

    stub('wandb', run=None, init=lambda **k: None, log=lambda *a, **k: None)
    stub('prettytable', PrettyTable=_PrettyTable)
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
    # the reference allocates cls/storage/mask tokens with torch.empty and
    # only fills them in the separate init_weights() hook
    # (vision_transformer.py:123-199) — without it the test compares
    # whatever garbage memory the allocator handed out (observed: inf/NaN
    # runs that flaked this test)
    ref.init_weights()
    ref.eval()
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


# -- EfficientNet / ResNeSt transplant parity --------------------------------
# The reference encoders wrap the external ``efficientnet_pytorch`` and
# ``resnest`` packages (``ever/module/efficientnet.py:8-36``,
# ``ever/module/resnest.py:17-24``), which are not installed in this image.
# The torch oracles below replicate those packages' published architectures
# AND state_dict naming exactly, so the converter + flax modules are tested
# against the same tensor layout a real pretrained checkpoint would carry.


def _tf_same_pad(size, k, s, d):
    import math as _m
    out = _m.ceil(size / s)
    return max((out - 1) * s + (k - 1) * d + 1 - size, 0)


class _SameConv2d:
    """TF-SAME conv (efficientnet_pytorch's Conv2dStaticSamePadding)."""

    def __new__(cls, cin, cout, k, stride=1, dilation=1, groups=1, bias=True):
        import torch.nn as tnn
        import torch.nn.functional as F

        class M(tnn.Conv2d):
            def forward(self, x):
                ih, iw = x.shape[-2:]
                ph = _tf_same_pad(ih, self.kernel_size[0], self.stride[0],
                                  self.dilation[0])
                pw = _tf_same_pad(iw, self.kernel_size[1], self.stride[1],
                                  self.dilation[1])
                x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
                return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                                self.dilation, self.groups)

        return M(cin, cout, k, stride=stride, dilation=dilation, groups=groups,
                 bias=bias)


def _make_torch_efficientnet_b0():
    import torch.nn as tnn

    B0 = [(1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
          (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
          (6, 320, 1, 1, 3)]
    BN = dict(eps=1e-3, momentum=0.01)

    class MBConvBlock(tnn.Module):
        def __init__(self, cin, cout, expand, k, stride):
            super().__init__()
            mid = cin * expand
            if expand != 1:
                self._expand_conv = _SameConv2d(cin, mid, 1, bias=False)
                self._bn0 = tnn.BatchNorm2d(mid, **BN)
            self._depthwise_conv = _SameConv2d(mid, mid, k, stride=stride,
                                               groups=mid, bias=False)
            self._bn1 = tnn.BatchNorm2d(mid, **BN)
            se_c = max(1, int(cin * 0.25))
            self._se_reduce = _SameConv2d(mid, se_c, 1)
            self._se_expand = _SameConv2d(se_c, mid, 1)
            self._project_conv = _SameConv2d(mid, cout, 1, bias=False)
            self._bn2 = tnn.BatchNorm2d(cout, **BN)
            self.expand, self.cin, self.cout, self.stride = expand, cin, cout, stride

        def forward(self, x):
            import torch.nn.functional as F
            h = x
            if self.expand != 1:
                h = F.silu(self._bn0(self._expand_conv(h)))
            h = F.silu(self._bn1(self._depthwise_conv(h)))
            s = F.adaptive_avg_pool2d(h, 1)
            s = torch.sigmoid(self._se_expand(F.silu(self._se_reduce(s))))
            h = self._bn2(self._project_conv(h * s))
            if self.stride == 1 and self.cin == self.cout:
                h = h + x
            return h

    class EfficientNetB0(tnn.Module):
        def __init__(self):
            super().__init__()
            self._conv_stem = _SameConv2d(3, 32, 3, stride=2, bias=False)
            self._bn0 = tnn.BatchNorm2d(32, **BN)
            blocks, cin = [], 32
            for expand, c, layers, stride, k in B0:
                for li in range(layers):
                    blocks.append(MBConvBlock(cin, c, expand, k,
                                              stride if li == 0 else 1))
                    cin = c
            self._blocks = tnn.ModuleList(blocks)
            # classification head — present in real checkpoints, must be
            # skipped by the converter
            self._conv_head = _SameConv2d(320, 1280, 1, bias=False)
            self._bn1 = tnn.BatchNorm2d(1280, **BN)
            self._fc = tnn.Linear(1280, 1000)

        def extract_features(self, x):
            import torch.nn.functional as F
            x = F.silu(self._bn0(self._conv_stem(x)))
            feats = []
            for b in self._blocks:
                if tuple(b._depthwise_conv.stride) == (2, 2) or \
                        hasattr(b._depthwise_conv, 'endpoint'):
                    feats.append(x)
                x = b(x)
            feats.append(x)
            return feats

    return EfficientNetB0()


def _efnet_nostride_dilate(model, output_stride):
    """Reference surgery (``ever/module/efficientnet.py:51-106``) on the
    oracle: disable stride-2 past the cut, dilate depthwise convs."""
    import math as _m
    n = int(_m.log2(output_stride) - 1)
    m = 0
    for b in model._blocks:
        dw = b._depthwise_conv
        if tuple(dw.stride) == (2, 2):
            if n == 0:
                m += 1
            else:
                n -= 1
        if m > 0:
            dilate = 2 ** m
            if tuple(dw.stride) == (2, 2):
                dw.stride = (1, 1)
                dw.endpoint = True
                dw.dilation = (dilate // 2, dilate // 2)
            else:
                dw.dilation = (dilate, dilate)


def _randomize_state(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if not torch.is_floating_point(v):
            continue
        if 'running_var' in k:
            v.copy_(torch.rand(v.shape, generator=g) + 0.5)
        else:
            v.copy_(torch.randn(v.shape, generator=g) * 0.1)


@pytest.mark.parametrize('output_stride', [32, 16])
def test_efficientnet_encoder_matches_oracle(tmp_path, output_stride):
    import jax
    import jax.numpy as jnp
    from ever_tpu.core import builder
    from ever_tpu.util import weight_io

    torch.manual_seed(0)
    ref = _make_torch_efficientnet_b0()
    _randomize_state(ref)
    if output_stride != 32:
        _efnet_nostride_dilate(ref, output_stride)
    ref.eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref.extract_features(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref_feats = [np.transpose(f.numpy(), (0, 2, 3, 1)) for f in ref_feats]
    assert len(ref_feats) == 5  # reference taps os2..os32

    pth = tmp_path / 'efnet.pth'
    torch.save(ref.state_dict(), str(pth))
    ours = builder.make_model({'type': 'EFNetEncoder', 'params': dict(
        efficientnet_type='efficientnet-b0', output_stride=output_stride)})
    variables = ours.init({'params': jax.random.key(0)}, jnp.asarray(x),
                          train=True)
    params, batch_stats = weight_io.load_weights(
        str(pth), variables['params'], variables['batch_stats'], log=False)
    our_feats = ours.apply({'params': params, 'batch_stats': batch_stats},
                           jnp.asarray(x))

    assert len(our_feats) == 5
    for i, (a, b) in enumerate(zip(our_feats, ref_feats)):
        assert a.shape == b.shape, f'level {i}: {a.shape} vs {b.shape}'
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-3, atol=1e-3,
                                   err_msg=f'feature level {i}')


def _make_torch_resnest50(layers=(3, 4, 6, 3), geometry=None):
    """resnest.torch.resnest50 architecture + naming: deep stem (stem_width
    32), avg_down, radix 2, avd (avd_first=False)."""
    import torch.nn as tnn
    import torch.nn.functional as F

    class SplAtConv2d(tnn.Module):
        def __init__(self, cin, channels, stride=1, dilation=1, radix=2):
            super().__init__()
            inter = max(cin * radix // 4, 32)
            self.conv = tnn.Conv2d(cin, channels * radix, 3, stride,
                                   padding=dilation, dilation=dilation,
                                   groups=radix, bias=False)
            self.bn0 = tnn.BatchNorm2d(channels * radix)
            self.fc1 = tnn.Conv2d(channels, inter, 1)
            self.bn1 = tnn.BatchNorm2d(inter)
            self.fc2 = tnn.Conv2d(inter, channels * radix, 1)
            self.radix, self.channels = radix, channels

        def forward(self, x):
            x = F.relu(self.bn0(self.conv(x)))
            b = x.shape[0]
            splited = torch.split(x, self.channels, dim=1)
            gap = sum(splited)
            gap = F.adaptive_avg_pool2d(gap, 1)
            gap = F.relu(self.bn1(self.fc1(gap)))
            atten = self.fc2(gap)
            atten = atten.view(b, 1, self.radix, -1).transpose(1, 2)
            atten = F.softmax(atten, dim=1).reshape(b, -1, 1, 1)
            attens = torch.split(atten, self.channels, dim=1)
            return sum(att * sp for att, sp in zip(attens, splited))

    class Bottleneck(tnn.Module):
        def __init__(self, cin, planes, stride=1, dilation=1, first_dilation=1,
                     downsample=None, avd=False):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = SplAtConv2d(planes, planes, 1, first_dilation)
            self.avd_layer = tnn.AvgPool2d(3, stride, padding=1) if avd else None
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.downsample = downsample

        def forward(self, x):
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.conv2(out)
            if self.avd_layer is not None:
                out = self.avd_layer(out)
            out = self.bn3(self.conv3(out))
            identity = x if self.downsample is None else self.downsample(x)
            return F.relu(out + identity)

    class ResNeSt(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Sequential(
                tnn.Conv2d(3, 32, 3, 2, 1, bias=False), tnn.BatchNorm2d(32),
                tnn.ReLU(inplace=True),
                tnn.Conv2d(32, 32, 3, 1, 1, bias=False), tnn.BatchNorm2d(32),
                tnn.ReLU(inplace=True),
                tnn.Conv2d(32, 64, 3, 1, 1, bias=False))
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            cin = 64
            geo = geometry or [(1, 1, 1), (2, 1, 1), (2, 1, 1), (2, 1, 1)]
            for i, (n, planes) in enumerate(zip(layers, (64, 128, 256, 512))):
                stride, dil, first_dil = geo[i]
                blocks = []
                for bidx in range(n):
                    s = stride if bidx == 0 else 1
                    ds = None
                    if bidx == 0 and (s != 1 or cin != planes * 4):
                        pool = (tnn.AvgPool2d(s, s, ceil_mode=True,
                                              count_include_pad=False)
                                if s > 1 else tnn.Identity())
                        ds = tnn.Sequential(
                            pool, tnn.Conv2d(cin, planes * 4, 1, bias=False),
                            tnn.BatchNorm2d(planes * 4))
                    blocks.append(Bottleneck(
                        cin, planes, s,
                        dilation=dil,
                        first_dilation=first_dil if bidx == 0 else dil,
                        downsample=ds, avd=(bidx == 0 and i >= 1)))
                    cin = planes * 4
                setattr(self, f'layer{i + 1}', tnn.Sequential(*blocks))
            self.fc = tnn.Linear(2048, 1000)

        def forward(self, x):
            x = F.relu(self.bn1(self.conv1(x)))
            x = self.maxpool(x)
            c2 = self.layer1(x)
            c3 = self.layer2(c2)
            c4 = self.layer3(c3)
            c5 = self.layer4(c4)
            return c2, c3, c4, c5

    return ResNeSt()


@pytest.mark.parametrize('output_stride', [32, 16])
def test_resnest_encoder_matches_oracle(tmp_path, output_stride):
    import jax
    import jax.numpy as jnp
    from ever_tpu.core import builder
    from ever_tpu.module.resnet import _stage_geometry
    from ever_tpu.util import weight_io

    torch.manual_seed(0)
    ref = _make_torch_resnest50(geometry=_stage_geometry(output_stride))
    _randomize_state(ref, seed=1)
    ref.eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref_feats = [np.transpose(f.numpy(), (0, 2, 3, 1)) for f in ref_feats]

    pth = tmp_path / 'resnest.pth'
    torch.save(ref.state_dict(), str(pth))
    ours = builder.make_model({'type': 'ResNeStEncoder', 'params': dict(
        resnest_type='resnest50', output_stride=output_stride)})
    variables = ours.init({'params': jax.random.key(0)}, jnp.asarray(x),
                          train=True)
    params, batch_stats = weight_io.load_weights(
        str(pth), variables['params'], variables['batch_stats'], log=False)
    our_feats = ours.apply({'params': params, 'batch_stats': batch_stats},
                           jnp.asarray(x))

    assert len(our_feats) == 4
    for i, (a, b) in enumerate(zip(our_feats, ref_feats)):
        assert a.shape == b.shape, f'level {i}: {a.shape} vs {b.shape}'
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-3, atol=1e-3,
                                   err_msg=f'feature level {i}')
