"""Shape/forward tests across the model zoo (SURVEY.md §2.8 inventory)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ever_tpu  # noqa: F401
from ever_tpu.core import builder


def _init_apply(model, *args, train=False):
    variables = model.init({'params': jax.random.key(0), 'dropout': jax.random.key(1)},
                           *args, train=train)
    out = model.apply(variables, *args, train=train,
                      mutable=['batch_stats'] if 'batch_stats' in variables else [],
                      rngs={'dropout': jax.random.key(2)})
    if isinstance(out, tuple) and len(out) == 2 and isinstance(out[1], dict):
        out = out[0]
    return variables, out


def test_resnet_encoder_multiscale_shapes():
    m = builder.make_model({'type': 'ResNetEncoder',
                            'params': dict(resnet_type='resnet18')})
    x = jnp.ones((1, 64, 64, 3))
    _, feats = _init_apply(m, x, train=True)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512)]


def test_resnet_output_stride_8():
    m = builder.make_model({'type': 'ResNetEncoder',
                            'params': dict(resnet_type='resnet18', output_stride=8)})
    x = jnp.ones((1, 64, 64, 3))
    _, feats = _init_apply(m, x)
    # c4/c5 keep os8 spatial size under dilation
    assert feats[2].shape[1:3] == (8, 8)
    assert feats[3].shape[1:3] == (8, 8)


def test_resnet_in_channels_4():
    m = builder.make_model({'type': 'ResNetEncoder',
                            'params': dict(resnet_type='resnet18', in_channels=4)})
    x = jnp.ones((1, 32, 32, 4))
    _, feats = _init_apply(m, x)
    assert feats[0].shape == (1, 8, 8, 64)


def test_hrnet_encoder_branches():
    m = builder.make_model({'type': 'HRNetEncoder',
                            'params': dict(hrnet_type='hrnetv2_w18')})
    x = jnp.ones((1, 64, 64, 3))
    _, feats = _init_apply(m, x, train=True)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 18), (1, 8, 8, 36), (1, 4, 4, 72), (1, 2, 2, 144)]


def test_densenet_encoder_channels():
    m = builder.make_model({'type': 'DenseNetEncoder',
                            'params': dict(densenet_type='densenet121')})
    x = jnp.ones((1, 64, 64, 3))
    _, feats = _init_apply(m, x, train=True)
    assert [f.shape[-1] for f in feats] == [256, 512, 1024, 1024]
    assert m.out_channels() == (256, 512, 1024, 1024)


@pytest.mark.parametrize('head_type,feat_spec,kwargs', [
    ('ASPPHead', 'single', dict(aspp=dict(in_channels=64, out_channels=32,
                                          atrous_rates=[2, 4]), num_classes=5)),
    ('PPMHead', 'single', dict(ppm=dict(in_channels=64, pool_channels=16,
                                        out_channels=32, bins=(1, 2, 3)),
                               num_classes=5)),
])
def test_single_input_heads(head_type, feat_spec, kwargs):
    m = builder.make_model({'type': head_type, 'params': kwargs})
    x = jnp.ones((1, 8, 8, 64))
    _, out = _init_apply(m, x, train=True)
    assert out.shape[-1] == 5
    assert out.shape[1] > 8  # upsampled


def test_deeplabv3p_head():
    m = builder.make_model({'type': 'Deeplabv3pHead', 'params': dict(
        deeplabv3p_decoder=dict(os4_feature_channels=32, os16_feature_channels=64,
                                aspp_channels=32, aspp_atrous=(2, 4),
                                reduction_dim=8, out_channels=32,
                                num_3x3_convs=2, scale_factor=4.0),
        num_classes=5, upsample_scale=4.0)})
    os4 = jnp.ones((1, 32, 32, 32))
    os16 = jnp.ones((1, 8, 8, 64))
    _, out = _init_apply(m, [os4, os16], train=True)
    assert out.shape == (1, 128, 128, 5)


def test_hrnet_head():
    m = builder.make_model({'type': 'HRNetHead', 'params': dict(
        hrnet_decoder=dict(in_channels=30), num_classes=4, upsample_scale=4.0)})
    feats = [jnp.ones((1, 16, 16, 4)), jnp.ones((1, 8, 8, 8)),
             jnp.ones((1, 4, 4, 8)), jnp.ones((1, 2, 2, 10))]
    _, out = _init_apply(m, feats, train=True)
    assert out.shape == (1, 64, 64, 4)


def _bitemp_data(n=1, size=32, c=3):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(n, size, size, 2 * c)).astype(np.float32))


def _small_cd_params(extra):
    p = dict(
        encoder=dict(resnet_type='resnet18'),
        fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=32),
        decoder=dict(in_channels=32, out_channels=32,
                     in_feat_output_strides=(4, 8, 16, 32),
                     out_feat_output_stride=4),
    )
    p.update(extra)
    return p


def test_changestar_train_and_eval():
    m = builder.make_model({'type': 'ChangeStar', 'params': _small_cd_params(
        dict(changemixin=dict(in_channels=64, inner_channels=8, num_convs=2,
                              scale_factor=4.0), classes=1))})
    x = _bitemp_data()
    y = dict(masks=jnp.zeros((1, 32, 32, 2), jnp.int32),
             change=jnp.zeros((1, 32, 32), jnp.int32))
    variables = m.init({'params': jax.random.key(0)}, x, y, train=True)
    losses, _ = m.apply(variables, x, y, train=True, mutable=['batch_stats'])
    assert 'seg_loss' in losses and 'change_loss' in losses
    s1, s2, cp = m.apply(variables, x)
    assert s1.shape == (1, 32, 32, 1) and cp.shape == (1, 32, 32, 1)


def test_changemask_train_and_eval():
    m = builder.make_model({'type': 'ChangeMask', 'params': _small_cd_params(
        dict(classes=5, loss=dict(ignore_index=255, consistency_weight=0.1)))})
    x = _bitemp_data()
    y = dict(masks=jnp.zeros((1, 32, 32, 2), jnp.int32),
             change=jnp.zeros((1, 32, 32), jnp.int32))
    variables = m.init({'params': jax.random.key(0)}, x, y, train=True)
    losses, _ = m.apply(variables, x, y, train=True, mutable=['batch_stats'])
    assert {'sem_loss', 'change_loss', 'consistency_loss'} <= set(losses)
    p1, p2, cp = m.apply(variables, x)
    assert p1.shape == (1, 32, 32, 5)


def test_changeos_train_and_eval():
    m = builder.make_model({'type': 'ChangeOS', 'params': _small_cd_params(
        dict(damage_classes=5))})
    x = _bitemp_data()
    y = dict(loc=jnp.zeros((1, 32, 32), jnp.int32),
             damage=jnp.zeros((1, 32, 32), jnp.int32))
    variables = m.init({'params': jax.random.key(0)}, x, y, train=True)
    losses, _ = m.apply(variables, x, y, train=True, mutable=['batch_stats'])
    assert {'loc_loss', 'damage_loss'} == set(losses)
    loc, dam = m.apply(variables, x)
    assert loc.shape == (1, 32, 32, 1) and dam.shape == (1, 32, 32, 5)


def test_factseg_train_and_eval():
    m = builder.make_model({'type': 'FactSeg', 'params': dict(
        encoder=dict(resnet_type='resnet18'),
        fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=32),
        decoder=dict(in_channels=32, out_channels=16,
                     in_feat_output_strides=(4, 8, 16, 32),
                     out_feat_output_stride=4),
        classes=6)})
    x = jnp.ones((1, 32, 32, 3))
    y = jnp.zeros((1, 32, 32), jnp.int32)
    variables = m.init({'params': jax.random.key(0)}, x, y, train=True)
    losses, _ = m.apply(variables, x, y, train=True, mutable=['batch_stats'])
    assert {'cls_loss', 'fa_loss', 'dice_loss'} <= set(losses)
    joint = m.apply(variables, x)
    assert joint.shape == (1, 32, 32, 6)
    np.testing.assert_allclose(np.asarray(joint.sum(-1)), 1.0, atol=1e-5)


def test_se_and_gc_plugins():
    m = builder.make_model({'type': 'ResNetEncoder', 'params': dict(
        resnet_type='resnet18', se_ratio=8)})
    x = jnp.ones((1, 32, 32, 3))
    _, feats = _init_apply(m, x)
    assert feats[0].shape[-1] == 64
    m2 = builder.make_model({'type': 'ResNetEncoder', 'params': dict(
        resnet_type='resnet18', gc_ratio=0.125)})
    _, feats2 = _init_apply(m2, x)
    assert feats2[0].shape[-1] == 64


def test_adaptive_avg_pool_matches_torch():
    torch = pytest.importorskip('torch')
    from ever_tpu.module.ops import adaptive_avg_pool
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 13, 17, 3)).astype(np.float32)
    for size in (1, 2, 3, 6):
        ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), size))
        ref = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), size).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_efficientnet_encoder():
    m = builder.make_model({'type': 'EFNetEncoder',
                            'params': dict(efficientnet_type='efficientnet-b0')})
    x = jnp.ones((1, 64, 64, 3))
    _, feats = _init_apply(m, x, train=True)
    # reference taps prev_x at each downsample plus the final output → 5
    # features at os2/4/8/16/32 (ever/module/efficientnet.py:21-31,66-84)
    assert len(feats) == 5
    assert [f.shape[1] for f in feats] == [32, 16, 8, 4, 2]
    assert [f.shape[-1] for f in feats] == list(m.out_channels)
    assert m.out_channels == (16, 24, 40, 112, 320)


def test_efficientnet_output_stride_16():
    m = builder.make_model({'type': 'EFNetEncoder',
                            'params': dict(efficientnet_type='efficientnet-b0',
                                           output_stride=16)})
    x = jnp.ones((1, 64, 64, 3))
    _, feats = _init_apply(m, x)
    assert feats[-1].shape[1] == 4   # os16 held via dilation


def test_convnext_encoder():
    m = builder.make_model({'type': 'ConvNeXtEncoder',
                            'params': dict(convnext_type='convnext_tiny')})
    x = jnp.ones((1, 64, 64, 3))
    _, feats = _init_apply(m, x, train=True)
    assert [f.shape[-1] for f in feats] == [96, 192, 384, 768]
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]


def test_resnest_encoder():
    m = builder.make_model({'type': 'ResNeStEncoder',
                            'params': dict(resnest_type='resnest50')})
    x = jnp.ones((1, 64, 64, 3))
    _, feats = _init_apply(m, x, train=True)
    assert [f.shape[-1] for f in feats] == [256, 512, 1024, 2048]
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]


@pytest.mark.parametrize('mode', ['s2d', 's2dw', 's2d3'])
def test_s2d_stem_exact_fold(mode):
    """S2DStemConv == 7x7/2 conv with torch-style (3,3) padding, exactly.

    All modes (explicit s2d, pure-view W-blocking, pure-view 3-spatial)
    compute the identical function from the same [7,7,C,F] parameter.
    """
    import jax
    from ever_tpu.module.resnet import S2DStemConv
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(7, 7, 3, 16)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    out = S2DStemConv(features=16, mode=mode).apply({'params': {'kernel': w}}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # gradients w.r.t. input and kernel match the plain conv's too
    def f_ref(xx, ww):
        return jnp.sum(jax.lax.conv_general_dilated(
            xx, ww, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) ** 2)

    def f_out(xx, ww):
        return jnp.sum(S2DStemConv(features=16, mode=mode).apply(
            {'params': {'kernel': ww}}, xx) ** 2)

    gx_r, gw_r = jax.grad(f_ref, argnums=(0, 1))(x, w)
    gx_o, gw_o = jax.grad(f_out, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_o), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_o), np.asarray(gw_r),
                               rtol=1e-3, atol=1e-3)


def test_resnet_s2d_stem_variant_same_params():
    """stem='s2d' keeps the conv1/kernel param path and output shapes."""
    import jax
    from ever_tpu.module.resnet import ResNet
    x = jnp.ones((1, 64, 64, 3))
    a = ResNet(resnet_type='resnet18', stem='conv')
    b = ResNet(resnet_type='resnet18', stem='s2d')
    va = a.init({'params': jax.random.key(0)}, x)
    vb = b.init({'params': jax.random.key(0)}, x)
    assert va['params']['conv1']['kernel'].shape == \
        vb['params']['conv1']['kernel'].shape == (7, 7, 3, 64)
    fa = a.apply(va, x)
    fb = b.apply(vb, x)
    assert [f.shape for f in fa] == [f.shape for f in fb]
    # identical params → identical outputs (exact fold)
    fb_same = b.apply(va, x)
    np.testing.assert_allclose(np.asarray(fa[-1]), np.asarray(fb_same[-1]),
                               rtol=1e-4, atol=1e-4)


def test_freenet_hyperspectral():
    m = builder.make_model({'type': 'FreeNet', 'params': dict(
        stage_channels=(16, 24, 32, 48), classes=16)})
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 200)).astype(np.float32))
    y = np.full((1, 64, 64), 255, np.int32)   # sparse GT: few labeled pixels
    y[0, 10:20, 10:20] = 3
    y = jnp.asarray(y)
    v = m.init({'params': jax.random.key(0)}, x, y, train=True)
    losses = m.apply(v, x, y, train=True)
    assert 'cls_loss' in losses and np.isfinite(float(losses['cls_loss']))
    probs = m.apply(v, x)
    assert probs.shape == (1, 64, 64, 16)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_s2d_input_stem_matches_device_s2d():
    """stem='s2d_input' consuming host SpaceToDepth batches == stem='s2d'
    on raw batches, exactly (same [7,7,C,F] parameter, no device copy)."""
    import jax
    from ever_tpu.module.resnet import ResNet, space_to_depth
    from ever_tpu.preprocess import SpaceToDepth

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    a = ResNet(resnet_type='resnet18', stem='s2d')
    b = ResNet(resnet_type='resnet18', stem='s2d_input')
    va = a.init({'params': jax.random.key(0)}, x)
    fa = a.apply(va, x)

    # host transform on each sample, then batch
    t = SpaceToDepth()
    xs = np.stack([t(np.asarray(x[i]))[0] for i in range(2)])
    assert xs.shape == (2, 32, 32, 12)
    np.testing.assert_allclose(np.asarray(space_to_depth(x, 2)), xs,
                               rtol=1e-6, atol=1e-6)
    fb = b.apply(va, jnp.asarray(xs))
    for fa_i, fb_i in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(fa_i), np.asarray(fb_i),
                                   rtol=1e-5, atol=1e-5)


def test_farseg_plusplus_relation_v2():
    """head.relation_type='v2' switches FarSegHead to FSRelationV2
    (FarSeg++, reference fs_relation.py:76-163) end-to-end."""
    m = builder.make_model({'type': 'FarSeg', 'params': dict(
        encoder=dict(resnet_type='resnet18'), classes=5,
        head=dict(relation_type='v2',
                  fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=32),
                  fs_relation=dict(scene_embedding_channels=512,
                                   in_channels_list=(32,)*4, out_channels=32,
                                   scale_aware_proj=True, dropout_rate=0.1),
                  fpn_decoder=dict(in_channels=32, out_channels=32,
                                   in_feat_output_strides=(4, 8, 16, 32),
                                   out_feat_output_stride=4)))})
    x = jnp.ones((1, 32, 32, 3))
    y = jnp.zeros((1, 32, 32), jnp.int32)
    variables = m.init({'params': jax.random.key(0), 'dropout': jax.random.key(1)},
                       x, y, train=True)
    # v2 has per-scale project convs after the gated concat
    assert any('project' in k for k in variables['params']['head']['fs_relation'])
    losses, _ = m.apply(variables, x, y, train=True, mutable=['batch_stats'],
                        rngs={'dropout': jax.random.key(2)})
    assert 'cls_loss' in losses
    out = m.apply(variables, x)
    assert out.shape == (1, 32, 32, 5)


def test_pack2_layer1_matches_default_layout():
    """pack2_layer1 runs layer1 in the 128-lane packed layout with an
    IDENTICAL variable tree (checkpoint/converter compatible) and equal
    outputs (eval exact; train mode within BN reduction-order noise)."""
    from ever_tpu.module.resnet import ResNet
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    base = ResNet(resnet_type='resnet50', include_conv5=False)
    packed = ResNet(resnet_type='resnet50', include_conv5=False,
                    pack2_layer1=True)
    v = base.init({'params': jax.random.key(0)}, x)
    vp = packed.init({'params': jax.random.key(0)}, x)
    ka = [(jax.tree_util.keystr(k), a.shape)
          for k, a in jax.tree_util.tree_flatten_with_path(v)[0]]
    kb = [(jax.tree_util.keystr(k), a.shape)
          for k, a in jax.tree_util.tree_flatten_with_path(vp)[0]]
    assert ka == kb

    oa = base.apply(v, x)
    ob = packed.apply(v, x)
    for a, b in zip(oa, ob):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    (oa, ma), (ob, mb) = (m.apply(v, x, train=True, mutable=['batch_stats'])
                          for m in (base, packed))
    np.testing.assert_allclose(np.asarray(oa[0]), np.asarray(ob[0]),
                               rtol=1e-2, atol=1e-3)
    for a, b in zip(jax.tree.leaves(ma), jax.tree.leaves(mb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-3)


def test_pack2_layer1_basicblock_matches_default_layout():
    """resnet18 (BasicBlock) layer1 pack2 equivalence."""
    from ever_tpu.module.resnet import ResNet
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    base = ResNet(resnet_type='resnet18', include_conv5=False)
    packed = ResNet(resnet_type='resnet18', include_conv5=False,
                    pack2_layer1=True)
    v = base.init({'params': jax.random.key(0)}, x)
    vp = packed.init({'params': jax.random.key(0)}, x)
    ka = [(jax.tree_util.keystr(k), a.shape)
          for k, a in jax.tree_util.tree_flatten_with_path(v)[0]]
    kb = [(jax.tree_util.keystr(k), a.shape)
          for k, a in jax.tree_util.tree_flatten_with_path(vp)[0]]
    assert ka == kb
    oa = base.apply(v, x)
    ob = packed.apply(v, x)
    for a, b in zip(oa, ob):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pack2_stem_exact():
    """s2d_pack2 / s2d_input_pack2 stem modes are bit-exact vs s2d
    (docs/PERFORMANCE.md pack2: window-3 packed conv, 25% fewer MXU
    passes)."""
    from ever_tpu.module.resnet import S2DStemConv
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    ref = S2DStemConv(64, mode='s2d')
    v = ref.init(jax.random.key(0), x)
    a = ref.apply(v, x)
    b = S2DStemConv(64, mode='s2d_pack2').apply(v, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    xs = x.reshape(2, 32, 2, 32, 2, 3).transpose(0, 1, 3, 2, 4, 5).reshape(
        2, 32, 32, 12)
    c = S2DStemConv(64, mode='s2d_input_pack2').apply(v, xs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_hrnet_pack_branches_matches_default_layout():
    """HRNet pack-k branch layout: identical variable tree and equal eval
    outputs (w18 branches run at k=4/2 chosen by _pack_factor)."""
    from ever_tpu.module.hrnet import HRNet
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    base = HRNet(hrnet_type='hrnetv2_w18')
    packed = HRNet(hrnet_type='hrnetv2_w18', pack_branches=True)
    v = base.init({'params': jax.random.key(0)}, x)
    vp = packed.init({'params': jax.random.key(0)}, x)
    ka = [(jax.tree_util.keystr(k), a.shape)
          for k, a in jax.tree_util.tree_flatten_with_path(v)[0]]
    kb = [(jax.tree_util.keystr(k), a.shape)
          for k, a in jax.tree_util.tree_flatten_with_path(vp)[0]]
    assert ka == kb
    oa = base.apply(v, x)
    ob = packed.apply(v, x)
    for a, b in zip(oa, ob):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_s2d_input_stem_accepts_odd_folded_dims():
    """stem='s2d_input' receives an ALREADY-FOLDED batch; the even-H/W guard
    (which only applies to on-device fold modes) must not silently swap in a
    7x7/2 conv over the folded layout when the folded dims are odd."""
    from ever_tpu.module.resnet import ResNet
    m = ResNet(resnet_type='resnet18', stem='s2d_input')
    x = jnp.zeros((1, 17, 17, 12), jnp.float32)  # odd folded dims, 4*3 ch
    variables = m.init(jax.random.key(0), x)
    # the s2d stem holds the ORIGINAL [7,7,3,64] kernel
    assert variables['params']['conv1']['kernel'].shape == (7, 7, 3, 64)


def test_scse_modes_match_reference_semantics():
    """SCSE: reference default mode='concat' outputs 2C channels; maxout and
    add are the alternatives (ever/module/se_block.py:29-61)."""
    from ever_tpu.module.se_block import SCSEModule
    x = jnp.ones((1, 8, 8, 16), jnp.float32)
    for mode, ch in (('concat', 32), ('maxout', 16), ('add', 16)):
        m = SCSEModule(mode=mode)
        y, _ = m.init_with_output(jax.random.key(0), x)
        assert y.shape == (1, 8, 8, ch), (mode, y.shape)


def test_bifpn_maxpool_downsample_has_bn():
    """BiFPN downsample_op='maxpool' must carry the BN(+ReLU) the reference
    puts after the pool (ever/module/fpn.py:270-275)."""
    from ever_tpu.module.fpn import BiFPN
    feats = [jnp.ones((1, 32 // (2 ** i), 32 // (2 ** i), 8), jnp.float32)
             for i in range(3)]
    m = BiFPN(in_channels=8, feature_strides=(8, 16, 32),
              downsample_op='maxpool')
    variables = m.init(jax.random.key(0), feats)
    names = list(variables['params'].keys()) + list(
        variables.get('batch_stats', {}).keys())
    assert any('down0_bn' in n for n in names), names


def test_efficientnet_drop_connect():
    """Stochastic depth engages in train mode (package parity: linearly
    scaled drop_connect, default 0.2) and is inert at eval."""
    from ever_tpu.module.efficientnet import EfficientNet
    m = EfficientNet(model_name='efficientnet-b0')
    x = jnp.ones((2, 64, 64, 3), jnp.float32)
    variables = m.init(jax.random.key(0), x)
    e1 = m.apply(variables, x, train=False)
    e2 = m.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(e1[-1]), np.asarray(e2[-1]))
    t1, _ = m.apply(variables, x, train=True, mutable=['batch_stats'],
                    rngs={'dropout': jax.random.key(1)})
    t2, _ = m.apply(variables, x, train=True, mutable=['batch_stats'],
                    rngs={'dropout': jax.random.key(2)})
    assert not np.allclose(np.asarray(t1[-1]), np.asarray(t2[-1]))


def test_vit_encoder_pyramid_out_indices_mismatch_raises():
    from ever_tpu.module.vit import ViTEncoder
    enc = ViTEncoder(dict(vit_type='vit_small', pyramid=True,
                          out_indices=[1, 3, 5, 7, 9, 11]))
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    with pytest.raises(ValueError, match='pyramid'):
        enc.init(jax.random.key(0), x)


def test_changemixin_order_stacked_equivalence():
    """order_stacked=True (one 2F-channel conv0 on the N batch — the MXU
    lane-padding fix, VERDICT r3 #4) has an identical parameter tree and
    matches the stacked-batch FCN in eval AND train mode (incl. BN stats
    pooling over both temporal orders) to float tolerance."""
    import numpy as np

    from ever_tpu.module.change import ChangeMixin

    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.normal(size=(2, 16, 16, 256)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(2, 16, 16, 256)), jnp.float32)
    kw = dict(in_channels=512, inner_channels=16, num_convs=4,
              scale_factor=4.0)
    base = ChangeMixin(**kw)
    stacked = ChangeMixin(order_stacked=True, **kw)

    v = base.init({'params': jax.random.key(0)}, f1, f2, train=True)
    v2 = stacked.init({'params': jax.random.key(0)}, f1, f2, train=True)
    flat = jax.tree_util.tree_flatten_with_path(v['params'])[0]
    flat2 = jax.tree_util.tree_flatten_with_path(v2['params'])[0]
    assert [(k, l.shape) for k, l in flat] == [(k, l.shape) for k, l in flat2]

    a, am = base.apply(v, f1, f2, train=True, mutable=['batch_stats'])
    b, bm = stacked.apply(v, f1, f2, train=True, mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=5e-6)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=5e-6)
    for x, y in zip(jax.tree.leaves(am), jax.tree.leaves(bm)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-6)
