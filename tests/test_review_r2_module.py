"""Regression tests for the round-2 model-zoo review findings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ever_tpu  # noqa: F401
from ever_tpu.core import builder


def test_resnest_stem_width_per_variant():
    """resnest101/200/269 use stem_width 64 (64/64/128 deep stem); only
    resnest50 uses 32 (reference resnest.py:44-46)."""
    from ever_tpu.module.resnest import ResNeSt

    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    p50 = ResNeSt(resnest_type='resnest50').init(
        {'params': jax.random.PRNGKey(0)}, x)['params']
    assert p50['stem_conv1']['kernel'].shape == (3, 3, 3, 32)
    assert p50['stem_conv3']['kernel'].shape[-1] == 64
    p101 = ResNeSt(resnest_type='resnest101').init(
        {'params': jax.random.PRNGKey(0)}, x)['params']
    assert p101['stem_conv1']['kernel'].shape == (3, 3, 3, 64)
    assert p101['stem_conv3']['kernel'].shape[-1] == 128


def test_splat_radix1_sigmoid_gate():
    """radix=1 must be a live sigmoid channel gate (softmax over a singleton
    axis was constant 1.0 — dead attention params)."""
    from ever_tpu.module.resnest import SplAtConv2d

    x = jnp.ones((1, 8, 8, 16), jnp.float32)
    m = SplAtConv2d(16, radix=1)
    variables = m.init({'params': jax.random.PRNGKey(0)}, x)
    out = m.apply(variables, x)
    # drive the gate hard negative: sigmoid -> ~0 -> output collapses
    p = jax.tree.map(lambda a: a, variables['params'])
    p['fc2']['bias'] = jnp.full_like(p['fc2']['bias'], -30.0)
    p['fc2']['kernel'] = jnp.zeros_like(p['fc2']['kernel'])
    out_gated = m.apply({'params': p, **{k: v for k, v in variables.items()
                                         if k != 'params'}}, x)
    assert float(jnp.max(jnp.abs(out_gated))) < 1e-6
    assert float(jnp.max(jnp.abs(out))) > 1e-3


def test_reference_config_key_aliases():
    """Configs ported verbatim from the reference (ef_name / name) must
    build the named variant, not silently fall back to the default."""
    ef = builder.make_model({'type': 'EFNetEncoder', 'params': dict(
        ef_name='efficientnet-b2')})
    assert ef.out_channels == (16, 24, 48, 120, 352)
    rn = builder.make_model({'type': 'ResNeStEncoder', 'params': dict(
        name='resnest101')})
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    params = rn.init({'params': jax.random.PRNGKey(0)}, x)['params']
    assert params['net']['stem_conv1']['kernel'].shape == (3, 3, 3, 64)


def test_s2d_input_pack2_odd_dims_uses_stem_conv():
    """stem='s2d_input_pack2' with odd folded dims must still dispatch to
    S2DStemConv (the == check fell through to a geometrically-wrong 7x7/2
    conv over the already-folded layout)."""
    from ever_tpu.module.resnet import ResNet

    net = ResNet(resnet_type='resnet18', stem='s2d_input_pack2')
    x = jnp.ones((1, 127, 127, 12), jnp.float32)  # folded, odd dims
    params = net.init({'params': jax.random.PRNGKey(0)}, x)['params']
    # S2DStemConv stores the TRUE [7,7,3,64] kernel
    assert params['conv1']['kernel'].shape == (7, 7, 3, 64)


def test_changestar_single_temporal_masks():
    """3D masks [N,H,W] are the single mask (slicing [..., 0] cut the
    width axis and crashed/garbaged the loss)."""
    model = builder.make_model({'type': 'ChangeStar', 'params': dict(
        encoder=dict(resnet_type='resnet18'),
        fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=32),
        decoder=dict(in_channels=32, out_channels=32,
                     in_feat_output_strides=(4, 8, 16, 32),
                     out_feat_output_stride=4),
        changemixin=dict(in_channels=64, inner_channels=8, num_convs=2,
                         scale_factor=4.0),
        classes=1, loss=dict(ignore_index=255))})
    x = jnp.ones((2, 32, 32, 6), jnp.float32)
    y = {'masks': jnp.zeros((2, 32, 32), jnp.int32)}
    variables = model.init({'params': jax.random.PRNGKey(0)}, x, y, train=True)
    out = model.apply(variables, x, y, train=True, mutable=['batch_stats'])[0]
    assert np.isfinite(float(out['seg_loss']))


def test_residual_block_no_post_add_relu():
    """Reference ResidualBlock returns seq(x) + identity bare
    (ops.py:103-112) — negative sums must survive."""
    from ever_tpu.module.ops import ResidualBlock

    m = ResidualBlock(4, norm=None)
    x = -10.0 * jnp.ones((1, 8, 8, 4), jnp.float32)
    variables = m.init({'params': jax.random.PRNGKey(0)}, x)
    out = m.apply(variables, x)
    assert float(jnp.min(out)) < 0


def test_fpn_convs_bias_free_kaiming():
    """Every FPN inner/layer conv matches the reference factory: bias-free
    (conv_with_kaiming_uniform passes bias=False, fpn.py:23-37)."""
    from ever_tpu.module.fpn import FPN

    feats = [jnp.ones((1, 32 // s, 32 // s, c), jnp.float32)
             for s, c in ((1, 16), (2, 32), (4, 64), (8, 128))]
    params = FPN(in_channels_list=(16, 32, 64, 128), out_channels=8).init(
        {'params': jax.random.PRNGKey(0)}, feats)['params']

    def walk(tree, prefix=''):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from walk(v, prefix + k + '/')
            else:
                yield prefix + k

    leaves = list(walk(params))
    assert not any(name.endswith('bias') for name in leaves), leaves


def test_ppm_channel_dropout_and_alias():
    """PPM dropout is whole-channel (reference nn.Dropout2d) and the
    reference kwarg spelling `dropout` is honored."""
    from ever_tpu.module.heads import PyramidPoolModule

    m = PyramidPoolModule(in_channels=16, pool_channels=8, out_channels=8,
                          bins=(1, 2), dropout=0.5)
    m0 = PyramidPoolModule(in_channels=16, pool_channels=8, out_channels=8,
                           bins=(1, 2), dropout=0.0)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 8, 8, 16)).astype(np.float32))
    variables = m.init({'params': jax.random.PRNGKey(0)}, x)
    y = np.asarray(m.apply(variables, x, True,
                           rngs={'dropout': jax.random.PRNGKey(1)},
                           mutable=['batch_stats'])[0])
    y0 = np.asarray(m0.apply(variables, x, True,
                             mutable=['batch_stats'])[0])
    # each (sample, channel) map is either fully dropped or the no-dropout
    # map scaled by 1/keep = 2 — per-ELEMENT dropout would mix within a map
    flat, flat0 = (a.reshape(a.shape[0], -1, a.shape[-1]) for a in (y, y0))
    dropped = (flat == 0).all(axis=1)
    kept = np.isclose(flat, 2.0 * flat0, atol=1e-5).all(axis=1)
    assert (dropped | kept).all()
    assert dropped.any(), 'dropout never fired at rate 0.5'
    assert kept.any()


def test_bifpn_duplicate_strides_use_adapter():
    """Equal-stride level pairs get a learned 1x1 conv-bn-relu adapter
    (reference fpn.py:264-278), not an identity resize."""
    from ever_tpu.module.fpn import BiFPN

    m = BiFPN(in_channels=8, feature_strides=(4, 8, 8))
    feats = [jnp.ones((1, 16, 16, 8), jnp.float32),
             jnp.ones((1, 8, 8, 8), jnp.float32),
             jnp.ones((1, 8, 8, 8), jnp.float32)]
    variables = m.init({'params': jax.random.PRNGKey(0)}, feats)
    names = set(variables['params'].keys())
    assert any('adapter' in n for n in names), names
    out = m.apply(variables, feats, mutable=['batch_stats'])[0]
    assert [tuple(o.shape) for o in out] == [(1, 16, 16, 8), (1, 8, 8, 8),
                                             (1, 8, 8, 8)]


def test_head_align_corners_default_matches_reference():
    """Head upsamples default to align_corners=True (reference
    UpsamplingBilinear2d); the config flag opts out."""
    cfg = dict(aspp=dict(in_channels=8, out_channels=8,
                         atrous_rates=[2, 4]),
               num_classes=3, upsample_scale=4.0, dtype='float32')
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 8, 8, 8)).astype(np.float32))
    h1 = builder.make_model({'type': 'ASPPHead', 'params': dict(cfg)})
    v1 = h1.init({'params': jax.random.PRNGKey(0)}, x)
    y1 = h1.apply(v1, x)
    h2 = builder.make_model({'type': 'ASPPHead',
                             'params': dict(cfg, align_corners=False)})
    y2 = h2.apply(v1, x)
    assert y1.shape == (1, 32, 32, 3)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))

    # align_corners=True matches torch UpsamplingBilinear2d exactly
    import torch
    from ever_tpu.module.ops import resize
    src = np.random.default_rng(1).normal(size=(1, 8, 8, 3)).astype(np.float32)
    ours = resize(jnp.asarray(src), scale=4.0, method='bilinear',
                  align_corners=True)
    theirs = torch.nn.UpsamplingBilinear2d(scale_factor=4.0)(
        torch.from_numpy(src.transpose(0, 3, 1, 2))).numpy().transpose(
        0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_remat_flags_work():
    """with_cp / memory_efficient crashed with TracerBoolConversionError
    (nn.remat traced the python `train` bool; needs static_argnums)."""
    from ever_tpu.module.resnet import ResNet
    from ever_tpu.module.densenet import DenseNet

    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    v = ResNet(resnet_type='resnet18', with_cp=(True,) * 4).init(
        {'params': jax.random.PRNGKey(0)}, x, True)
    assert 'block0' in v['params']['layer1']
    v = DenseNet(densenet_type='densenet121', memory_efficient=True).init(
        {'params': jax.random.PRNGKey(0)}, x, True)
    m = builder.make_model({'type': 'HRNetEncoder', 'params': dict(
        hrnet_type='hrnetv2_w18', with_cp=True)})
    m.init({'params': jax.random.PRNGKey(0)}, x, True)


def test_vit_reference_defaults():
    """Ladder factories follow the reference constructor defaults: NO
    LayerScale unless layerscale_init is passed, UNIFORM drop path (no
    per-depth ramp), rms eps 1e-5."""
    from ever_tpu.module.vit import DinoVisionTransformer

    m = DinoVisionTransformer(vit_type='vit_small')
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    params = m.init({'params': jax.random.PRNGKey(0)}, x)['params']
    assert 'ls1' not in params['block0'], 'default must not create LayerScale'
    m2 = DinoVisionTransformer(vit_type='vit_small', layerscale_init=1e-5)
    p2 = m2.init({'params': jax.random.PRNGKey(0)}, x)['params']
    assert 'ls1' in p2['block0'] and 'ls2' in p2['block0']
    # uniform drop path: every block gets the SAME rate attribute
    m3 = DinoVisionTransformer(vit_type='vit_small', drop_path_rate=0.3)
    m3 = m3.bind({'params': p2})
    rates = {blk.drop_path_rate for blk in m3.blocks}
    assert rates == {0.3}


def test_vit_untie_global_local_cls_norm():
    """Multi-crop training applies local_cls_norm to list index 1 exactly
    (reference vision_transformer.py:249-254); vit7b16_sat493m config
    carries the reference factory defaults (drop_path 0.4, untied local)."""
    from ever_tpu.module.vit import SAT_CONFIGS, DinoVisionTransformer

    cfg = SAT_CONFIGS['vit7b16_sat493m']
    assert cfg['drop_path_rate'] == 0.4
    assert cfg['untie_global_and_local_cls_norm'] is True

    m = DinoVisionTransformer(vit_type='vit_small',
                              untie_cls_and_patch_norms=True,
                              untie_global_and_local_cls_norm=True)
    g = jnp.ones((1, 32, 32, 3), jnp.float32)
    l = jnp.ones((1, 16, 16, 3), jnp.float32)
    v = m.init({'params': jax.random.PRNGKey(0)}, [g, l], True)
    assert 'local_cls_norm' in v['params']
    outs = m.apply(v, [g, l], True, rngs={'dropout': jax.random.PRNGKey(1)})
    assert len(outs) == 2
    # eval path ignores the local norm (training-only)
    outs_eval = m.apply(v, [g, l])
    assert len(outs_eval) == 2


def test_vit_intermediate_layers_untied_norms():
    """get_intermediate_layers normalizes cls/storage with cls_norm on
    untied models (reference vision_transformer.py:310-315)."""
    from ever_tpu.module.vit import DinoVisionTransformer

    m = DinoVisionTransformer(vit_type='vit_small',
                              untie_cls_and_patch_norms=True)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 32, 32, 3)).astype(np.float32))
    v = m.init({'params': jax.random.PRNGKey(0)}, x)
    (patches, cls_tok), = m.apply(v, x, n=1, return_class_token=True,
                                  method=m.get_intermediate_layers)
    full = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(cls_tok),
                               np.asarray(full['x_norm_clstoken']),
                               atol=1e-5)


def test_factseg_empty_dice_dict_enables_dice():
    """loss=dict(dice=dict()) means 'dice with defaults' (the truthiness
    gate silently disabled it)."""
    model = builder.make_model({'type': 'FactSeg', 'params': dict(
        encoder=dict(resnet_type='resnet18'),
        fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=32),
        decoder=dict(in_channels=32, out_channels=32,
                     in_feat_output_strides=(4, 8, 16, 32),
                     out_feat_output_stride=4),
        classes=4,
        loss=dict(ignore_index=255, fa=dict(), dice=dict(), sem=dict()))})
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    y = jnp.zeros((1, 32, 32), jnp.int32)
    v = model.init({'params': jax.random.PRNGKey(0)}, x, y, train=True)
    out = model.apply(v, x, y, train=True, mutable=['batch_stats'])[0]
    assert 'dice_loss' in out


def test_changestar_tuple_labels():
    """The documented tuple label form (sem_t1, sem_t2, change) works."""
    model = builder.make_model({'type': 'ChangeStar', 'params': dict(
        encoder=dict(resnet_type='resnet18'),
        fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=32),
        decoder=dict(in_channels=32, out_channels=32,
                     in_feat_output_strides=(4, 8, 16, 32),
                     out_feat_output_stride=4),
        changemixin=dict(in_channels=64, inner_channels=8, num_convs=2,
                         scale_factor=4.0),
        classes=1, loss=dict(ignore_index=255))})
    x = jnp.ones((2, 32, 32, 6), jnp.float32)
    y = (jnp.zeros((2, 32, 32), jnp.int32),
         jnp.ones((2, 32, 32), jnp.int32),
         jnp.ones((2, 32, 32), jnp.int32))
    v = model.init({'params': jax.random.PRNGKey(0)}, x, y, train=True)
    out = model.apply(v, x, y, train=True, mutable=['batch_stats'])[0]
    assert np.isfinite(float(out['seg_loss']))
    assert np.isfinite(float(out['change_loss']))
