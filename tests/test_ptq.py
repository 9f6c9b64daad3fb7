"""Int8 post-training quantization serving path (ever_tpu/ops/ptq.py).

TPU-native substitute for the reference's GPU-only low-precision linears
(``ever/module/dinov3/layers/fp8_linear.py:46-141``): W8A8 conv serving via
flax method interception — no model-code changes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn
from flax import traverse_util

from ever_tpu.ops import ptq


class _Tiny(nn.Module):
    padding: str = 'SAME'

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(32, (3, 3), padding=self.padding, use_bias=False,
                    name='c1')(x)
        x = nn.BatchNorm(use_running_average=True, name='bn')(x)
        x = nn.relu(x)
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding=self.padding,
                    name='c2')(x)
        x = nn.relu(x)
        x = nn.Conv(7, (1, 1), name='head')(x)
        return x


def _grid_kernel(rng, kh, kw, cin, cout):
    """Integer kernel whose per-output-channel absmax is exactly 127, so
    w_scale == 1 and the int8 grid represents it exactly."""
    k = rng.integers(-126, 127, (kh, kw, cin, cout)).astype(np.float32)
    k[0, 0, 0, :] = 127.0
    return k


class _OneConv(nn.Module):
    features: int = 8
    strides: tuple = (1, 1)
    groups: int = 1
    dilation: tuple = (1, 1)
    padding: str = 'SAME'

    @nn.compact
    def __call__(self, x, train=False):
        return nn.Conv(self.features, (3, 3), strides=self.strides,
                       padding=self.padding, kernel_dilation=self.dilation,
                       feature_group_count=self.groups, use_bias=False,
                       name='c')(x)


def _exact_case(strides=(1, 1), groups=1, dilation=(1, 1), padding='SAME'):
    rng = np.random.default_rng(0)
    cin, cout = 8, 8
    k = _grid_kernel(rng, 3, 3, cin // groups, cout)
    x = rng.integers(-126, 127, (2, 16, 16, cin)).astype(np.float32)
    x[0, 0, 0, 0] = 127.0  # absmax 127 -> x_scale == 1
    m = _OneConv(features=cout, strides=strides, groups=groups,
                 dilation=dilation, padding=padding)
    v = {'params': {'c': {'kernel': jnp.asarray(k)}}}
    qv = ptq.ptq_quantize(m, v, [jnp.asarray(x)],
                          apply_kwargs=dict(train=False))
    y_fp = m.apply(v, jnp.asarray(x), train=False)
    y_q = ptq.ptq_apply(m, qv, jnp.asarray(x), train=False)
    return np.asarray(y_fp), np.asarray(y_q)


@pytest.mark.parametrize('case', [
    dict(),
    dict(strides=(2, 2)),
    dict(groups=4),
    dict(dilation=(2, 2)),
    dict(padding='VALID'),
])
def test_int8_conv_exact_on_grid(case):
    """Values exactly representable on the int8 grid round-trip exactly —
    proves scales, padding/stride/group/dilation plumbing, and int32
    accumulation all match the fp conv."""
    y_fp, y_q = _exact_case(**case)
    np.testing.assert_array_equal(y_fp, y_q)


def test_calibration_running_max_across_batches():
    m = _Tiny()
    rng = np.random.default_rng(1)
    x_small = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    x_big = x_small * 10.0
    stats = ptq.calibrate_int8(m, m.init({'params': jax.random.key(0)},
                                         x_small),
                               [x_small, x_big, x_small],
                               apply_kwargs=dict(train=False))
    # the input-conv stat must reflect the big batch
    assert float(stats['c1']['absmax']) == pytest.approx(
        float(jnp.max(jnp.abs(x_big))), rel=1e-6)


def test_percentile_calibration_clips_outliers():
    """act_percentile replaces abs-max with a robust percentile: one huge
    outlier element in the calibration data must NOT set the activation
    scale, and on clean inputs the percentile-calibrated conv must be
    strictly more accurate than the abs-max one (whose outlier-inflated
    scale quantizes typical values into a couple of int8 bins)."""
    m = _OneConv()
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    x[0, 0, 0, 0] = 1e3  # single outlier in the calibration batch
    xj = jnp.asarray(x)
    v = m.init({'params': jax.random.key(0)}, xj)

    s_max = ptq.calibrate_int8(m, v, [xj], apply_kwargs=dict(train=False))
    s_pct = ptq.calibrate_int8(m, v, [xj], apply_kwargs=dict(train=False),
                               act_percentile=99.9)
    (_, a_max), = traverse_util.flatten_dict(s_max).items()
    (_, a_pct), = traverse_util.flatten_dict(s_pct).items()
    assert float(a_max) == pytest.approx(1e3, rel=1e-3)  # outlier dominates
    assert float(a_pct) < 10.0                           # percentile ignores it

    x_clean = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    y_fp = np.asarray(m.apply(v, x_clean, train=False), np.float32)
    errs = {}
    for name, pct in (('absmax', None), ('pct', 99.9)):
        qv = ptq.ptq_quantize(m, v, [xj], apply_kwargs=dict(train=False),
                              act_percentile=pct)
        y_q = np.asarray(ptq.ptq_apply(m, qv, x_clean, train=False),
                         np.float32)
        errs[name] = float(np.max(np.abs(y_q - y_fp))
                           / (np.max(np.abs(y_fp)) + 1e-9))
    assert errs['pct'] < 0.1
    assert errs['pct'] < errs['absmax'] / 5


def test_filters_exclude_paths_and_small_convs():
    m = _Tiny()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    v = m.init({'params': jax.random.key(0)}, x)
    stats = ptq.calibrate_int8(m, v, [x], apply_kwargs=dict(train=False))

    qv = ptq.quantize_convs(v, stats, except_re=r'\bhead\b')
    assert 'head' not in qv['ptq'] and 'c1' in qv['ptq']

    # head is a 1x1x16 conv: receptive volume 16 < 64
    qv2 = ptq.quantize_convs(v, stats, min_in_features=64)
    assert 'head' not in qv2['ptq'] and 'c1' in qv2['ptq']

    # excluded convs run the fp path; the rest still quantize
    y = ptq.ptq_apply(m, qv, x, train=False)
    assert y.shape == (2, 8, 8, 7)


def test_uncovered_conv_falls_back_to_fp():
    """CIRCULAR padding is outside the int8 fast path: serving must produce
    the exact fp result even though calibration recorded the conv."""
    m = _OneConv(padding='CIRCULAR')
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    v = m.init({'params': jax.random.key(0)}, x)
    qv = ptq.ptq_quantize(m, v, [x], apply_kwargs=dict(train=False))
    np.testing.assert_array_equal(
        np.asarray(m.apply(v, x, train=False)),
        np.asarray(ptq.ptq_apply(m, qv, x, train=False)))


def test_quantized_model_close_and_jittable():
    m = _Tiny()
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 8)).astype(np.float32))
    v = m.init({'params': jax.random.key(0)}, x)
    qv = ptq.ptq_quantize(m, v, [x], apply_kwargs=dict(train=False))
    y_fp = m.apply(v, x, train=False)
    y_q = jax.jit(ptq.make_ptq_predict_fn(m, qv, train=False))(x)
    rel = float(jnp.max(jnp.abs(y_fp - y_q)) / jnp.std(y_fp))
    assert rel < 0.2, rel


def test_dense_int8_exact_on_grid():
    """nn.Dense PTQ (ViT linears): grid-representable values exact."""
    rng = np.random.default_rng(7)
    k = rng.integers(-126, 127, (16, 8)).astype(np.float32)
    k[0, :] = 127.0
    x = rng.integers(-126, 127, (4, 16)).astype(np.float32)
    x[0, 0] = 127.0

    class D(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(8, use_bias=False, name='d')(x)

    m = D()
    v = {'params': {'d': {'kernel': jnp.asarray(k)}}}
    qv = ptq.ptq_quantize(m, v, [jnp.asarray(x)],
                          apply_kwargs=dict(train=False))
    np.testing.assert_array_equal(
        np.asarray(m.apply(v, jnp.asarray(x), train=False)),
        np.asarray(ptq.ptq_apply(m, qv, jnp.asarray(x), train=False)))


def test_vit_dense_quantization():
    """DINOv3 ViT serving: the attention/MLP linears quantize and the
    dense-feature output stays strongly correlated."""
    from ever_tpu.core import builder
    vit = builder.make_model({'type': 'vit_small', 'params': {}})
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    v = vit.init({'params': jax.random.key(0)}, x)
    qv = ptq.ptq_quantize(vit, v, [x], apply_kwargs={}, min_in_features=64)
    n_q = len(jax.tree_util.tree_leaves(qv['ptq'])) // 3
    assert n_q >= 40, n_q  # 12 blocks x (qkv, proj, fc1, fc2) + embeds
    y_fp = vit.apply(v, x)['x_norm_patchtokens']
    y_q = ptq.ptq_apply(vit, qv, x)['x_norm_patchtokens']
    a = np.asarray(y_fp).ravel() - float(np.asarray(y_fp).mean())
    b = np.asarray(y_q).ravel() - float(np.asarray(y_q).mean())
    cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.99, cos


def test_export_model_int8(tmp_path):
    """jax.export of the int8-PTQ serving graph: quantized weights + int8
    convs bake into the artifact and round-trip through deserialize."""
    import ever_tpu as er
    from ever_tpu.core import builder
    from ever_tpu.core.launcher import Launcher

    model = builder.make_model({'type': 'FarSeg', 'params': dict(
        encoder=dict(resnet_type='resnet18'),
        head=dict(fpn=dict(in_channels_list=(64, 128, 256, 512),
                           out_channels=16),
                  fs_relation=dict(scene_embedding_channels=512,
                                   in_channels_list=(16,) * 4,
                                   out_channels=16, scale_aware_proj=True),
                  fpn_decoder=dict(in_channels=16, out_channels=16,
                                   in_feat_output_strides=(4, 8, 16, 32),
                                   out_feat_output_stride=4)),
        classes=3)})
    factory, _ = builder.make_optimizer({'type': 'sgd', 'params': dict()})
    tl = Launcher(str(tmp_path), model, factory.build(0.01), None)
    x = np.zeros((1, 32, 32, 3), np.float32)
    tl.init_state((x, np.zeros((1, 32, 32), np.int32)))
    tl.checkpoint.set_global_step(1)
    tl.checkpoint.save()

    cfg_path = tmp_path / 'config.py'
    cfg_path.write_text(
        'config = dict(model=dict(type="FarSeg", params='
        + repr(model.config.to_dict()) + '))\n')
    out_path = tmp_path / 'model_int8.jaxexport'
    rng = np.random.default_rng(11)
    calib = [jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))]
    er.infer_tool.export_model(str(cfg_path),
                               str(tmp_path / 'checkpoint-1.ckpt'),
                               (1, 32, 32, 3), str(out_path),
                               ptq_calib=calib)
    from jax import export as jax_export
    with open(out_path, 'rb') as f:
        exported = jax_export.deserialize(f.read())
    probs = exported.call(calib[0])
    assert probs.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(probs)))


def test_farseg_ptq_through_tiled_inference():
    """End-to-end: quantize a FarSeg-R18 and run whole-scene tiled inference
    with the quantized predict fn — output close to the fp scene pass."""
    from ever_tpu.core import builder
    from ever_tpu.magic.tiled import tiled_inference

    model = builder.make_model({'type': 'FarSeg', 'params': dict(
        encoder=dict(resnet_type='resnet18'), classes=5,
        dtype='float32')})
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init({'params': jax.random.key(0)}, x)

    qv = ptq.ptq_quantize(model, variables, [x],
                          apply_kwargs=dict(train=False),
                          min_in_features=64)
    fp_fn = lambda t: model.apply(variables, t, train=False)  # noqa: E731
    q_fn = ptq.make_ptq_predict_fn(model, qv, train=False)

    scene = jnp.asarray(rng.normal(size=(96, 96, 3)).astype(np.float32))
    p_fp = tiled_inference(fp_fn, scene, 64, 32, 5, tile_batch=2)
    p_q = tiled_inference(q_fn, scene, 64, 32, 5, tile_batch=2)
    assert p_q.shape == (96, 96, 5)
    # random-init net: logits should stay strongly correlated
    a = np.asarray(p_fp).ravel() - np.asarray(p_fp).mean()
    b = np.asarray(p_q).ravel() - np.asarray(p_q).mean()
    cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.98, cos

    # the quantized predict fn composes with the mesh-sharded multi-chip
    # path (interceptors act at trace time, inside shard_map too)
    from ever_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(('data', 'model'), shape=(8, 1),
                     devices=jax.devices()[:8])
    p_q8 = tiled_inference(q_fn, scene, 64, 32, 5, tile_batch=2, mesh=mesh)
    np.testing.assert_allclose(np.asarray(p_q8), np.asarray(p_q),
                               rtol=2e-5, atol=2e-5)
