"""Functional tests for reference-spelling compat surface.

Each name here exists so code written against Z-Zheng/ever ports with an
``ever → ever_tpu`` rename: module spellings (``ever/module/ops.py:114-190``,
``misc.py:8-24``, ``fpn.py:18-36,227-244``), tensor-pipeline transforms
(``preprocess/thcomm.py``/``thsegm.py``), host collectives
(``core/dist.py:63-140``) and assorted helpers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_ops_module_spellings():
    from ever_tpu.module import (Bf16compatible, ChannelConcat,
                                 ChannelReduction, ListIndex, Squeeze, Sum)
    feats = [jnp.ones((1, 4, 4, 3)), 2 * jnp.ones((1, 4, 4, 5))]
    cat = ChannelConcat()(feats)
    assert cat.shape == (1, 4, 4, 8)
    s = Sum()([jnp.ones((1, 2, 2, 3)), jnp.ones((1, 2, 2, 3))])
    assert float(s[0, 0, 0, 0]) == 2.0
    assert ListIndex(index=(1,))(feats).shape == (1, 4, 4, 5)
    a, b = ListIndex(index=(1, 0))(feats)
    assert a.shape == (1, 4, 4, 5) and b.shape == (1, 4, 4, 3)
    assert Squeeze(dim=0)(jnp.ones((1, 4, 4, 3))).shape == (4, 4, 3)

    red = ChannelReduction(out_channels=4)
    v = red.init(jax.random.PRNGKey(0), feats)
    out = red.apply(v, feats)
    assert [o.shape for o in out] == [(1, 4, 4, 4), (1, 4, 4, 4)]

    import flax.linen as nn

    class F32Probe(nn.Module):
        def __call__(self, x):
            assert x.dtype == jnp.float32
            return x * 2
    y = Bf16compatible(F32Probe())(jnp.ones((2, 2), jnp.bfloat16))
    assert y.dtype == jnp.bfloat16


def test_pad_crop_wrapper_matches_functional():
    import flax.linen as nn
    from ever_tpu.module import PadCropWrapper

    class Avg3(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.avg_pool(x, (2, 2), strides=(1, 1), padding='SAME')

    m = PadCropWrapper(Avg3(), size_divisor=32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 37, 45, 3)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == x.shape


def test_fusion_conv_spellings():
    from ever_tpu.module import (FastNormalizedFusionConv3x3,
                                 NormalizedFusionConv3x3)
    feats = [jnp.ones((1, 8, 8, 16)), jnp.ones((1, 8, 8, 16))]
    for cls in (FastNormalizedFusionConv3x3, NormalizedFusionConv3x3):
        m = cls(num_inputs=2, out_channels=8)
        v = m.init(jax.random.PRNGKey(0), feats)
        out = m.apply(v, feats)
        assert out.shape == (1, 8, 8, 8)


def test_thcomm_pipeline():
    from ever_tpu.preprocess import thcomm
    img = jnp.asarray(np.random.randint(0, 255, (30, 40, 3)), jnp.float32)
    mask = jnp.asarray(np.random.randint(0, 7, (30, 40)))
    pipe = thcomm.Pipeline([thcomm.THDivisiblePad(32),
                            thcomm.THMeanStdNormalize2()])
    pi, pm = pipe(img, mask)
    assert pi.shape == (32, 64, 3) and pm.shape == (32, 64)
    assert int(pm[31, 10]) == 255  # mask pad = ignore_index
    cf = thcomm.THChannelFirst()
    assert cf(jnp.zeros((3, 30, 40))).shape == (30, 40, 3)   # CHW in → HWC
    assert cf(jnp.zeros((30, 40, 3))).shape == (30, 40, 3)   # HWC stays


def test_thsegm_transforms():
    from ever_tpu.preprocess import thsegm
    img = jnp.asarray(np.random.default_rng(0).normal(size=(30, 40, 3)),
                      jnp.float32)
    mask = jnp.asarray(np.random.default_rng(1).integers(0, 7, (30, 40)))
    ri, rm = thsegm.THRandomRotate90k(k=1)(img, mask)
    assert ri.shape == (40, 30, 3) and rm.shape == (40, 30)
    np.testing.assert_allclose(np.asarray(ri), np.rot90(np.asarray(img), 1, (0, 1)))
    ci, cm = thsegm.THRandomCrop((16, 16))(img, mask)
    assert ci.shape == (16, 16, 3) and cm.shape == (16, 16)
    fi, fm = thsegm.THRandomVerticalFlip(p=2.0)(img, mask)  # p>1 → always flips
    np.testing.assert_allclose(np.asarray(fi), np.asarray(img)[::-1])
    hi, hm = thsegm.THRandomHorizontalFlip(p=2.0)(img, mask)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(img)[:, ::-1])
    np.random.seed(3)
    si, sm = thsegm.THRandomScale((0.5, 0.5), 0.25)(img, mask)
    assert si.shape == (15, 20, 3) and sm.shape == (15, 20)
    assert sm.dtype == mask.dtype


def test_loss_spellings():
    from ever_tpu.module.loss import all_reduce_sum, dice_coeff, select
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, 3)),
                         jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).integers(0, 3, (2, 4, 4)))
    y = y.at[0, 0, 0].set(255)
    yp, yt, valid = select(logits, y)
    assert yp.shape == (32, 3) and yt.shape == (32,) and valid.shape == (32,)
    assert float(valid.sum()) == 31.0
    assert float(all_reduce_sum(jnp.asarray(3.0))) == 3.0
    prob = jax.nn.softmax(yp, -1)
    onehot = jax.nn.one_hot(jnp.clip(yt, 0, 2), 3)
    d = dice_coeff(prob, onehot, valid)
    assert 0.0 < float(d) <= 1.0


def test_dist_host_collectives_single_process():
    from ever_tpu.core.dist import all_gather, gather, reduce_loss_dict
    assert all_gather({'a': 1}) == [{'a': 1}]
    assert gather({'a': 1}) == [{'a': 1}]
    d = {'loss': 1.5}
    assert reduce_loss_dict(d) == d


def test_misc_helpers():
    from ever_tpu.core.launcher import average_dict, scale_dict
    d = scale_dict({'a': jnp.asarray(2.0)}, 0.5)
    assert float(d['a']) == 1.0
    d2 = average_dict({'a': jnp.ones((3,)), 'b': jnp.asarray(2.0)})
    assert float(d2['a']) == 1.0 and float(d2['b']) == 2.0

    from ever_tpu.core.config import AttrDict, from_pickle, save_pkl
    import tempfile, os
    cfg = AttrDict(x=1)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, 'c.pkl')
        save_pkl(cfg, p)
        assert from_pickle(p).x == 1

    from ever_tpu.core.checkpoint import remove_module_prefix
    assert remove_module_prefix({'module.a': 1, 'b': 2}) == {'a': 1, 'b': 2}

    from ever_tpu.metric.function import (
        intersection_over_union_per_class, th_mean_intersection_over_union)
    cm = jnp.asarray([[5, 1], [2, 8]], jnp.float32)
    iou = intersection_over_union_per_class(cm)
    assert iou.shape == (2,)
    assert 0 < float(th_mean_intersection_over_union(cm)) < 1

    from ever_tpu.metric.pixel import AccTable, prettytable_to_dataframe
    t = AccTable(['class', 'iou'])
    t.add_row(['water', 0.7])
    df = prettytable_to_dataframe(t)
    assert list(df.columns) == ['class', 'iou'] and len(df) == 1

    from ever_tpu.core.logger import eval_progress, eval_start, speed, get_logger
    lg = get_logger()
    eval_start(lg); eval_progress(lg, 1, 2); speed(lg, 0.01)

    from ever_tpu.opt.learning_rate import set_lr
    import optax
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=0.1)
    st = tx.init({'w': jnp.zeros(3)})
    st = set_lr(st, 0.5)
    assert float(st.hyperparams['learning_rate']) == 0.5


def test_full_reference_symbol_surface():
    """EVERY public symbol in EVERY reference module imports from the same
    dotted path under ever_tpu (``ever.X.Y:name`` → ``ever_tpu.X.Y:name``) —
    the whole-package guarantee behind docs/MIGRATING.md."""
    import ast
    import importlib
    import os

    ref = '/root/reference/ever'
    if not os.path.isdir(ref):
        pytest.skip('reference repo not available')

    failures = []
    for root, dirs, files in os.walk(ref):
        dirs[:] = [d for d in dirs if d != '__pycache__']
        for f in files:
            if not f.endswith('.py'):
                continue
            rel = os.path.relpath(os.path.join(root, f), ref)
            mod = rel[:-3].replace(os.sep, '.')
            if mod.endswith('.__init__'):
                mod = mod[: -len('.__init__')]
            tree = ast.parse(open(os.path.join(root, f)).read())
            names = [n.name for n in tree.body
                     if isinstance(n, (ast.FunctionDef, ast.ClassDef))
                     and not n.name.startswith('_')]
            if not names:
                continue
            ours = 'ever_tpu' + ('.' + mod if mod else '')
            try:
                m = importlib.import_module(ours)
            except Exception as e:
                failures.append(f'{ours}: import failed ({e})')
                continue
            for n in names:
                if not hasattr(m, n):
                    failures.append(f'{ours}.{n}')
    assert not failures, 'missing reference symbols:\n' + '\n'.join(failures)


def test_thchannelfirst_hyperspectral_passthrough():
    """>8-band HWC stacks must NOT be scrambled: transpose applies only to
    inputs the reference heuristic classifies as CHW (shape[0] <= 8)."""
    from ever_tpu.preprocess import thcomm
    cf = thcomm.THChannelFirst()
    assert cf(jnp.zeros((64, 48, 16))).shape == (64, 48, 16)  # 16-band HWC stays
    assert cf(cf(jnp.zeros((64, 48, 16)))).shape == (64, 48, 16)  # idempotent
    assert cf(jnp.zeros((3, 64, 48))).shape == (64, 48, 3)    # CHW → HWC


def test_auto_device_single_definition():
    """er.auto_device IS core.to.auto_device (one implementation, no drift)."""
    import ever_tpu as er
    from ever_tpu.core import to as core_to
    assert er.auto_device is core_to.auto_device
    assert er.auto_device().platform is not None


def test_tpu_device_device_kind_fallback(monkeypatch):
    """Tunneled plugins report platform 'axon' with device_kind 'TPU ...':
    tpu_device must find them when jax.devices('tpu') raises."""
    import jax
    from ever_tpu.core import to as core_to

    class _FakeDev:
        platform = 'axon'
        device_kind = 'TPU v5 lite'

    real_devices = jax.devices

    def fake_devices(backend=None):
        if backend == 'tpu':
            raise RuntimeError('Unknown backend tpu')
        if backend is None:
            return [_FakeDev()]
        return real_devices(backend)

    monkeypatch.setattr(jax, 'devices', fake_devices)
    assert isinstance(core_to.tpu_device(), _FakeDev)
    assert isinstance(core_to.gpu_device(), _FakeDev)


def test_import_respects_preconfigured_compile_cache():
    """import ever_tpu must not re-point a jax_compilation_cache_dir that was
    configured before import (e.g. a test suite's conftest cache)."""
    import subprocess, sys
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_compilation_cache_dir', '/tmp/user_cache_xyz')\n"
        "import ever_tpu\n"
        "assert jax.config.jax_compilation_cache_dir == '/tmp/user_cache_xyz', \\\n"
        "    jax.config.jax_compilation_cache_dir\n"
        "print('CACHE_KEPT')\n"
    )
    env = dict(__import__('os').environ)
    env.pop('EVER_COMPILE_CACHE', None)
    out = subprocess.run([sys.executable, '-c', code], capture_output=True,
                         text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'CACHE_KEPT' in out.stdout


def test_conv_with_kaiming_uniform_actually_inits_kaiming():
    """The factory's whole contract is the kaiming-uniform(a=1) kernel init
    (reference fpn.py:18-36) — verify the returned ConvBlock uses it."""
    import jax
    from ever_tpu.module.fpn import conv_with_kaiming_uniform
    from ever_tpu.module.ops import ConvBlock

    make = conv_with_kaiming_uniform(use_bn=False, use_relu=False)
    blk = make(32, 3)
    x = jnp.zeros((1, 8, 8, 16))
    w = blk.init(jax.random.key(0), x)['params']['Conv_0']['kernel']
    # variance_scaling(1, fan_in, uniform): support bound sqrt(3/fan_in)
    fan_in = 3 * 3 * 16
    bound = float(np.sqrt(3.0 / fan_in))
    w = np.asarray(w)
    assert np.abs(w).max() <= bound + 1e-6
    # lecun_normal (the ConvBlock default) is unbounded: same-seed default
    # init must differ
    w_def = ConvBlock(32, 3, norm=None, act=None).init(
        jax.random.key(0), x)['params']['Conv_0']['kernel']
    assert not np.allclose(w, np.asarray(w_def))
