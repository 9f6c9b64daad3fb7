"""Pallas kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ever_tpu.ops.attention import attention
from ever_tpu.ops.quant import QuantDense, int8_matmul, quantize_int8


def test_attention_xla_matches_reference():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 16, 4, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 16, 4, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 16, 4, 8)).astype(np.float32))
    out = attention(q, k, v, impl='xla')
    # manual reference
    scores = jnp.einsum('bqhd,bkhd->bhqk', q, k) / np.sqrt(8)
    ref = jnp.einsum('bhqk,bkhd->bqhd', jax.nn.softmax(scores, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def _sdpa_ref(q, k, v):
    d = q.shape[-1]
    scores = jnp.einsum('bqhd,bkhd->bhqk', q, k) / np.sqrt(d)
    return jnp.einsum('bhqk,bkhd->bqhd', jax.nn.softmax(scores, -1), v)


@pytest.mark.parametrize('n', [128, 133, 300, 700])
def test_fused_attention_forward_matches_reference(n):
    # 128: no padding; 133/300: pad-column masking; 700: S=768 → bq=384,
    # two q-blocks (exercises the dk/dv grid accumulation in backward too)
    from ever_tpu.ops.attention import _fused
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(2, n, 4, 32)).astype(np.float32))
               for _ in range(3))
    out = _fused(q, k, v, interpret=True)
    assert out.shape == q.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(_sdpa_ref(q, k, v)),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('n', [133, 700])
def test_fused_attention_grads_match_reference(n):
    from ever_tpu.ops.attention import _fused
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=(2, n, 4, 32)).astype(np.float32))
               for _ in range(3))
    w = jnp.asarray(rng.normal(size=(2, n, 4, 32)).astype(np.float32))

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) * w)

    got = jax.grad(loss(lambda *a: _fused(*a, interpret=True)),
                   argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(loss(_sdpa_ref), argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, ref, 'qkv'):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-4,
                                   atol=2e-4, err_msg=f'd{name}')


def test_fused_attention_auto_pad_unit_numerics(monkeypatch):
    """EVER_ATTN_PAD_UNIT=auto pads to the 8-aligned target (1029 → 1032,
    q-block 344) instead of the 128 multiple; fwd+grads must still match
    the dense reference on the valid rows."""
    import importlib
    A = importlib.import_module('ever_tpu.ops.attention')
    monkeypatch.setenv('EVER_ATTN_PAD_UNIT', 'auto')
    assert A.pad_target(1029) == 1032
    rng = np.random.default_rng(5)
    n = 1029
    q, k, v = (jnp.asarray(rng.normal(size=(1, n, 2, 32)).astype(np.float32))
               for _ in range(3))
    w = jnp.asarray(rng.normal(size=(1, n, 2, 32)).astype(np.float32))
    out = A._fused(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_sdpa_ref(q, k, v)),
                               rtol=1e-4, atol=1e-5)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) * w)

    got = jax.grad(loss(lambda *a: A._fused(*a, interpret=True)),
                   argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(loss(_sdpa_ref), argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, ref, 'qkv'):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-4,
                                   atol=2e-4, err_msg=f'd{name}')


def test_fused_attention_in_kernel_rope_matches_reference():
    """rope=(sin, cos) handed to the fused kernel (in-VMEM rotation via the
    sign-folded lane roll) must match rotate-then-SDPA, fwd AND grads —
    incl. the inverse rotation applied to dq and the dk accumulator."""
    from ever_tpu.ops.attention import _fused
    rng = np.random.default_rng(9)
    n, h, d = 300, 2, 32
    q, k, v = (jnp.asarray(rng.normal(size=(2, n, h, d)).astype(np.float32))
               for _ in range(3))
    # REAL RoPE tables are half-tiled (angles tiled (1,2)); the kernel's
    # transpose-as-inverse gradient identity relies on that structure
    ang = rng.normal(size=(n, d // 2)).astype(np.float32)
    sin = jnp.asarray(np.sin(np.tile(ang, (1, 2))))
    cos = jnp.asarray(np.cos(np.tile(ang, (1, 2))))
    sin = sin.at[:5].set(0.0)          # identity prefix rows
    cos = cos.at[:5].set(1.0)
    w = jnp.asarray(rng.normal(size=(2, n, h, d)).astype(np.float32))

    def rot(x):
        s4, c4 = sin[None, :, None, :], cos[None, :, None, :]
        x1, x2 = jnp.split(x, 2, axis=-1)
        return x * c4 + jnp.concatenate([-x2, x1], -1) * s4

    def ref(q, k, v):
        return _sdpa_ref(rot(q), rot(k), v)

    def fused(q, k, v):
        return _fused(q, k, v, interpret=True, rope=(sin, cos))

    np.testing.assert_allclose(np.asarray(fused(q, k, v)),
                               np.asarray(ref(q, k, v)),
                               rtol=1e-4, atol=1e-5)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) * w)

    got = jax.grad(loss(fused), argnums=(0, 1, 2))(q, k, v)
    exp = jax.grad(loss(ref), argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, exp, 'qkv'):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-4,
                                   atol=2e-4, err_msg=f'd{name}')


def test_attention_rope_arg_consistent_across_impls():
    """ops.attention(rope=...) must produce the same output whether the
    rotation runs in-kernel (fused) or as the XLA pre-pass."""
    from ever_tpu.ops.attention import attention
    rng = np.random.default_rng(10)
    n, h, d = 280, 2, 32
    q, k, v = (jnp.asarray(rng.normal(size=(1, n, h, d)).astype(np.float32))
               for _ in range(3))
    ang = rng.normal(size=(n, d // 2)).astype(np.float32)
    sin = jnp.asarray(np.sin(np.tile(ang, (1, 2))))
    cos = jnp.asarray(np.cos(np.tile(ang, (1, 2))))
    a = attention(q, k, v, impl='fused', rope=(sin, cos))
    b = attention(q, k, v, impl='xla', rope=(sin, cos))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


def test_fused_attention_bf16_dtype_and_finite():
    from ever_tpu.ops.attention import _fused
    rng = np.random.default_rng(2)
    q, k, v = (jnp.asarray(rng.normal(size=(1, 261, 2, 32))).astype(jnp.bfloat16)
               for _ in range(3))
    out = _fused(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _sdpa_ref(q.astype(jnp.float32), k.astype(jnp.float32),
                    v.astype(jnp.float32))
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=0.1, atol=0.05)


def test_quantize_int8_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    values, scale = quantize_int8(x, seed=3)
    assert values.dtype == jnp.int8
    recon = np.asarray(values, np.float32) * float(scale[0, 0])
    # stochastic rounding: error bounded by one quantization step
    step = float(scale[0, 0])
    assert np.abs(recon - np.asarray(x)).max() <= step + 1e-6


def test_int8_matmul_close_to_fp32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    x_q, xs = quantize_int8(x, 1)
    w_q, ws = quantize_int8(w, 2)
    y = int8_matmul(x_q, xs, w_q, ws)
    ref = np.asarray(x) @ np.asarray(w)
    rel_err = np.abs(np.asarray(y) - ref).mean() / np.abs(ref).mean()
    assert rel_err < 0.05  # int8 per-tensor quantization noise


def test_quant_dense_from_params():
    rng = np.random.default_rng(2)
    params = dict(kernel=rng.normal(size=(64, 32)).astype(np.float32),
                  bias=rng.normal(size=(32,)).astype(np.float32))
    qd = QuantDense.from_params(params)
    x = jnp.asarray(rng.normal(size=(4, 8, 64)).astype(np.float32))
    y = np.asarray(qd(x))
    ref = np.asarray(x) @ params['kernel'] + params['bias']
    assert y.shape == (4, 8, 32)
    rel_err = np.abs(y - ref).mean() / np.abs(ref).mean()
    assert rel_err < 0.08


def test_integer_nearest_upsample_fast_path_matches_jax_image():
    """The broadcast-reshape nearest k-x upsampler is an exact replacement
    for jax.image.resize's gather (whose backward is a slow scatter-add)."""
    import jax
    import jax.numpy as jnp
    from ever_tpu.module.ops import resize

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 6, 5)).astype(np.float32))
    for k in (2, 3, 4):
        ref_n = jax.image.resize(x, (2, 8 * k, 6 * k, 5), method='nearest')
        got_n = resize(x, scale=k, method='nearest')
        np.testing.assert_array_equal(np.asarray(got_n), np.asarray(ref_n))
    # bilinear upsampling (einsum path) matches jax.image.resize weights
    got = resize(x, shape=(12, 9), method='bilinear')
    ref = jax.image.resize(x, (2, 12, 9, 5), method='bilinear')
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_max_pool_custom_vjp_matches_reduce_window():
    """values exactly equal nn.max_pool; grads equal wherever maxes are
    unique (random floats -> unique a.e.)."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from ever_tpu.module.ops import max_pool

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 12, 5)).astype(np.float32))

    ref_fn = lambda a: nn.max_pool(a, (3, 3), (2, 2), ((1, 1), (1, 1)))
    out = max_pool(x, 3, 2, ((1, 1), (1, 1)), impl='planes')
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_fn(x)))

    w = jnp.asarray(rng.normal(size=out.shape).astype(np.float32))
    g_ref = jax.grad(lambda a: jnp.sum(ref_fn(a) * w))(x)
    g_got = jax.grad(
        lambda a: jnp.sum(max_pool(a, 3, 2, ((1, 1), (1, 1)), impl='planes') * w))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)

    # default impl and odd sizes use nn.max_pool
    x2 = jnp.asarray(rng.normal(size=(1, 15, 15, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(max_pool(x2, 3, 2, 'SAME')),
        np.asarray(nn.max_pool(x2, (3, 3), (2, 2), 'SAME')))


@pytest.mark.parametrize('shape', [(2, 64, 48, 5), (1, 30, 22, 3)])
def test_max_pool_pallas_impl_matches_reduce_window(shape):
    """impl='pallas' (one-pass Pallas backward, interpret mode on CPU)
    matches the select_and_scatter gradient for untied inputs."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from ever_tpu.module.ops import max_pool

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    ref_fn = lambda a: nn.max_pool(a, (3, 3), (2, 2), ((1, 1), (1, 1)))
    out = max_pool(x, 3, 2, ((1, 1), (1, 1)), impl='pallas')
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_fn(x)))
    w = jnp.asarray(rng.normal(size=out.shape).astype(np.float32))
    g_ref = jax.grad(lambda a: jnp.sum(ref_fn(a) * w))(x)
    g_got = jax.grad(
        lambda a: jnp.sum(max_pool(a, 3, 2, ((1, 1), (1, 1)), impl='pallas') * w))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize('padding', [((1, 1), (1, 1)), 'SAME'])
def test_max_pool_separable_matches_reduce_window(padding):
    """impl='separable' (two 1-D pools; two cheap 1-D select_and_scatter
    backwards) equals the 2-D pool in value and, for untied inputs, grad."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from ever_tpu.module.ops import max_pool

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 12, 5)).astype(np.float32))
    ref_fn = lambda a: nn.max_pool(a, (3, 3), (2, 2), padding)
    out = max_pool(x, 3, 2, padding, impl='separable')
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_fn(x)))
    w = jnp.asarray(rng.normal(size=np.asarray(out).shape).astype(np.float32))
    g_ref = jax.grad(lambda a: jnp.sum(ref_fn(a) * w))(x)
    g_got = jax.grad(
        lambda a: jnp.sum(max_pool(a, 3, 2, padding, impl='separable') * w))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_flash_block_picker():
    from ever_tpu.ops.attention import _pick_block
    # exact power-of-two lengths take the largest block <= cap
    assert _pick_block(16384, 1024) == 1024
    assert _pick_block(1024, 1024) == 1024
    # padded targets that are odd multiples of 512 fall back to 512
    assert _pick_block(4608, 1024) == 512
    assert _pick_block(16896, 1024) == 512
    # non-multiples of every pow2 block land on the 128 floor
    assert _pick_block(1152, 1024) == 128
    for n in (384, 1536, 4608, 16896):
        b = _pick_block(n, 1024)
        assert n % b == 0


def test_resize_align_corners_out_size_one_matches_torch():
    """align_corners=True collapsing a dim to 1 must sample index 0 (torch
    semantics: scale=0 when out==1), not average the whole axis."""
    import torch
    import torch.nn.functional as F
    from ever_tpu.module.ops import resize
    x = np.random.RandomState(0).rand(1, 5, 7, 2).astype(np.float32)
    got = np.asarray(resize(jnp.asarray(x), shape=(1, 3), method='bilinear',
                            align_corners=True))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(1, 3),
                        mode='bilinear', align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_int8_matmul_tiled_grid_matches_reference():
    """The (M, N)-tiled int8 matmul (incl. zero-padded indivisible shapes)
    must equal the plain int32 contraction."""
    from ever_tpu.ops.quant import int8_matmul
    rng = np.random.RandomState(0)
    for m, k, n in ((300, 128, 130), (64, 256, 64), (512, 128, 512)):
        x_q = rng.randint(-128, 128, (m, k)).astype(np.int8)
        w_q = rng.randint(-128, 128, (k, n)).astype(np.int8)
        xs = np.full((1, 1), 0.02, np.float32)
        ws = np.full((1, 1), 0.01, np.float32)
        got = np.asarray(int8_matmul(jnp.asarray(x_q), jnp.asarray(xs),
                                     jnp.asarray(w_q), jnp.asarray(ws),
                                     block_m=128, block_n=128))
        want = (x_q.astype(np.int32) @ w_q.astype(np.int32)
                ).astype(np.float32) * 0.0002
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_ops_package_exports_attention_function():
    from ever_tpu import ops
    assert callable(ops.attention)
    assert ops.attention_fn is ops.attention


def test_fused_attention_n_valid_prepadded_matches_internal_pad():
    # stack-level padding: caller pre-pads N→S and passes n_valid; result
    # on the real rows must equal the kernel padding internally itself
    from ever_tpu.ops.attention import _fused
    rng = np.random.default_rng(3)
    n, s = 300, 384
    q, k, v = (jnp.asarray(rng.normal(size=(2, n, 4, 32)).astype(np.float32))
               for _ in range(3))
    ref = _fused(q, k, v, interpret=True)

    pad = ((0, 0), (0, s - n), (0, 0), (0, 0))
    # garbage (not zero) pad rows: the mask, not the pad values, must
    # protect the real rows
    qp, kp, vp = (jnp.pad(t, pad, constant_values=7.5) for t in (q, k, v))
    out = _fused(qp, kp, vp, interpret=True, n_valid=n)
    assert out.shape == qp.shape
    np.testing.assert_allclose(np.asarray(out[:, :n]), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_attention_xla_n_valid_masks_pad_keys():
    rng = np.random.default_rng(4)
    n, s = 13, 16
    q, k, v = (jnp.asarray(rng.normal(size=(2, n, 4, 8)).astype(np.float32))
               for _ in range(3))
    ref = attention(q, k, v, impl='xla')
    pad = ((0, 0), (0, s - n), (0, 0), (0, 0))
    qp, kp, vp = (jnp.pad(t, pad, constant_values=3.0) for t in (q, k, v))
    out = attention(qp, kp, vp, impl='xla', n_valid=n)
    np.testing.assert_allclose(np.asarray(out[:, :n]), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_attention_n_valid_grads_clean():
    # pad q-rows with zero upstream gradient must contribute nothing to
    # dk/dv of the real columns (the stack-padding safety property)
    from ever_tpu.ops.attention import _fused
    rng = np.random.default_rng(5)
    n, s = 300, 384
    q, k, v = (jnp.asarray(rng.normal(size=(1, n, 2, 32)).astype(np.float32))
               for _ in range(3))

    def loss_ref(q, k, v):
        return jnp.sum(_fused(q, k, v, interpret=True) ** 2)

    gq, gk, gv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    pad = ((0, 0), (0, s - n), (0, 0), (0, 0))
    qp, kp, vp = (jnp.pad(t, pad, constant_values=2.0) for t in (q, k, v))

    def loss_pad(qp, kp, vp):
        out = _fused(qp, kp, vp, interpret=True, n_valid=n)
        return jnp.sum(out[:, :n] ** 2)   # head discards pad rows

    gqp, gkp, gvp = jax.grad(loss_pad, argnums=(0, 1, 2))(qp, kp, vp)
    for g, gp in ((gq, gqp), (gk, gkp), (gv, gvp)):
        np.testing.assert_allclose(np.asarray(gp[:, :n]), np.asarray(g),
                                   rtol=2e-4, atol=2e-5)
