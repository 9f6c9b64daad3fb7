"""Fused LayerNorm kernels (ops/norm.py) vs flax.linen.LayerNorm."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from ever_tpu.ops.norm import FusedLayerNorm, layer_norm


def _ref_apply(x, g, b, eps):
    ln = nn.LayerNorm(epsilon=eps)
    return ln.apply({'params': {'scale': g, 'bias': b}}, x)


@pytest.mark.parametrize('rows', [256, 515])  # exact block + padded tail
def test_layer_norm_forward_matches_flax(rows):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(rows, 256)).astype(np.float32)) * 3 + 1
    g = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    got = layer_norm(x, g, b, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_ref_apply(x, g, b, 1e-5)),
                               rtol=1e-5, atol=1e-5)


def test_layer_norm_grads_match_flax():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(515, 256)).astype(np.float32)) * 2 - 1
    g = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(515, 256)).astype(np.float32))

    def loss(fn):
        return lambda x, g, b: jnp.sum(fn(x, g, b) * w)

    got = jax.grad(loss(lambda x, g, b: layer_norm(x, g, b, 1e-5,
                                                   interpret=True)),
                   (0, 1, 2))(x, g, b)
    ref = jax.grad(loss(lambda x, g, b: _ref_apply(x, g, b, 1e-5)),
                   (0, 1, 2))(x, g, b)
    for a, r, name in zip(got, ref, ('dx', 'dgamma', 'dbeta')):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_layer_norm_3d_and_bf16():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 70, 128)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    g = jnp.ones((128,), jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    y = layer_norm(x, g, b, 1e-6, interpret=True)
    assert y.shape == x.shape and y.dtype == jnp.bfloat16
    ref = _ref_apply(x.astype(jnp.float32), g, b, 1e-6)
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_fused_module_param_compat_with_flax():
    """FusedLayerNorm params load from / into an nn.LayerNorm checkpoint
    and the CPU fallback path reproduces flax numerics exactly."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 33, 256)).astype(np.float32))
    flax_ln = nn.LayerNorm(epsilon=1e-5)
    v = flax_ln.init(jax.random.key(0), x)
    v['params']['scale'] = jnp.asarray(
        rng.normal(size=(256,)).astype(np.float32))
    v['params']['bias'] = jnp.asarray(
        rng.normal(size=(256,)).astype(np.float32))
    fused = FusedLayerNorm(epsilon=1e-5)
    got = fused.apply(v, x)          # CPU -> fallback math
    ref = flax_ln.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # shape/name compatibility both directions
    v2 = fused.init(jax.random.key(1), x)
    assert set(v2['params']) == set(v['params'])
    assert all(v2['params'][k].shape == v['params'][k].shape
               for k in v['params'])
