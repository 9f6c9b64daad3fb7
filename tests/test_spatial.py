"""Spatial sharding (halo exchange) on the 8-device CPU mesh."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ever_tpu.parallel.mesh import make_mesh
from ever_tpu.parallel.spatial import spatial_partition_apply


class _ConvStack(nn.Module):
    """3 conv layers → receptive field 7 → halo 8 is plenty."""

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = nn.Conv(8, (3, 3), padding='SAME', name=f'c{i}')(x)
            x = nn.relu(x)
        return nn.Conv(4, (1, 1), name='out')(x)


@pytest.mark.parametrize('halo', [4, 8])
def test_spatial_partition_exact_matches_unsharded_everywhere(halo):
    """boundary='exact' (overlap strips at the true border): equals the
    unsharded forward at EVERY row, including image borders."""
    mesh = make_mesh(('data',))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 128, 64, 3)).astype(np.float32))
    model = _ConvStack()
    v = model.init(jax.random.key(0), x)
    fn = lambda t: model.apply(v, t)

    full = np.asarray(fn(x))
    sharded = np.asarray(spatial_partition_apply(fn, x, mesh, axis='data',
                                                 halo=halo, boundary='exact'))
    np.testing.assert_allclose(sharded, full, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('halo', [8, 16])
def test_spatial_partition_zeros_matches_interior(halo):
    """boundary='zeros': exact away from the true border, bounded at it
    (zero halo vs nested conv padding — see module docstring)."""
    mesh = make_mesh(('data',))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 128, 64, 3)).astype(np.float32))
    model = _ConvStack()
    v = model.init(jax.random.key(0), x)
    fn = lambda t: model.apply(v, t)

    full = np.asarray(fn(x))
    sharded = np.asarray(spatial_partition_apply(fn, x, mesh, axis='data',
                                                 halo=halo, boundary='zeros'))
    rf_half = 3   # three 3x3 convs
    # every strip boundary in the interior is bit-exact
    np.testing.assert_allclose(sharded[:, rf_half:-rf_half],
                               full[:, rf_half:-rf_half], rtol=1e-5, atol=1e-5)
    # border rows stay bounded (zero-halo vs conv-padding difference)
    assert np.abs(sharded - full).max() < 1.0


def test_spatial_partition_exact_rejects_oversized_halo():
    mesh = make_mesh(('data',))
    x = jnp.ones((1, 64, 32, 3))   # h_local = 8 on the 8-device mesh
    with pytest.raises(ValueError):
        spatial_partition_apply(lambda t: t, x, mesh, halo=8, boundary='exact')


def test_spatial_partition_rejects_bad_shape():
    mesh = make_mesh(('data',))
    x = jnp.ones((1, 100, 64, 3))   # 100 not divisible by 8
    with pytest.raises(ValueError):
        spatial_partition_apply(lambda t: t, x, mesh, halo=4)


def test_spatial_partition_exact_single_device_mesh():
    """boundary='exact' on a k=1 mesh must equal the plain forward — the ring
    ppermute otherwise wraps the strip's own rows in as its halo."""
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:1]), ('data',))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 32, 16, 3)).astype(np.float32))
    model = _ConvStack()
    v = model.init(jax.random.key(0), x)
    fn = lambda t: model.apply(v, t)
    full = np.asarray(fn(x))
    got = np.asarray(spatial_partition_apply(fn, x, mesh, axis='data',
                                             halo=4, boundary='exact'))
    np.testing.assert_allclose(got, full, rtol=1e-5, atol=1e-5)


def test_spatial_partition_zeros_halo0_pointwise():
    """halo=0 with boundary='zeros' (legitimate for pointwise fns) must run
    fn unpadded — y[:, 0:-0] used to return an empty slice."""
    mesh = make_mesh(('data',))
    x = jnp.arange(8 * 16 * 4 * 3, dtype=jnp.float32).reshape(1, 8 * 16, 4, 3)
    got = np.asarray(spatial_partition_apply(lambda t: t * 2.0, x, mesh,
                                             halo=0, boundary='zeros'))
    np.testing.assert_allclose(got, np.asarray(x) * 2.0)


def test_spatial_partition_exact_halo0_pointwise():
    """halo=0 under the default boundary='exact' must run fn unpadded (the
    exact halo exchange used to slice x[:, -0:] and crash on shape mismatch)."""
    mesh = make_mesh(('data',))
    x = jnp.arange(8 * 16 * 4 * 3, dtype=jnp.float32).reshape(1, 8 * 16, 4, 3)
    got = np.asarray(spatial_partition_apply(lambda t: t * 2.0, x, mesh,
                                             halo=0, boundary='exact'))
    np.testing.assert_allclose(got, np.asarray(x) * 2.0)


def test_spatial_partition_oversized_halo_actionable_error():
    """halo > H/k must raise an actionable ValueError, not an internal XLA
    sharding assertion."""
    import pytest
    mesh = make_mesh(('data',))
    x = jnp.ones((1, 64, 16, 3), jnp.float32)
    with pytest.raises(ValueError, match='halo'):
        spatial_partition_apply(lambda t: t, x, mesh, halo=16,
                                boundary='zeros')
