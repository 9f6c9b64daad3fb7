"""Mesh helpers: hybrid (ICI x DCN) construction degrades on one slice."""

import jax
import numpy as np
import jax.numpy as jnp

from ever_tpu.parallel.mesh import batch_sharding, make_hybrid_mesh, make_mesh


def test_hybrid_mesh_single_slice_degrades():
    mesh = make_hybrid_mesh(('data',))
    assert mesh.axis_names == ('replica', 'data')
    assert mesh.shape['replica'] == 1
    assert mesh.shape['data'] == len(jax.devices())
    # a batch sharded over both axes spans all devices
    sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(('replica', 'data')))
    x = jax.device_put(jnp.zeros((len(jax.devices()) * 2, 3)), sh)
    assert len(x.addressable_shards) == len(jax.devices())


def test_hybrid_mesh_2d_ici():
    n = len(jax.devices())
    mesh = make_hybrid_mesh(('data', 'model'), ici_shape=(n // 2, 2))
    assert dict(mesh.shape) == {'replica': 1, 'data': n // 2, 'model': 2}


def test_host_to_global_indivisible_batch_clear_error():
    """An indivisible global batch must raise an actionable ValueError, not a
    deep device_put traceback (found driving the trainer as a downstream
    user with total_batch_size=4 on an 8-device mesh)."""
    import pytest
    from ever_tpu.parallel.mesh import batch_sharding, host_to_global, make_mesh
    mesh = make_mesh(('data',))
    sh = batch_sharding(mesh)
    with pytest.raises(ValueError, match='divisible'):
        host_to_global({'x': np.ones((4, 8, 8, 3), np.float32)}, sh)
    out = host_to_global({'x': np.ones((8, 4, 4, 3), np.float32)}, sh)
    assert out['x'].shape == (8, 4, 4, 3)


def test_host_to_global_accum_leading_divisibility_guard():
    """The indivisible-batch guard must fire for accum-leading specs too
    (P(None,'data') shards dim 1, which the old dim-0-only check skipped)."""
    import pytest
    import jax.numpy as jnp
    from ever_tpu.parallel.mesh import batch_sharding, host_to_global, make_mesh
    mesh = make_mesh(('data',))
    sh = batch_sharding(mesh, accum_leading=True)
    bad = np.zeros((2, 6, 4, 4, 3), np.float32)   # dim1=6 not divisible by 8
    with pytest.raises(ValueError, match='divisible'):
        host_to_global(bad, sh)
    ok = host_to_global(np.zeros((2, 8, 4, 4, 3), np.float32), sh)
    assert ok.shape == (2, 8, 4, 4, 3)
