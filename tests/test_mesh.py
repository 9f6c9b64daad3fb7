"""Mesh helpers: hybrid (ICI x DCN) construction degrades on one slice."""

import jax
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
