"""ZeRO-1/3 sharded training state on the 8-device CPU mesh.

The reference replicates optimizer state per rank (SURVEY.md §2.9 — no
FSDP/ZeRO); here the sharded-state step must produce the SAME trajectory as
the replicated-state step, with optimizer-state leaves actually partitioned
over the ``data`` axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ever_tpu.module  # noqa: F401
from ever_tpu.core import builder
from ever_tpu.parallel.mesh import batch_sharding, host_to_global, make_mesh, replicated
from ever_tpu.parallel.spmd import build_train_step, create_train_state
from ever_tpu.parallel.zero import shard_leaf_sharding, zero_init, zero_shardings

P = jax.sharding.PartitionSpec


def _setup(mesh):
    model = builder.make_model({'type': 'FarSeg', 'params': dict(
        encoder=dict(resnet_type='resnet18'), classes=5,
        head=dict(fpn=dict(in_channels_list=(64, 128, 256, 512),
                           out_channels=64),
                  fs_relation=dict(scene_embedding_channels=512,
                                   in_channels_list=(64, 64, 64, 64),
                                   out_channels=64, scale_aware_proj=True),
                  fpn_decoder=dict(in_channels=64, out_channels=64,
                                   in_feat_output_strides=(4, 8, 16, 32),
                                   out_feat_output_stride=4)))})
    schedule = builder.make_learningrate(
        {'type': 'poly', 'params': dict(base_lr=0.01, power=0.9, max_iters=100)})
    factory, _ = builder.make_optimizer(
        {'type': 'sgd', 'params': dict(momentum=0.9)})
    tx = factory.build(schedule)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 5, size=(8, 32, 32)).astype(np.int32)
    state = create_train_state(model, tx, (x, y), rng=jax.random.key(0))
    data = host_to_global((jnp.asarray(x), jnp.asarray(y)),
                          batch_sharding(mesh))
    return model, tx, schedule, state, data


def test_shard_leaf_sharding_picks_divisible_dim():
    mesh = make_mesh(('data',))
    assert shard_leaf_sharding(np.zeros(()), mesh).spec == P()
    assert shard_leaf_sharding(np.zeros((3, 3, 5, 7)), mesh).spec == P()
    assert shard_leaf_sharding(np.zeros((16,)), mesh).spec == P('data')
    assert shard_leaf_sharding(np.zeros((3, 3, 16, 64)), mesh).spec == \
        P(None, None, None, 'data')


@pytest.mark.parametrize('level', [1, 3])
def test_zero_matches_replicated_trajectory(level):
    mesh = make_mesh(('data',))
    model, tx, schedule, state, data = _setup(mesh)

    # replicated reference trajectory
    rep_state = jax.device_put(state, replicated(mesh))
    rep_step = build_train_step(model, tx, schedule, mesh=mesh, donate=False)
    for _ in range(2):
        rep_state, rep_metrics = rep_step(rep_state, data)

    # ZeRO trajectory
    z_state, shardings = zero_init(state, mesh, level=level)
    z_step = build_train_step(model, tx, schedule, mesh=mesh, donate=False,
                              state_shardings=shardings)
    for _ in range(2):
        z_state, z_metrics = z_step(z_state, data)

    # optimizer state is actually partitioned (first momentum leaf of a conv)
    mom_leaves = [l for l in jax.tree.leaves(z_state.opt_state)
                  if hasattr(l, 'sharding') and np.ndim(l) >= 1
                  and np.shape(l)[-1] % 8 == 0]
    assert mom_leaves, 'no shardable optimizer leaves found'
    assert any(not l.sharding.is_fully_replicated for l in mom_leaves)
    if level == 3:
        p_leaves = [l for l in jax.tree.leaves(z_state.params)
                    if np.ndim(l) >= 1 and max(np.shape(l)) % 8 == 0]
        assert any(not l.sharding.is_fully_replicated for l in p_leaves)

    np.testing.assert_allclose(float(z_metrics['total_loss']),
                               float(rep_metrics['total_loss']),
                               rtol=1e-5, atol=1e-6)
    ra = jax.device_get(rep_state.params)
    za = jax.device_get(z_state.params)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(ra)[0],
            jax.tree_util.tree_flatten_with_path(za)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=str(kp))
