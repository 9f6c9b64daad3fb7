"""Tensor-parallel ViT sharding on a (data=4, model=2) CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ever_tpu.module  # noqa: F401
from ever_tpu.core import builder
from ever_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from ever_tpu.parallel.tp import apply_tp, vit_tp_shardings


def test_vit_tp_step_runs_and_matches_replicated():
    mesh = make_mesh(('data', 'model'), shape=(4, 2))
    model = builder.make_model({'type': 'vit_small', 'params': dict(
        n_storage_tokens=4)})
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 32, 32, 3)).astype(np.float32))
    variables = model.init({'params': jax.random.key(0)}, x)
    params = variables['params']

    # shardings: qkv/w-up column-parallel, proj/w-down row-parallel
    sh = vit_tp_shardings(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    specs = {'/'.join(str(getattr(k, 'key', k)) for k in p): s.spec
             for p, s in flat}
    assert specs['block0/attn/qkv/kernel'] == jax.sharding.PartitionSpec(None, 'model')
    assert specs['block0/attn/proj/kernel'] == jax.sharding.PartitionSpec('model', None)
    assert specs['block0/mlp/fc1/kernel'] == jax.sharding.PartitionSpec(None, 'model')
    assert specs['cls_token'] == jax.sharding.PartitionSpec()

    tp_params = apply_tp(params, mesh)

    def fwd(p, xx):
        out = model.apply({'params': p}, xx)
        return out['x_norm_clstoken']

    ref = jax.jit(fwd)(params, x)
    tp_out = jax.jit(fwd, in_shardings=(vit_tp_shardings(params, mesh),
                                        batch_sharding(mesh)),
                     out_shardings=replicated(mesh))(
        tp_params, jax.device_put(x, batch_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(tp_out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_tp_grad_step():
    """TP params stay TP-sharded through a jitted grad step."""
    mesh = make_mesh(('data', 'model'), shape=(4, 2))
    model = builder.make_model({'type': 'vit_small', 'params': {}})
    x = jnp.ones((4, 32, 32, 3))
    params = model.init({'params': jax.random.key(0)}, x)['params']
    sh = vit_tp_shardings(params, mesh)
    tp_params = jax.device_put(params, sh)

    def loss(p, xx):
        return jnp.mean(model.apply({'params': p}, xx)['x_norm_clstoken'] ** 2)

    grads = jax.jit(jax.grad(loss), in_shardings=(sh, batch_sharding(mesh)),
                    out_shardings=sh)(tp_params,
                                      jax.device_put(x, batch_sharding(mesh)))
    g = grads['block0']['attn']['qkv']['kernel']
    assert g.sharding.spec == jax.sharding.PartitionSpec(None, 'model')
