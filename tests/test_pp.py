"""Pipeline parallelism (GPipe over a 'pipe' mesh axis) — additive beyond
the reference (SURVEY.md §2.9: the reference is DDP-only); enables
vit_7b-scale trunks (``vision_transformer.py:418-427``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ever_tpu.module.vit import DinoVisionTransformer
from ever_tpu.parallel.mesh import make_mesh
from ever_tpu.parallel.pp import pipeline, pipelined_vit_apply, stack_layer_params


def _need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f'needs {n} devices')


def test_pipeline_primitive_matches_sequential():
    """The GPipe schedule applied to a stack of linear layers equals the
    plain sequential application."""
    _need_devices(4)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(0)
    L, D = 8, 16
    ws = jnp.asarray(rng.normal(size=(L, D, D)).astype(np.float32) * 0.2)
    x = jnp.asarray(rng.normal(size=(4, 2, D)).astype(np.float32))  # [M, mb, D]

    def layer_fn(w, h):
        return jnp.tanh(h @ w)

    ref = x
    for i in range(L):
        ref = layer_fn(ws[i], ref)

    mesh = make_mesh(('pipe',), devices=jax.devices()[:4])
    run = shard_map(
        lambda sp, xs: pipeline(layer_fn, sp, xs, axis_name='pipe'),
        mesh=mesh, in_specs=(P('pipe'), P()), out_specs=P(), check_vma=False)
    out = jax.jit(run)(ws, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pipelined_vit_matches_single_device():
    """pipelined_vit_apply == the plain trunk forward, values AND grads."""
    _need_devices(4)
    model = DinoVisionTransformer(vit_type='vit_small', patch_size=8,
                                  n_storage_tokens=4, layerscale_init=1e-5)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 32, 32, 3)).astype(np.float32))
    variables = model.init({'params': jax.random.key(0)}, x)
    ref = model.apply(variables, x)

    mesh = make_mesh(('pipe',), devices=jax.devices()[:4])
    fn = pipelined_vit_apply(model, variables, mesh)
    out = jax.jit(fn)(x)
    for k in ('x_norm_clstoken', 'x_storage_tokens', 'x_norm_patchtokens'):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)

    g_pp = jax.grad(lambda xx: jnp.sum(fn(xx)['x_norm_clstoken'] ** 2))(x)
    g_ref = jax.grad(lambda xx: jnp.sum(
        model.apply(variables, xx)['x_norm_clstoken'] ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_stack_layer_params_roundtrip():
    trees = [{'a': jnp.full((2,), float(i)), 'b': {'c': jnp.ones((3,)) * i}}
             for i in range(4)]
    stacked = stack_layer_params(trees)
    assert stacked['a'].shape == (4, 2)
    np.testing.assert_array_equal(np.asarray(stacked['b']['c'][2]),
                                  np.full((3,), 2.0))


def test_pipelined_vit_data_parallel_composition():
    """A ('data', 'pipe') mesh shards the microbatch stream over 'data'
    (the docstring's composition claim — replicating it wasted the data
    groups on identical work) and still matches the single-device forward."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from ever_tpu.core import builder
    from ever_tpu.parallel.mesh import make_mesh
    from ever_tpu.parallel.pp import pipelined_vit_apply

    mesh = make_mesh(('data', 'pipe'), shape=(2, 4),
                     devices=jax.devices()[:8])
    vit = builder.make_model({'type': 'vit_small', 'params': {}})
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 32, 32, 3)).astype(np.float32))
    variables = vit.init({'params': jax.random.key(0)}, x)
    ref = vit.apply(variables, x)
    out = jax.jit(pipelined_vit_apply(vit, variables, mesh))(x)
    np.testing.assert_allclose(np.asarray(out['x_norm_patchtokens']),
                               np.asarray(ref['x_norm_patchtokens']),
                               atol=2e-4)
