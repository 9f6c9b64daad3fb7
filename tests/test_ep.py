"""Expert parallelism (GShard-style MoE over an 'expert' mesh axis) —
additive beyond the reference (SURVEY.md §2.9: no MoE in the reference)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ever_tpu.parallel.ep import MoEMlp, moe_expert_shardings
from ever_tpu.parallel.mesh import make_mesh


def test_moe_top1_full_capacity_equals_selected_expert():
    """With k=1 and capacity >= all tokens, each token's output must equal
    its argmax expert's dense MLP applied to it (gate weight 1)."""
    moe = MoEMlp(num_experts=4, hidden=16, k=1, capacity_factor=4.0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 8))
                    .astype(np.float32))
    variables = moe.init({'params': jax.random.key(0)}, x)
    y = moe.apply(variables, x)

    p = variables['params']
    xt = np.asarray(x).reshape(-1, 8)
    logits = xt @ np.asarray(p['router'])
    choice = logits.argmax(-1)
    w1, b1 = np.asarray(p['experts_fc1']), np.asarray(p['experts_bias1'])
    w2, b2 = np.asarray(p['experts_fc2']), np.asarray(p['experts_bias2'])

    def gelu(v):
        return np.asarray(jax.nn.gelu(jnp.asarray(v)))

    ref = np.stack([gelu(xt[i] @ w1[c] + b1[c]) @ w2[c] + b2[c]
                    for i, c in enumerate(choice)])
    np.testing.assert_allclose(np.asarray(y).reshape(-1, 8), ref,
                               rtol=1e-4, atol=1e-5)


def test_moe_capacity_drops_overflow_tokens():
    """Tokens routed beyond expert capacity contribute exactly zero."""
    moe = MoEMlp(num_experts=2, hidden=8, k=1, capacity_factor=0.25)
    x = jnp.ones((1, 8, 4), jnp.float32)  # identical tokens → same expert
    variables = moe.init({'params': jax.random.key(0)}, x)
    y = np.asarray(moe.apply(variables, x))[0]
    # capacity = ceil(1*8*0.25/2) = 1 → exactly one token survives
    nonzero = np.abs(y).sum(axis=-1) > 1e-9
    assert nonzero.sum() == 1


def test_moe_expert_parallel_matches_single_device():
    """Experts sharded over an 'expert' mesh axis produce identical outputs
    and gradients to the unsharded computation."""
    if len(jax.devices()) < 4:
        pytest.skip('needs 4 devices')
    moe = MoEMlp(num_experts=8, hidden=16, k=2, capacity_factor=2.0)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 8, 8))
                    .astype(np.float32))
    variables = moe.init({'params': jax.random.key(0)}, x)
    ref = moe.apply(variables, x)

    mesh = make_mesh(('expert',), devices=jax.devices()[:4])
    sh = moe_expert_shardings(variables['params'], mesh)
    ep_params = jax.device_put(variables['params'], sh)

    fn = jax.jit(lambda p, xx: moe.apply({'params': p}, xx),
                 in_shardings=(sh, NamedSharding_rep(mesh)),
                 out_shardings=NamedSharding_rep(mesh))
    out = fn(ep_params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    def loss(p, xx):
        return jnp.sum(moe.apply({'params': p}, xx) ** 2)

    g_ref = jax.grad(loss)(variables['params'], x)
    g_ep = jax.jit(jax.grad(loss), in_shardings=(sh, NamedSharding_rep(mesh)),
                   out_shardings=sh)(ep_params, x)
    np.testing.assert_allclose(
        np.asarray(g_ep['experts_fc1']), np.asarray(g_ref['experts_fc1']),
        rtol=1e-4, atol=1e-5)


def NamedSharding_rep(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P())


def test_moe_aux_loss_sown():
    """MoEMlp emits the Switch load-balancing loss via the 'losses'
    collection so trainers can add it to the summed loss dict."""
    import jax
    import jax.numpy as jnp
    from ever_tpu.parallel.ep import MoEMlp
    m = MoEMlp(num_experts=4, hidden=16)
    x = jnp.ones((2, 8, 8), jnp.float32)
    variables = m.init(jax.random.key(0), x)
    y, aux = m.apply(variables, x, mutable=['losses'])
    val = jax.tree.leaves(aux['losses'])[0]
    assert np.isfinite(float(val)) and float(val) > 0.0


def test_moe_expert_shardings_indivisible_replicates():
    """experts_* leaves whose expert dim is not divisible by the mesh axis
    replicate instead of producing a raw device_put failure."""
    import jax
    import jax.numpy as jnp
    from ever_tpu.parallel.ep import MoEMlp, moe_expert_shardings
    from ever_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(('expert',))           # 8-way
    m = MoEMlp(num_experts=6, hidden=16)    # 6 % 8 != 0
    variables = m.init(jax.random.key(0), jnp.ones((2, 8, 8), jnp.float32))
    sh = moe_expert_shardings(variables['params'], mesh)
    placed = jax.device_put(variables['params'], sh)   # must not raise
    assert jax.tree.leaves(placed)[0] is not None


def test_sown_aux_loss_flows_into_train_step():
    """A layer-sown loss (MoE balance) must join the summed training loss via
    the 'losses' collection — the layer returns a bare tensor and cannot put
    it into the model's loss dict itself."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import optax
    from ever_tpu.parallel.ep import MoEMlp
    from ever_tpu.parallel.spmd import build_train_step, create_train_state

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, y=None, train=False):
            h = MoEMlp(num_experts=4, hidden=8)(x)
            if train:
                return dict(mse_loss=jnp.mean((h - 0.1) ** 2))
            return h

    model = Tiny()
    tx = optax.sgd(0.01)
    x = jnp.ones((2, 8, 8), jnp.float32)
    state = create_train_state(model, tx, (x,))
    step = build_train_step(model, tx, None, forward_times=1)
    state2, metrics = step(state, (x,))
    assert 'sown_aux_loss' in metrics
    assert float(metrics['total_loss']) > float(metrics['mse_loss'])
