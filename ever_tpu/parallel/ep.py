"""Expert parallelism: mixture-of-experts FFN sharded over an ``'expert'``
mesh axis (GShard/Switch-Transformer dense-dispatch formulation).

ADDITIVE capability (the reference has no MoE — SURVEY.md §2.9); rounds out
the parallelism family (dp/tp/pp/sp/ep) for scaling ViT trunks: with experts
sharded over ``expert``, each chip holds ``E / n_expert`` expert FFNs and the
dispatch/combine einsums contract against one-hot routing masks — the
canonical TPU MoE (all data stays dense and static-shaped; XLA turns the
dispatch into an all-to-all over ICI when the token dim is sharded).

Semantics: top-``k`` routing with softmax gates renormalized over the chosen
experts, expert capacity ``C = ceil(k * tokens * capacity_factor / E)``;
tokens over capacity are dropped (contribute zero — residual connections
carry them, as in Switch).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['MoEMlp', 'moe_expert_shardings']

Dtype = Any


class MoEMlp(nn.Module):
    """Mixture-of-experts MLP over the token dim of ``[B, N, D]`` inputs.

    Drop-in FFN for transformer blocks.  Params: ``router/kernel [D, E]``,
    ``experts_fc1 [E, D, H]``, ``experts_fc2 [E, H, D]`` (+ biases) — the
    leading expert axis is what :func:`moe_expert_shardings` shards.
    """

    num_experts: int
    hidden: int
    k: int = 2
    capacity_factor: float = 1.25
    aux_loss_weight: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        e = self.num_experts
        tokens = b * n
        cap = int(-(-self.k * tokens * self.capacity_factor // e))
        xt = x.reshape(tokens, d)

        router = self.param('router', nn.initializers.normal(0.02), (d, e))
        logits = (xt.astype(jnp.float32) @ router.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)                    # [T, E]

        # top-k expert choice with renormalized gates
        gate_vals, gate_idx = jax.lax.top_k(probs, self.k)          # [T, k]
        gate_vals = gate_vals / jnp.maximum(
            jnp.sum(gate_vals, -1, keepdims=True), 1e-9)

        # Switch-style load-balancing auxiliary loss: E * Σ_e f_e·P_e, where
        # f_e is the fraction of tokens whose TOP choice is expert e and P_e
        # the mean router probability.  Without it the router has no
        # incentive to balance and hot experts drop over-capacity tokens.
        # Sown into the 'losses' collection — collect with
        # ``model.apply(..., mutable=['losses'])`` and add to the loss dict
        # (keys ending in 'loss' are summed by the ERModule contract).
        f_e = jnp.mean(jax.nn.one_hot(gate_idx[:, 0], e, dtype=jnp.float32), 0)
        p_e = jnp.mean(probs, axis=0)
        self.sow('losses', 'moe_aux_loss',
                 self.aux_loss_weight * e * jnp.sum(f_e * p_e))

        # position of each (token, choice) in its expert's buffer; tokens
        # beyond capacity get mask 0 (dropped — residual carries them)
        onehot = jax.nn.one_hot(gate_idx, e, dtype=jnp.float32)     # [T, k, E]
        # priority: choice 0 of every token first, then choice 1, ...
        flat = jnp.transpose(onehot, (1, 0, 2)).reshape(self.k * tokens, e)
        pos = jnp.cumsum(flat, axis=0) - flat                       # [kT, E]
        pos = pos.reshape(self.k, tokens, e).transpose(1, 0, 2)     # [T, k, E]
        within = (pos < cap).astype(jnp.float32) * onehot
        slot = jnp.einsum('tke,tke->tk', pos, onehot).astype(jnp.int32)

        # dispatch [T, k, E] x slot one-hot [T, k, C] → [E, C, T] mask
        slot_oh = jax.nn.one_hot(slot, cap, dtype=jnp.float32)      # [T, k, C]
        dispatch = jnp.einsum('tke,tkc->etc', within, slot_oh)      # [E, T, C]→etc
        combine = jnp.einsum('tk,tke,tkc->etc', gate_vals, within, slot_oh)

        # gather expert inputs densely: [E, C, D]
        xin = jnp.einsum('etc,td->ecd', dispatch, xt.astype(jnp.float32))
        xin = xin.astype(self.dtype)

        w1 = self.param('experts_fc1', nn.initializers.lecun_normal(),
                        (e, d, self.hidden))
        b1 = self.param('experts_bias1', nn.initializers.zeros, (e, self.hidden))
        w2 = self.param('experts_fc2', nn.initializers.lecun_normal(),
                        (e, self.hidden, d))
        b2 = self.param('experts_bias2', nn.initializers.zeros, (e, d))
        h = jnp.einsum('ecd,edh->ech', xin, w1.astype(self.dtype)) \
            + b1[:, None].astype(self.dtype)
        h = nn.gelu(h)
        out = jnp.einsum('ech,ehd->ecd', h, w2.astype(self.dtype)) \
            + b2[:, None].astype(self.dtype)

        y = jnp.einsum('etc,ecd->td', combine, out.astype(jnp.float32))
        return y.reshape(b, n, d).astype(x.dtype)


def moe_expert_shardings(params: Any, mesh: Mesh, axis: str = 'expert') -> Any:
    """NamedShardings placing every ``experts_*`` leaf's leading expert dim
    on the ``expert`` mesh axis (router + everything else replicated)."""
    k = mesh.shape[axis]
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        keys = '/'.join(getattr(p, 'key', str(p)) for p in path)
        # replicate indivisible leaves instead of emitting a sharding the
        # device_put would reject with a raw error (same fallback as
        # tp.vit_tp_shardings)
        if 'experts_' in keys and jnp.ndim(leaf) and leaf.shape[0] % k == 0:
            out.append(NamedSharding(mesh, P(axis)))
        else:
            out.append(NamedSharding(mesh, P()))
    return jax.tree_util.tree_unflatten(treedef, out)
