"""TPU substitute for 2:4 structured-sparse linear (``dinov3/layers/sparse_linear.py:19-90``).

The reference sparsifies weights to 2:4 via xformers/cuSPARSELt for a GPU
tensor-core speedup.  TPUs have no structured-sparsity unit, so there is no
speed to win — but the NUMERICS (training/serving with 2-of-4
largest-magnitude weights per group, straight-through gradients) are
reproduced exactly so sparsity experiments port.  ``sparsify24`` computes the
mask with one reshape+top-2 (XLA-friendly, no sort).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = ['sparsify24', 'LinearW24', 'replace_linears_with_sparse_linear',
           'update_24sparsity']


@jax.custom_vjp
def sparsify24(w: jnp.ndarray) -> jnp.ndarray:
    """Zero the 2 smallest-|w| of every 4 consecutive weights along the last
    axis (parity: ``xops.sparsify24(algo='largest_abs_values_greedy',
    gradient='ste')``, ``sparse_linear.py:36-41``)."""
    *lead, n = w.shape
    assert n % 4 == 0, f'last dim {n} not divisible by 4'
    g = w.reshape(*lead, n // 4, 4)
    a = jnp.abs(g)
    # keep the top-2 per group: element i survives if fewer than 2 others
    # outrank it, where j outranks i iff |w_j| > |w_i| or (|w_j| == |w_i|
    # and j < i) — an exact lexicographic tie-break (earlier index wins,
    # torch.topk order), so exactly 2 of every 4 survive even on ties.
    idx = jnp.arange(4)
    larger = a[..., None, :] > a[..., :, None]
    tie_earlier = (a[..., None, :] == a[..., :, None]) & (idx[None, :] < idx[:, None])
    rank = jnp.sum(larger | tie_earlier, axis=-1)
    mask = (rank < 2).astype(w.dtype)
    return (g * mask).reshape(w.shape)


def _s24_fwd(w):
    return sparsify24(w), None


def _s24_bwd(_, g):
    return (g,)  # straight-through


sparsify24.defvjp(_s24_fwd, _s24_bwd)


class LinearW24(nn.Module):
    """Dense whose weight is 2:4-sparsified on the fly (parity:
    ``sparse_linear.py:19-44``).  ``sparsity_enabled`` mirrors the reference
    flag: False = plain Dense."""

    features: int
    use_bias: bool = True
    sparsity_enabled: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features))
        if self.sparsity_enabled:
            # reference sparsifies along in_features (torch [out, in] rows)
            w = sparsify24(w.T).T
        b = (self.param('bias', nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        y = x @ w.astype(x.dtype)
        return y + b.astype(y.dtype) if b is not None else y


def update_24sparsity(params, path_filter=lambda p: True):
    """Hard-apply the 2:4 mask to trained params (parity:
    ``sparse_linear.py:70-90``): returns a new pytree with every matching
    ``kernel`` sparsified in place (serving/export form)."""
    from flax.traverse_util import flatten_dict, unflatten_dict
    flat = flatten_dict(params)
    out = {}
    count = 0
    for k, v in flat.items():
        if k[-1] == 'kernel' and v.ndim == 2 and v.shape[0] % 4 == 0 \
                and path_filter('/'.join(map(str, k))):
            out[k] = sparsify24(jnp.asarray(v).T).T
            count += 1
        else:
            out[k] = v
    import logging
    logging.getLogger('ever_tpu').info('update_24sparsity: %d kernels', count)
    return unflatten_dict(out)


def replace_linears_with_sparse_linear(root_module, *, filter_fn=None):
    """Reference surface (``sparse_linear.py:47-67``).  Flax modules are
    immutable definitions — choose :class:`LinearW24` at model definition, or
    sparsify trained params with :func:`update_24sparsity`."""
    raise NotImplementedError(
        'flax modules are immutable: build with LinearW24 in place of Dense, '
        'or apply update_24sparsity to trained params.')
