"""Pipeline parallelism (GPipe-style) over a ``'pipe'`` mesh axis.

ADDITIVE capability: the reference has no pipeline parallelism (SURVEY.md
§2.9 — DDP only); PP is what makes the vit_7b-sized trunks
(``ever/module/dinov3/models/vision_transformer.py:418-427``) trainable when
one chip cannot hold all layers.

TPU-native design: one SPMD program under ``shard_map``.  The transformer's
homogeneous blocks are stacked on a leading layer axis and sharded over the
``pipe`` mesh axis, so stage ``s`` holds layers ``[s*L/S, (s+1)*L/S)``.
Microbatches stream through the classic GPipe schedule: at tick ``t`` every
stage runs its resident microbatch, then activations hop one stage forward
via ``lax.ppermute`` over ICI.  The bubble is the usual ``(S-1)/(M+S-1)``;
everything (scan + ppermute) is differentiable, so ``jax.grad`` through the
pipeline yields the standard backward schedule automatically.

Composition with data parallelism: build the mesh as
``make_mesh(('data', 'pipe'), shape=(D, S))`` — the batch shards on
``data``, the layer stack on ``pipe``.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ['stack_layer_params', 'pipeline', 'pipelined_vit_apply']


def stack_layer_params(per_layer: Sequence[Any]) -> Any:
    """Stack L structurally-identical per-layer param trees on a new leading
    layer axis (leaf ``[L, ...]``) — the layout PP shards over ``pipe``."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)


def pipeline(layer_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
             stage_params: Any,
             x_microbatches: jnp.ndarray,
             *,
             axis_name: str = 'pipe'):
    """GPipe forward inside ``shard_map``: runs on every pipe device.

    ``stage_params``: this device's layer stack (leaf ``[L_stage, ...]``);
    ``layer_fn(p, h) -> h`` applies ONE layer;
    ``x_microbatches``: ``[M, mb, ...]`` — the same on every stage (only
    stage 0 reads it).  Returns ``[M, mb, ...]`` valid on every stage (the
    last stage's outputs are broadcast back with a masked psum).
    """
    s = jax.lax.axis_index(axis_name)
    S = jax.lax.axis_size(axis_name)
    M = x_microbatches.shape[0]
    mb_shape = x_microbatches.shape[1:]

    def stage_fn(h):
        # scan this stage's layers over the resident activation
        def body(carry, p):
            return layer_fn(p, carry), None
        h, _ = jax.lax.scan(body, h, stage_params)
        return h

    perm = [(i, (i + 1) % S) for i in range(S)]

    def tick(carry, t):
        h, outputs = carry
        # stage 0 ingests microbatch t (garbage once t >= M — masked later)
        inject = x_microbatches[jnp.minimum(t, M - 1)]
        h = jnp.where(s == 0, inject.astype(h.dtype), h)
        h = stage_fn(h)
        # last stage emits microbatch t-(S-1)
        out_idx = jnp.clip(t - (S - 1), 0, M - 1)
        valid = jnp.logical_and(s == S - 1, t >= S - 1)
        outputs = jax.lax.dynamic_update_slice(
            outputs,
            jnp.where(valid, h, jax.lax.dynamic_index_in_dim(
                outputs, out_idx, keepdims=False))[None],
            (out_idx,) + (0,) * h.ndim)
        # hop one stage forward
        h = jax.lax.ppermute(h, axis_name, perm)
        return (h, outputs), None

    h0 = jnp.zeros(mb_shape, x_microbatches.dtype)
    outputs = jnp.zeros((M,) + mb_shape, x_microbatches.dtype)
    (h, outputs), _ = jax.lax.scan(tick, (h0, outputs), jnp.arange(M + S - 1))
    # broadcast the last stage's outputs to every stage
    outputs = jnp.where(s == S - 1, outputs, jnp.zeros_like(outputs))
    return jax.lax.psum(outputs, axis_name)


def pipelined_vit_apply(model, variables, mesh: Mesh, *,
                        num_microbatches: int = None,
                        axis_name: str = 'pipe') -> Callable:
    """Build a pipelined forward for a ``DinoVisionTransformer``.

    Takes the STANDARD (single-device) ``variables`` tree — block params are
    restacked on the fly, so checkpoints and converters are unchanged.
    Embedding (patchifier + cls/storage tokens + RoPE) and the final norm
    run replicated; the ``depth`` transformer blocks are sharded over the
    ``pipe`` mesh axis.

    Returns ``fn(x) -> dict`` with the trunk's usual output keys.
    """
    from ever_tpu.module.vit import SelfAttentionBlock, VIT_SPECS

    S = mesh.shape[axis_name]
    depth, dim, heads, ffn_ratio, ffn_layer = VIT_SPECS[model.vit_type]
    if depth % S != 0:
        raise ValueError(f'depth {depth} not divisible by {S} pipeline stages')
    M = num_microbatches or S

    params = variables['params']
    block_params = [params[f'block{i}'] for i in range(depth)]
    stacked = stack_layer_params(block_params)
    other = {k: v for k, v in params.items() if not k.startswith('block')}

    blk = SelfAttentionBlock(
        dim, heads, ffn_ratio, qkv_bias=model.qkv_bias,
        layerscale_init=model.layerscale_init,
        drop_path_rate=model.drop_path_rate,
        ffn_layer=model.ffn_layer or ffn_layer, norm=model.norm,
        norm_eps=model.resolved_norm_eps, attn_impl=model.attn_impl,
        dtype=model.dtype)

    def embed(x):
        return model.apply({'params': other}, x, method=model._tokens)

    def rope_for(h, w):
        return model.apply({'params': other}, h, w,
                           method=lambda m, hh, ww: m.rope_embed(hh, ww))

    def finalize(tokens):
        def fin(m, t):
            n_prefix = 1 + m.n_storage_tokens
            if m.untie_cls_and_patch_norms:
                cls_and_storage = m.cls_norm(t[:, :n_prefix])
                patches = m.final_norm(t[:, n_prefix:])
            else:
                normed = m.final_norm(t)
                cls_and_storage = normed[:, :n_prefix]
                patches = normed[:, n_prefix:]
            return cls_and_storage, patches
        return model.apply({'params': other}, tokens, method=fin)

    # data-parallel composition: every mesh axis that is not the pipe axis
    # shards the per-microbatch batch dim, so a ('data', 'pipe') mesh runs
    # D independent pipelines on batch shards (replicating the stream over
    # 'data' would waste (D-1)/D of the pod on identical work)
    data_axes = tuple(a for a in mesh.axis_names if a != axis_name)
    mb_spec = P(None, data_axes if data_axes else None)

    def fn(x):
        b = x.shape[0]
        if b % M != 0:
            raise ValueError(f'batch {b} not divisible by {M} microbatches')
        d_total = int(np.prod([mesh.shape[a] for a in data_axes])) or 1
        if (b // M) % d_total != 0:
            raise ValueError(
                f'microbatch size {b // M} not divisible by the '
                f'{d_total}-way data sharding over {data_axes}')
        tokens, (h, w) = embed(x)
        sin, cos = rope_for(h, w)
        n_tok, d = tokens.shape[1], tokens.shape[2]
        mbs = tokens.reshape(M, b // M, n_tok, d)

        def layer_fn(p, t):
            return blk.apply({'params': p}, t, (sin, cos))

        run = shard_map(
            lambda sp, xs: pipeline(layer_fn, sp, xs, axis_name=axis_name),
            mesh=mesh,
            in_specs=(P(axis_name), mb_spec),
            out_specs=mb_spec,
            check_vma=False)
        out = run(stacked, mbs).reshape(b, n_tok, d)
        cls_and_storage, patches = finalize(out)
        return dict(x_norm_clstoken=cls_and_storage[:, 0],
                    x_storage_tokens=cls_and_storage[:, 1:],
                    x_norm_patchtokens=patches,
                    grid=(h, w))

    return fn
