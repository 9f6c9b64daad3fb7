"""Fused LayerNorm (Pallas TPU): one pass forward, one pass backward.

Why: the r5 profile of the 512-crop ViT-L train step (206 ms,
``tools/prof_join.py``) attributed ~29 ms/step to XLA's LayerNorm lowering
— per-row stats fusions (``convert_reduce`` f32[8,1032], 10.6 ms), the
dgamma/dbeta cross-row reductions (``multiply_reduce`` f32[1024],
18.1 ms) — ~6x the HBM floor because stats, normalize and the three
gradient terms each re-read the activations.  These kernels read x (and
dy) exactly once:

- forward: grid over row blocks; per-row mean/rstd in f32 registers, y
  written in the compute dtype, mean/rstd saved as [R, 1] f32 residuals;
- backward: dx in the same pass that accumulates dgamma/dbeta into f32
  VMEM scratch across the row-block grid (one HBM write at the last
  program — the ``ops/attention.py`` dk/dv revisit pattern).

Semantics match ``flax.linen.LayerNorm(epsilon=eps)`` with params
``scale``/``bias`` (fp32): stats in f32 over the last axis, output cast to
the input dtype.  Rows pad to the block size with zeros (pad rows produce
finite garbage that never leaves: their dy is zero).

Reference behavior being replaced: the reference runs
``torch.nn.LayerNorm`` inside each ViT block (``layers/block.py:84-198``);
this is the TPU-native implementation of the same math.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ['layer_norm', 'FusedLayerNorm']

# rows per program: 8-row sublane multiples; 256 rows x 1024 lanes f32
# intermediates stay well under the VMEM scoped default
_ROW_BLOCK = 256


def _on_tpu() -> bool:
    dev = jax.devices()[0]
    return dev.platform == 'tpu' or 'tpu' in dev.device_kind.lower()


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, mu_ref, rs_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)                     # [br, C]
    c = x.shape[1]
    mu = jnp.mean(x, axis=1, keepdims=True)                # [br, 1]
    var = jnp.mean(x * x, axis=1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * rstd
    y = xhat * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)
    mu_ref[...] = mu
    rs_ref[...] = rstd


def _bwd_kernel(x_ref, dy_ref, g_ref, mu_ref, rs_ref,
                dx_ref, dg_ref, db_ref, dg_acc, db_acc):
    from jax.experimental import pallas as pl

    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    mu, rstd = mu_ref[...], rs_ref[...]
    xhat = (x - mu) * rstd
    dxhat = dy * g_ref[...].astype(jnp.float32)
    c = x.shape[1]
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx_ref[...] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dg_acc[...] = jnp.zeros_like(dg_acc)
        db_acc[...] = jnp.zeros_like(db_acc)

    dg_acc[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_acc[...] += jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(0) - 1)
    def _write():
        dg_ref[...] = dg_acc[...]
        db_ref[...] = db_acc[...]


def _pad_rows(a, br):
    r = a.shape[0]
    pad = (-r) % br
    if pad:
        a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
    return a, r


def _fwd_impl(x2, g, b, eps, interpret):
    from jax.experimental import pallas as pl

    x2p, r = _pad_rows(x2, _ROW_BLOCK)
    rp, c = x2p.shape
    br = _ROW_BLOCK
    grid = (rp // br,)
    y, mu, rs = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[pl.BlockSpec((br, c), lambda i: (i, 0)),
                  pl.BlockSpec((1, c), lambda i: (0, 0)),
                  pl.BlockSpec((1, c), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((br, c), lambda i: (i, 0)),
                   pl.BlockSpec((br, 1), lambda i: (i, 0)),
                   pl.BlockSpec((br, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((rp, c), x2.dtype),
                   jax.ShapeDtypeStruct((rp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((rp, 1), jnp.float32)],
        interpret=interpret,
    )(x2p, g[None], b[None])
    return y[:r], mu, rs


def _bwd_impl(x2, g, mu, rs, dy2, eps, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x2p, r = _pad_rows(x2, _ROW_BLOCK)
    dy2p, _ = _pad_rows(dy2, _ROW_BLOCK)
    rp, c = x2p.shape
    br = _ROW_BLOCK
    grid = (rp // br,)
    # dg/db accumulate across the row grid: 'arbitrary' dimension semantics
    params = None
    if not interpret:
        from jax.experimental.pallas import tpu as _pltpu
        params = _pltpu.CompilerParams(dimension_semantics=('arbitrary',))
    dx, dg, db = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((br, c), lambda i: (i, 0)),
                  pl.BlockSpec((br, c), lambda i: (i, 0)),
                  pl.BlockSpec((1, c), lambda i: (0, 0)),
                  pl.BlockSpec((br, 1), lambda i: (i, 0)),
                  pl.BlockSpec((br, 1), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((br, c), lambda i: (i, 0)),
                   pl.BlockSpec((1, c), lambda i: (0, 0)),
                   pl.BlockSpec((1, c), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((rp, c), x2.dtype),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32),
                        pltpu.VMEM((1, c), jnp.float32)],
        interpret=interpret,
        compiler_params=params,
    )(x2p, dy2p, g[None], mu, rs)
    return dx[:r], dg[0], db[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln_core(x2, g, b, eps, interpret):
    return _fwd_impl(x2, g, b, eps, interpret)[0]


def _ln_core_fwd(x2, g, b, eps, interpret):
    y, mu, rs = _fwd_impl(x2, g, b, eps, interpret)
    return y, (x2, g, mu, rs)


def _ln_core_bwd(eps, interpret, res, dy):
    x2, g, mu, rs = res
    dx, dg, db = _bwd_impl(x2, g, mu, rs, dy, eps, interpret)
    return dx, dg, db


_ln_core.defvjp(_ln_core_fwd, _ln_core_bwd)


def layer_norm(x, scale, bias, eps: float = 1e-6,
               interpret: Optional[bool] = None):
    """LayerNorm over the last axis with fp32 ``scale``/``bias`` params.

    Any leading shape; the last axis must be a multiple of 128 (lane tile)
    — callers fall back to plain XLA otherwise."""
    if interpret is None:
        interpret = not _on_tpu()
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    y = _ln_core(x2, scale, bias, eps, interpret)
    return y.reshape(shape)


class FusedLayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm(epsilon=eps, dtype=dtype)`` backed by the
    fused kernels on TPU; param names/shapes (``scale``/``bias``, fp32)
    match flax so checkpoints interoperate.  On CPU (or when the feature
    dim is not lane-aligned) it applies the plain flax math — same
    numerics, no interpret-mode overhead in tests."""

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        if _on_tpu() and c % 128 == 0:
            return layer_norm(x.astype(self.dtype), scale, bias, self.epsilon)
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - mu * mu
        y = (x32 - mu) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)
