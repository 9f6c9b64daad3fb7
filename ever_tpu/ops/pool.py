"""Pallas TPU kernel: fused backward for the 3x3/stride-2 SAME maxpool.

EXPERIMENT — LOST.  Measured on v5e (FarSeg-R50 512² b8 bf16):
42.5 ms/step vs 33.4 with XLA's ``select_and_scatter`` backward (itself
0.54 ms of the step).  The one-pass traffic argument (~0.21 ms of HBM:
read x, out, g; write dx) is sound, but the realized kernel pays for lane
concats/relayouts, f32-upcast compares (Mosaic has no packed-bf16 cmpf),
and per-grid-step 1-row halo DMAs.  Kept opt-in
(``module.ops.max_pool(impl='pallas')``, correctness-tested) as the record
of the fourth losing maxpool-backward formulation; default stays
``reduce_window``.  See ``module/ops.py`` for the two XLA-level attempts.

The math (shared with the 'planes' impl):

    dx[y, x] = sum over the <=4 windows (oy, ox) covering (y, x) of
               g[oy, ox] * [x[y, x] == out[oy, ox]]

The <=4 covering windows follow from stride 2 / window 3: input row y is in
window rows {y/2} (y even) or {(y-1)/2, (y+1)/2} (y odd); same for columns.

Layout strategy (Mosaic-constraint driven — sublane interleaves are
unsupported, lane concats and leading-dim reshapes are free):

- COLUMN parity lives in the LANE dim: the input is viewed [N,H,W/2,2C]
  (a pure reshape), so lane q*C+c holds column parity q.  ``out``/``g``
  expand to 2C lanes by lane-concat duplication; the odd-column "right
  window" term is a sublane shift (slice+concat) placed in the q=1 half.
- ROW parity lives in a separate OUTPUT dim: grad is produced as
  [N,H/2,2,W/2,2C] (merging back to [N,H,W,C] is again a pure reshape);
  even/odd-row planes are written to index 0/1 of the parity dim.

Tie semantics: every input equal to its window max receives that window's
gradient (the reference picks one winner per window) — identical a.e.; this
pool runs on BatchNorm output (pre-relu) where exact ties have measure zero.

Grid: (batch, row-blocks); one-output-row bottom halo rides in as a
separate 1-row block view of the bottom-zero-padded ``out``/``g``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ['max_pool_32_pallas']

BH = 32  # input rows per kernel instance (even)


def _bwd_kernel(x_ref, om_ref, oh_ref, gm_ref, gh_ref, dx_ref):
    r2 = x_ref.shape[1] // 2          # output rows in this block
    x = x_ref[0]                      # [2*r2, w2, 2c]
    xp = x.reshape(r2, 2, x.shape[1], x.shape[2])
    xe, xo = xp[:, 0], xp[:, 1]       # even / odd input rows, [r2, w2, 2c]

    out_blk = jnp.concatenate([om_ref[0], oh_ref[0]], axis=0)  # [r2+1, w2, c]
    g_blk = jnp.concatenate([gm_ref[0], gh_ref[0]], axis=0)

    def lanes(o, g):
        """(A, GA, B, GB): straight + right-window col terms on 2C lanes.

        A[s, q*C+c] = o[s, c] (window ox = s, covers cols 2s and 2s+1);
        B places o[s+1] in the q=1 half only (window ox = s+1, odd cols) —
        the q=0 half of GB is zero, so any accidental value match there
        contributes nothing.
        """
        zero = jnp.zeros_like(o)
        o_sh = jnp.concatenate([o[:, 1:, :], zero[:, :1, :]], axis=1)
        g_sh = jnp.concatenate([g[:, 1:, :], zero[:, :1, :]], axis=1)
        A = jnp.concatenate([o, o], axis=-1)
        GA = jnp.concatenate([g, g], axis=-1)
        B = jnp.concatenate([zero, o_sh], axis=-1)
        GB = jnp.concatenate([zero, g_sh], axis=-1)
        return A, GA, B, GB

    A_r, GA_r, B_r, GB_r = lanes(out_blk[:-1], g_blk[:-1])      # window row r
    A_r1, GA_r1, B_r1, GB_r1 = lanes(out_blk[1:], g_blk[1:])    # window row r+1

    # compare in f32: Mosaic lacks packed-bf16 cmpf (vector<8x128x2xbf16>)
    f32 = jnp.float32
    xe32, xo32 = xe.astype(f32), xo.astype(f32)
    zero = jnp.zeros((), g_blk.dtype)
    even = (jnp.where(xe32 == A_r.astype(f32), GA_r, zero)
            + jnp.where(xe32 == B_r.astype(f32), GB_r, zero))
    odd = (jnp.where(xo32 == A_r.astype(f32), GA_r, zero)
           + jnp.where(xo32 == B_r.astype(f32), GB_r, zero)
           + jnp.where(xo32 == A_r1.astype(f32), GA_r1, zero)
           + jnp.where(xo32 == B_r1.astype(f32), GB_r1, zero))
    dx_ref[0, :, 0] = even.astype(dx_ref.dtype)
    dx_ref[0, :, 1] = odd.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def max_pool_32_pallas(x, out, g, interpret: bool = False):
    """dx for ``max_pool(x, 3, 2, SAME)`` given forward output and cotangent.

    x: [N, H, W, C] (H, W even); out, g: [N, H/2, W/2, C].
    """
    n, h, w, c = x.shape
    oh, ow = h // 2, w // 2
    bh = next(b for b in (BH, 16, 8, 4, 2) if h % b == 0)
    xv = x.reshape(n, h, ow, 2 * c)           # pure view: col parity -> lanes
    # one-row bottom halo: the padded row is zero in g, contributes nothing
    op = jnp.pad(out, ((0, 0), (0, 1), (0, 0), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, 1), (0, 0), (0, 0)))

    grid = (n, h // bh)
    main = pl.BlockSpec((1, bh // 2, ow, c), lambda b, i: (b, i, 0, 0))
    halo = pl.BlockSpec(
        (1, 1, ow, c), lambda b, i: (b, (i + 1) * (bh // 2), 0, 0))
    grad5 = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bh, ow, 2 * c), lambda b, i: (b, i, 0, 0)),
            main, halo, main, halo,
        ],
        out_specs=pl.BlockSpec((1, bh // 2, 2, ow, 2 * c),
                               lambda b, i: (b, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, oh, 2, ow, 2 * c), x.dtype),
        interpret=interpret,
    )(xv, op, op, gp, gp)
    return grad5.reshape(n, h, w, c)          # pure view back to NHWC
