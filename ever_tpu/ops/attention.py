"""Attention dispatch: XLA SDPA, the fused VMEM kernel, or Pallas flash.

Three regimes, picked automatically by token count (or force via ``impl``):

- ``'xla'`` — few hundred tokens: the score matrix is small enough that
  XLA's fused SDPA is fine and kernel launch overhead isn't worth it.
- ``'fused'`` — the ViT-tile regime (~0.5k-5k tokens, i.e. 512²-1024²
  images at /16).  XLA SDPA materializes the f32 ``[B,H,N,N]`` score
  tensor in HBM: profiled at 512² ViT-L training it was 176 ms of a
  322 ms step (~850 MB moved per softmax fusion, memory-bound at
  ~620 GB/s) while attention is only ~120 GFLOP (<1 ms of MXU).  The
  fused kernel keeps one q-row-block's scores entirely in VMEM — full
  K/V rows fit there at these sizes — so scores NEVER touch HBM, and
  the backward recomputes them in-kernel (nothing quadratic is saved).
- ``'flash'`` — big-tile dense inference (2048²/16 → 16k tokens): score
  row blocks stop fitting VMEM; the streaming flash kernel wins
  (measured 2.8× XLA at 16k).

Shapes follow flax convention: q/k/v are ``[B, N, H, D]``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ['attention']

# auto-dispatch boundaries (tokens): below → xla, between → fused, above →
# flash.  Set from the 9-point fwd+bwd sweep (tools/attn_sweep.py, v5e,
# ViT-L head geometry H16 D64, B·N≈8k — docs/PERFORMANCE.md "attention
# dispatch thresholds"): XLA wins only at N=256 (1.48 vs 1.62 ms f+b);
# fused wins every measured N from 512 through 16384 (at 16k: 56.0 vs
# flash 65.6 ms f+b; at 8k XLA degenerates to 484 ms).  Flash stays as the
# guard ABOVE the measured range, where the fused kernel's [bq,S] f32
# score rows force bq below an efficient tile and its compile cost grows.
FUSED_TOKEN_THRESHOLD = 512
FLASH_TOKEN_THRESHOLD = 16384


def _on_tpu() -> bool:
    # tunneled TPU plugins report platform 'axon' with a 'TPU ...' device_kind
    dev = jax.devices()[0]
    return dev.platform == 'tpu' or 'tpu' in dev.device_kind.lower()


# -- fused VMEM-resident attention (the ~1k-4k token regime) -------------------
#
# Grid (B, H, S/bq); each program holds one q block [bq, D] plus the FULL
# K/V [S, D] in VMEM (S=4224, D=64 bf16 → 528 KB each), computes the f32
# score block [bq, S] in VMEM, softmaxes, and writes only the [bq, D]
# output.  The backward recomputes scores the same way (FLOP-cheap: the
# whole attention is <1% of a ViT step's FLOPs) and accumulates dK/dV in
# f32 output blocks that stay VMEM-resident across the q-block grid dim
# (their index_map ignores it, so Mosaic revisits the same buffer and
# writes HBM once per (b, h)).
#
# Layout note (measured, do not retry without new evidence): consuming the
# model-native [B, N, H, D] directly with blocks (1, bq, 1, D) is REJECTED
# by Mosaic — the last two BLOCK dims must be divisible by (8, 128) or
# equal the array dims, and the singleton H slot violates that.  Full-H
# blocks (1, bq, H, D) lower, but the backward's dk/dv f32 accumulators
# then cost S*H*D*4 bytes of resident VMEM per program and the in-kernel
# per-head VMEM slices relayout; the explicit swapaxes into [B, H, N, D]
# costs ~12 ms/step of copies at ViT-L 512² and stays.


# Per-kernel VMEM budget for the f32 score-buffer stack.  Mosaic's default
# scoped limit is ~16 MB (measured: bq=384 at s=4224 with the backward's 4
# buffers OOMs at 23.9 MB vs the 16 MB default); v5e physically has 128 MB
# of VMEM, so the kernels raise the limit via CompilerParams and size their
# blocks against this budget instead (leaving room for k/v copies and
# double-buffering of the pipelined inputs).
_SCORE_BUDGET = 30 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def _row_block(s: int, n_bufs: float) -> int:
    """Largest multiple-of-128 divisor of s (itself a multiple of 128) whose
    ``n_bufs`` f32 [bq, s] score-sized VMEM buffers fit ``_SCORE_BUDGET``.
    ``EVER_ATTN_BQ_CAP`` (env, int; 0 = uncapped) caps the block — the
    Mosaic compile-time knob.  The DEFAULT is 384: whole-S blocks at the
    512² train geometry (S=1152) compiled the full ViT-L step in ~42 min
    vs ~5 min with bq=384 revisit blocks, at equal step time (222.1 vs
    the whole-S record 221.6 ms, +0.2%, within drift —
    docs/PERFORMANCE.md 'fused-kernel compile time').  The 1024²
    geometry (S=4224) picks 384 either way.
    ``EVER_ATTN_SCORE_MB`` (env, int) overrides ``_SCORE_BUDGET`` — bigger
    budgets permit larger q-blocks where divisibility allows (block-space
    experiments; pairs with ``EVER_ATTN_PAD_UNIT``)."""
    import os
    budget = (int(os.environ.get('EVER_ATTN_SCORE_MB', '0')) * 1024 * 1024
              or _SCORE_BUDGET)
    cap = int(os.environ.get('EVER_ATTN_BQ_CAP', '384')) or s
    start = min(s, cap)
    for m in range(start - start % 128, 0, -128):
        if s % m == 0 and m * s * 4 * n_bufs <= budget:
            return m
    # no 128-multiple divides s (it is only a multiple of 8 — the 'auto'
    # pad-unit geometries): Mosaic accepts any sublane-aligned q block
    # (probed on chip, docs/PERFORMANCE.md 'pad-unit-8'), so search the
    # 8-aligned divisor ladder
    for m in range(start - start % 8, 0, -8):
        if s % m == 0 and m * s * 4 * n_bufs <= budget:
            return m
    return 128


def pad_target(n: int, unit_env: Optional[str] = None) -> int:
    """Padded sequence length for the fused kernel at ``n`` real tokens.

    ``EVER_ATTN_PAD_UNIT``: an int pads to that multiple (default 128 —
    minimal turn-key alignment); ``'auto'`` picks the SMALLEST 8-aligned
    length whose best q-block is still >=192 rows, falling back to the
    128-multiple.  TPU tiles are (8, 128) in (sublane, lane): the score
    block's LANE dim occupies ceil(S/128) vregs either way, but k/v/o/lse
    HBM rows, the matmul grid and Mosaic's instruction count all scale
    with the real S — e.g. 512-crop ViT N=1029 pads to 1032 (q-block 344)
    instead of 1152, and with stack-level padding the linear layers see
    +0.3%% rows instead of +12%%.  Shared by the kernel pad and
    ``DinoVisionTransformer._stack_pad`` so the two targets always agree.
    """
    import os
    if unit_env is None:
        unit_env = os.environ.get('EVER_ATTN_PAD_UNIT', 'auto')
    if unit_env != 'auto':
        unit = int(unit_env)
        return -(-n // unit) * unit
    t128 = -(-n // 128) * 128
    # chip A/B (v5e, ViT-L, docs/PERFORMANCE.md 'pad-unit-8'): when the
    # 128-multiple target is already close (ratio <= 5%, the stack-padding
    # threshold), KEEP it — its q-block ladder is better (1024²: S=4104
    # forces bq=216 and lost 2.7% to bq=384 at S=4224).  The 8-aligned
    # target wins exactly when it newly brings the pad ratio under the
    # stack-padding threshold (512²: 1029→1032 instead of 1152 turned
    # stack padding ON and removed the per-layer pad/slice copies:
    # 219.5→206.7 ms/step, 40.5→43.1% MFU).
    if (t128 - n) / max(n, 1) <= 0.05:
        return t128
    for t in range(-(-n // 8) * 8, t128, 8):
        if _row_block(t, n_bufs=4.0) >= 192:
            return t
    return t128


def _compiler_params(interpret):
    if interpret:
        return None
    from jax.experimental.pallas import tpu as pltpu
    # b/h are embarrassingly parallel; the q-block dim accumulates into the
    # revisited dk/dv blocks in the backward, so mark it 'arbitrary'
    return pltpu.CompilerParams(
        dimension_semantics=('parallel', 'parallel', 'arbitrary'),
        vmem_limit_bytes=_VMEM_LIMIT)


def _rope_rot(x, sinp, cos):
    """rope(x) = x*cos + rotate_half(x)*sin as ONE lane roll: ``sinp`` is
    the sign-folded table (−sin on the low half-lanes), probed bit-exact
    on chip.  The VPU cost is [rows, D] — negligible next to the [bq, S]
    score passes this fusion avoids re-reading HBM for."""
    d = x.shape[-1]
    return x * cos + jnp.roll(x, d // 2, axis=-1) * sinp


def _rope_inv(y, sinp, cos):
    """Inverse (= transpose) rotation: y*cos − roll(y)*sinp."""
    d = y.shape[-1]
    return y * cos - jnp.roll(y, d // 2, axis=-1) * sinp


def _fa_fwd_kernel(*refs, n, rope):
    # q arrives PRE-SCALED by 1/sqrt(D) (folded into the qkv projection's
    # epilogue outside the kernel — exact in bf16 for power-of-two D) so no
    # [bq,S] scale pass runs here.
    if rope:
        (q_ref, k_ref, v_ref, sq_ref, cq_ref, sk_ref, ck_ref,
         o_ref, lse_ref) = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]        # [bq,D], [S,D]
    if rope:
        # in-kernel RoPE: rotate the VMEM-resident q block and K rows
        # instead of materializing rotated q/k in HBM outside (the r5
        # profile's ~10 ms/step slice_negate rotate pass)
        q = _rope_rot(q, sq_ref[...], cq_ref[...])
        k = _rope_rot(k, sk_ref[...], ck_ref[...])
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # mask pad columns; -1e30 (not -inf) keeps all-pad rows NaN-free
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n, s, -1e30)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)                                     # UNnormalized
    l = jnp.sum(e, axis=1, keepdims=True)
    o = jax.lax.dot_general(e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # normalize on the [bq,D] output instead of the [bq,S] probabilities —
    # one cheap divide instead of an N²-sized one (flash-style)
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)
    lse_ref[0, 0] = m + jnp.log(l)                         # [bq,1] f32


def _fa_bwd_kernel(*refs, n, rope):
    from jax.experimental import pallas as pl

    if rope:
        (q_ref, k_ref, v_ref, sq_ref, cq_ref, sk_ref, ck_ref, o_ref, do_ref,
         lse_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc) = refs
    else:
        (q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
         dq_ref, dk_ref, dv_ref, dk_acc, dv_acc) = refs
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    if rope:
        q = _rope_rot(q, sq_ref[...], cq_ref[...])
        k = _rope_rot(k, sk_ref[...], ck_ref[...])
    o, do, lse = o_ref[0, 0], do_ref[0, 0], lse_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n, s, -1e30)
    # the forward's lse turns recompute-softmax (max, exp, sum, divide —
    # four N² passes) into ONE exp: p is exactly e^(s-m)/l
    p = jnp.exp(s - lse)                                       # [bq,S] f32
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # delta = rowsum(p∘dp) = rowsum(do∘o): a [bq,D] product, not [bq,S]
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=1, keepdims=True)
    ds = (p * (dp - delta)).astype(q.dtype)
    pc = p.astype(v.dtype)
    dq_rot = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if rope:
        # d/d(unrotated q) = R^T · d/d(rotated q): rotation is orthogonal
        dq_rot = _rope_inv(dq_rot, sq_ref[...].astype(jnp.float32),
                           cq_ref[...].astype(jnp.float32))
    dq_ref[0, 0] = dq_rot.astype(dq_ref.dtype)

    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    # contract over the q-block dim: [bq,S]ᵀ[bq,D] → [S,D], f32 accumulate
    # in VMEM scratch; ONE bf16 HBM write per (b,h) instead of f32 outputs
    # + a convert pass outside (the f32 out-blocks cost ~4 ms/step at ViT-L
    # 1024²: 1.6 GB of f32 writes + the cast's read+write per step)
    dk_acc[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dv_acc[...] += jax.lax.dot_general(
        pc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(qi == pl.num_programs(2) - 1)
    def _write():
        dk = dk_acc[...]
        if rope:
            dk = _rope_inv(dk, sk_ref[...].astype(jnp.float32),
                           ck_ref[...].astype(jnp.float32))
        dk_ref[0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _fused_fwd_impl(q, k, v, rope, n, interpret):
    from jax.experimental import pallas as pl

    b, h, s, d = q.shape
    bq = _row_block(s, n_bufs=2.5)      # forward holds ~2 score buffers
    spec_q = pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0))
    spec_kv = pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi, 0, 0))
    spec_l = pl.BlockSpec((1, 1, bq, 1), lambda bi, hi, qi: (bi, hi, qi, 0))
    in_specs = [spec_q, spec_kv, spec_kv]
    args = [q, k, v]
    if rope is not None:
        sinp, cos = rope                                   # [S, D] each
        spec_rq = pl.BlockSpec((bq, d), lambda bi, hi, qi: (qi, 0))
        spec_rk = pl.BlockSpec((s, d), lambda bi, hi, qi: (0, 0))
        in_specs += [spec_rq, spec_rq, spec_rk, spec_rk]
        args += [sinp, cos, sinp, cos]
    return pl.pallas_call(
        functools.partial(_fa_fwd_kernel, n=n, rope=rope is not None),
        grid=(b, h, s // bq),
        in_specs=in_specs,
        out_specs=[spec_q, spec_l],
        out_shape=[jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, s, 1), jnp.float32)],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(*args)


def _fused_bwd_impl(q, k, v, rope, o, lse, do, n, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, s, d = q.shape
    bq = _row_block(s, n_bufs=4.0)      # s/p (aliased), dp, ds live together
    spec_q = pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0))
    spec_kv = pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi, 0, 0))
    spec_l = pl.BlockSpec((1, 1, bq, 1), lambda bi, hi, qi: (bi, hi, qi, 0))
    in_specs = [spec_q, spec_kv, spec_kv]
    args = [q, k, v]
    if rope is not None:
        sinp, cos = rope
        spec_rq = pl.BlockSpec((bq, d), lambda bi, hi, qi: (qi, 0))
        spec_rk = pl.BlockSpec((s, d), lambda bi, hi, qi: (0, 0))
        in_specs += [spec_rq, spec_rq, spec_rk, spec_rk]
        args += [sinp, cos, sinp, cos]
    in_specs += [spec_q, spec_q, spec_l]
    args += [o, do, lse]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_fa_bwd_kernel, n=n, rope=rope is not None),
        grid=(b, h, s // bq),
        in_specs=in_specs,
        out_specs=[spec_q, spec_kv, spec_kv],
        out_shape=[jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, s, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, s, d), v.dtype)],
        scratch_shapes=[pltpu.VMEM((s, d), jnp.float32),
                        pltpu.VMEM((s, d), jnp.float32)],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(*args)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_core(q, k, v, n, interpret):
    return _fused_fwd_impl(q, k, v, None, n, interpret)[0]


def _fused_core_fwd(q, k, v, n, interpret):
    o, lse = _fused_fwd_impl(q, k, v, None, n, interpret)
    return o, (q, k, v, o, lse)


def _fused_core_bwd(n, interpret, res, do):
    q, k, v, o, lse = res
    return _fused_bwd_impl(q, k, v, None, o, lse, do, n, interpret)


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


# RoPE variant: sinp/cos ride as primal args (their cotangents are zero —
# the tables are static buffers, ``RopePositionEmbedding`` has no learned
# params) so the kernels rotate in VMEM instead of XLA materializing
# rotated q/k in HBM.
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_core_rope(q, k, v, sinp, cos, n, interpret):
    return _fused_fwd_impl(q, k, v, (sinp, cos), n, interpret)[0]


def _fused_core_rope_fwd(q, k, v, sinp, cos, n, interpret):
    o, lse = _fused_fwd_impl(q, k, v, (sinp, cos), n, interpret)
    return o, (q, k, v, sinp, cos, o, lse)


def _fused_core_rope_bwd(n, interpret, res, do):
    q, k, v, sinp, cos, o, lse = res
    dq, dk, dv = _fused_bwd_impl(q, k, v, (sinp, cos), o, lse, do, n,
                                 interpret)
    return dq, dk, dv, jnp.zeros_like(sinp), jnp.zeros_like(cos)


_fused_core_rope.defvjp(_fused_core_rope_fwd, _fused_core_rope_bwd)


def _fused(q, k, v, interpret: Optional[bool] = None, layout: str = 'bnhd',
           n_valid: Optional[int] = None, rope=None):
    """VMEM-resident attention; pads N to a 128 multiple.

    ``rope=(sin, cos)`` ([N, D] angle tables, identity rows where tokens
    must not rotate): the rotation happens IN-KERNEL on the VMEM-resident
    blocks — q/k reach the kernel unrotated, dq/dk leave inverse-rotated.
    CONTRACT: tables must be half-tiled (``sin[:, :D/2] == sin[:, D/2:]``,
    the standard RoPE layout) — the backward treats the rotation's
    transpose as its inverse, which holds exactly for tied tables.

    ``layout='bnhd'`` (flax convention) transposes in/out of the kernel's
    native [B,H,N,D]; ``layout='bhnd'`` consumes/produces [B,H,N,D]
    directly — the caller owns the layout and the per-tensor swapaxes
    (≈12 ms/step at ViT-L 512², docs/PERFORMANCE.md) disappear.

    ``n_valid``: the input arrives ALREADY padded (stack-level padding —
    the ViT pads its token sequence once after patch embed instead of
    per-layer around every kernel call) and only the first ``n_valid``
    tokens are real.  Pad columns are masked out of the softmax; the
    output keeps the padded length."""
    if interpret is None:
        interpret = not _on_tpu()
    if layout == 'bhnd':
        b, h, n, d = q.shape
        qt, kt, vt = q, k, v
    else:
        b, n, h, d = q.shape
        qt, kt, vt = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))   # [B,H,N,D]
    # pad unit trades pad waste for block choices: S must be a multiple of
    # every q-block, so the unit decides which bq values are legal (e.g.
    # N=4101: unit 128 → S=4224=2^7·3·11 allows bq∈{384,1408,4224};
    # 'auto' → S=4104 with bq=216).  See :func:`pad_target`.
    target = pad_target(n)
    n_real = n if n_valid is None else n_valid
    # fold 1/sqrt(D) into q OUTSIDE the custom_vjp: XLA fuses the multiply
    # into the producing elementwise chain (free), the kernels skip an N²
    # scale pass in fwd AND bwd, and autodiff routes the scale into dq.
    # For power-of-two D the bf16 multiply is exact.
    qt = qt * jnp.asarray(1.0 / (d ** 0.5), qt.dtype)
    if target != n:
        pad = ((0, 0), (0, 0), (0, target - n), (0, 0))
        qt, kt, vt = (jnp.pad(t, pad) for t in (qt, kt, vt))
    if rope is not None:
        sin, cos = rope
        # sign-fold so rotate_half is ONE lane roll in-kernel (probed
        # bit-exact); pad rows are identity (sin'=0, cos=1)
        sign = jnp.where(jnp.arange(d) < d // 2, -1.0, 1.0)
        sinp = (sin.astype(jnp.float32) * sign[None, :]).astype(qt.dtype)
        cosp = cos.astype(qt.dtype)
        if target != sin.shape[0]:
            t = target - sin.shape[0]
            sinp = jnp.concatenate(
                [sinp, jnp.zeros((t, d), sinp.dtype)], 0)
            cosp = jnp.concatenate(
                [cosp, jnp.ones((t, d), cosp.dtype)], 0)
        sinp = jax.lax.stop_gradient(sinp)
        cosp = jax.lax.stop_gradient(cosp)
        out = _fused_core_rope(qt, kt, vt, sinp, cosp, n_real,
                               interpret)[:, :, :n]
    else:
        out = _fused_core(qt, kt, vt, n_real, interpret)[:, :, :n]
    return out if layout == 'bhnd' else jnp.swapaxes(out, 1, 2)


def _pick_block(n: int, cap: int) -> int:
    """Largest power-of-two block <= cap that divides n (the kernel asserts
    divisibility).  Defaults in jax are 128 everywhere, which at 16k tokens
    makes a 128x grid of tiny invocations — measured 1.6x slower than XLA
    until the blocks are raised (docs/PERFORMANCE.md 'flash attention')."""
    b = cap
    while b > 128 and n % b:
        b //= 2
    return b if n % b == 0 else 128


def _flash(q, k, v, block_q: Optional[int] = None,
           block_k: Optional[int] = None, layout: str = 'bnhd',
           n_valid: Optional[int] = None):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    n_axis = 2 if layout == 'bhnd' else 1
    b, n = q.shape[0], q.shape[n_axis]
    d = q.shape[-1]
    # The kernel asserts block divisibility, and real ViT token counts are
    # patches + prefix (cls + storage), e.g. 4101 — never a block multiple.
    # Pad to one and mask the pad tokens out with segment ids (real tokens
    # segment 0, pads segment 1: pad keys never reach real queries).
    unit = 512 if n > 512 else 128
    target = -(-n // unit) * unit
    n_real = n if n_valid is None else n_valid
    seg = None
    if target != n:
        pad = [(0, 0)] * 4
        pad[n_axis] = (0, target - n)
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
    if target != n_real:
        ids = (jnp.arange(target) >= n_real).astype(jnp.int32)[None].repeat(b, 0)
        seg = SegmentIds(q=ids, kv=ids)
    # pallas kernel wants [B, H, N, D] — 'bhnd' input is already there
    if layout == 'bhnd':
        qt, kt, vt = q, k, v
    else:
        qt, kt, vt = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
    bq = block_q or _pick_block(target, 1024)
    bk = block_k or _pick_block(target, 1024)
    bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                    block_q_major_dkv=bq, block_k_major_dkv=bk,
                    block_k_dkv=bk, block_q_dkv=bq,
                    block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)
    out = flash_attention(qt, kt, vt, segment_ids=seg, causal=False,
                          sm_scale=1.0 / (d ** 0.5), block_sizes=bs)
    if layout == 'bhnd':
        return out[:, :, :n]
    return jnp.swapaxes(out, 1, 2)[:, :n]


def _rope_outside(q, k, rope, layout):
    """Apply RoPE with a plain XLA elementwise pass (the non-fused paths)."""
    sin, cos = rope
    if layout == 'bhnd':
        sin4 = sin[None, None, :, :].astype(q.dtype)
        cos4 = cos[None, None, :, :].astype(q.dtype)
    else:
        sin4 = sin[None, :, None, :].astype(q.dtype)
        cos4 = cos[None, :, None, :].astype(q.dtype)

    def rot(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    return q * cos4 + rot(q) * sin4, k * cos4 + rot(k) * sin4


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              impl: Optional[str] = None,
              layout: str = 'bnhd',
              n_valid: Optional[int] = None,
              rope=None) -> jnp.ndarray:
    """Multi-head attention with automatic kernel choice.

    ``impl``: None (auto) | 'xla' | 'fused' | 'flash'.
    ``layout``: 'bnhd' ([B, N, H, D], the flax convention) or 'bhnd'
    ([B, H, N, D], the TPU kernels' native layout — callers that produce
    q/k/v pre-transposed skip the per-call swapaxes copies).
    ``n_valid``: the sequence is already padded and only the first
    ``n_valid`` tokens are real (stack-level padding); pad keys are
    masked out of every softmax, pad query rows produce garbage that the
    caller discards.
    ``rope``: optional ``(sin, cos)`` [N, D] angle tables (identity rows
    where tokens must not rotate).  The fused kernel rotates IN-KERNEL
    (``EVER_ROPE_KERNEL=0`` forces the XLA pre-rotation everywhere);
    other impls rotate with a plain elementwise pass first.
    """
    import os
    n = q.shape[2 if layout == 'bhnd' else 1]
    if impl is None:
        if _on_tpu():
            if n > FLASH_TOKEN_THRESHOLD:
                impl = 'flash'
            elif n >= FUSED_TOKEN_THRESHOLD:
                impl = 'fused'
            else:
                impl = 'xla'
        else:
            impl = 'xla'
    if impl == 'fused':
        if rope is not None and os.environ.get('EVER_ROPE_KERNEL', '1') != '1':
            q, k = _rope_outside(q, k, rope, layout)
            rope = None
        return _fused(q, k, v, layout=layout, n_valid=n_valid, rope=rope)
    if rope is not None:
        q, k = _rope_outside(q, k, rope, layout)
    if impl == 'flash':
        if _on_tpu():
            # on real hardware a flash failure is a real bug — do NOT
            # silently downgrade to the O(N^2) path this kernel exists
            # to avoid
            return _flash(q, k, v, layout=layout, n_valid=n_valid)
        try:
            return _flash(q, k, v, layout=layout, n_valid=n_valid)
        except Exception:
            impl = 'xla'   # interpret/CPU fallback
    mask = None
    if n_valid is not None and n_valid < n:
        # key-side mask only: pad QUERY rows may compute garbage (their
        # outputs are discarded), pad KEY columns must never leak in
        mask = (jnp.arange(n) < n_valid)[None, None, None, :]
    if layout == 'bhnd':
        out = jax.nn.dot_product_attention(*(jnp.swapaxes(t, 1, 2)
                                             for t in (q, k, v)), mask=mask)
        return jnp.swapaxes(out, 1, 2)
    return jax.nn.dot_product_attention(q, k, v, mask=mask)
