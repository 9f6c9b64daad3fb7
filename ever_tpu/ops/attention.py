"""Attention dispatch: XLA SDPA or the Pallas TPU flash kernel.

For the token counts of standard tiles (512²/16 → ~1k tokens) XLA's fused
SDPA is already MXU-bound; for big-tile dense inference (2048²/16 → 16k
tokens) the O(N²) score matrix stops fitting in VMEM and the block-wise
Pallas flash kernel wins.  ``attention()`` picks automatically (or force via
``impl``).

Shapes follow flax convention: q/k/v are ``[B, N, H, D]``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ['attention']

# above this many tokens the quadratic score matrix justifies flash
FLASH_TOKEN_THRESHOLD = 4096


def _pick_block(n: int, cap: int) -> int:
    """Largest power-of-two block <= cap that divides n (the kernel asserts
    divisibility).  Defaults in jax are 128 everywhere, which at 16k tokens
    makes a 128x grid of tiny invocations — measured 1.6x slower than XLA
    until the blocks are raised (docs/PERFORMANCE.md 'flash attention')."""
    b = cap
    while b > 128 and n % b:
        b //= 2
    return b if n % b == 0 else 128


def _flash(q, k, v, block_q: Optional[int] = None, block_k: Optional[int] = None):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    b, n, h, d = q.shape
    # The kernel asserts block divisibility, and real ViT token counts are
    # patches + prefix (cls + storage), e.g. 4101 — never a block multiple.
    # Pad to one and mask the pad tokens out with segment ids (real tokens
    # segment 0, pads segment 1: pad keys never reach real queries).
    unit = 512 if n > 512 else 128
    target = -(-n // unit) * unit
    seg = None
    if target != n:
        pad = target - n
        q, k, v = (jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0)))
                   for t in (q, k, v))
        ids = (jnp.arange(target) >= n).astype(jnp.int32)[None].repeat(b, 0)
        seg = SegmentIds(q=ids, kv=ids)
    # pallas kernel wants [B, H, N, D]
    qt, kt, vt = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
    bq = block_q or _pick_block(target, 1024)
    bk = block_k or _pick_block(target, 1024)
    bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                    block_q_major_dkv=bq, block_k_major_dkv=bk,
                    block_k_dkv=bk, block_q_dkv=bq,
                    block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)
    out = flash_attention(qt, kt, vt, segment_ids=seg, causal=False,
                          sm_scale=1.0 / (d ** 0.5), block_sizes=bs)
    return jnp.swapaxes(out, 1, 2)[:, :n]


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              impl: Optional[str] = None) -> jnp.ndarray:
    """Multi-head attention over [B, N, H, D] with automatic kernel choice.

    ``impl``: None (auto) | 'xla' | 'flash'.
    """
    n = q.shape[1]
    if impl is None:
        dev = jax.devices()[0]
        # tunneled TPU plugins report platform 'axon' with a 'TPU ...'
        # device_kind — check both or flash never auto-dispatches there
        on_tpu = dev.platform == 'tpu' or 'tpu' in dev.device_kind.lower()
        impl = 'flash' if (on_tpu and n >= FLASH_TOKEN_THRESHOLD) else 'xla'
    if impl == 'flash':
        dev = jax.devices()[0]
        on_tpu = dev.platform == 'tpu' or 'tpu' in dev.device_kind.lower()
        if on_tpu:
            # on real hardware a flash failure is a real bug — do NOT
            # silently downgrade to the O(N^2) path this kernel exists
            # to avoid
            return _flash(q, k, v)
        try:
            return _flash(q, k, v)
        except Exception:
            impl = 'xla'   # interpret/CPU fallback
    return jax.nn.dot_product_attention(q, k, v)
