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


def _flash(q, k, v):
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention
    # pallas kernel wants [B, H, N, D]
    qt, kt, vt = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
    d = q.shape[-1]
    out = flash_attention(qt, kt, vt, causal=False, sm_scale=1.0 / (d ** 0.5))
    return jnp.swapaxes(out, 1, 2)


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
        try:
            return _flash(q, k, v)
        except Exception:
            impl = 'xla'   # interpret/CPU fallback
    return jax.nn.dot_product_attention(q, k, v)
