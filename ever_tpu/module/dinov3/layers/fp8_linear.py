"""TPU substitute for the reference fp8 linear (``dinov3/layers/fp8_linear.py:17-141``).

The reference quantizes activations+weights to float8_e4m3 with per-tensor
amax scaling and calls ``torch._scaled_mm`` (cuBLAS).  TPU v5e's low-precision
MXU path is int8; this module keeps the reference surface — ``scale`` /
``matmul`` / ``Fp8Linear`` — with the SAME per-tensor amax-scaling scheme but
int8 storage and an int32-accumulating Pallas matmul
(:mod:`ever_tpu.ops.quant`).  Training uses a straight-through estimator
exactly like the reference's ``Fp8LinearFn`` (quantized forward, full-precision
backward).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

EPS = 1e-12
INT8_MAX = 127.0

__all__ = ['scale', 'matmul', 'fp8_linear', 'Fp8LinearFn', 'Fp8Linear',
           'Fp8LinearKMaskedBias', 'convert_linears_to_fp8']


def scale(t: jnp.ndarray, amax_t: jnp.ndarray):
    """Per-tensor amax quantization (parity: ``fp8_linear.py:17-21``; int8
    takes fp8_e4m3's place on TPU)."""
    scale_t = jnp.maximum(amax_t.astype(jnp.float32), EPS) / INT8_MAX
    t_q = jnp.clip(jnp.round(t / scale_t), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return t_q, scale_t


def matmul(first, amax_first, second_t, amax_second_t, bias=None):
    """Quantized ``first @ second_t.T`` with post-hoc rescale (parity:
    ``fp8_linear.py:24-43``)."""
    f_q, s_f = scale(first, amax_first)
    w_q, s_w = scale(second_t, amax_second_t)
    out = jax.lax.dot_general(
        f_q, w_q.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    out = out * (s_f * s_w)
    if bias is not None:
        out = out + bias
    return out


@jax.custom_vjp
def fp8_linear(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray]):
    """Quantized forward, straight-through full-precision backward (parity:
    ``Fp8LinearFn``, ``fp8_linear.py:46-81``)."""
    return matmul(x, jnp.max(jnp.abs(x)), w, jnp.max(jnp.abs(w)), b)


def _fp8_fwd(x, w, b):
    return fp8_linear(x, w, b), (x, w, b is not None)


def _fp8_bwd(res, g):
    x, w, has_b = res
    gx = g @ w                            # [M,O] @ [O,I] -> [M,I]
    gw = g.T @ x                          # [O,M] @ [M,I] -> [O,I]
    gb = jnp.sum(g, axis=0) if has_b else None
    return gx, gw, gb


fp8_linear.defvjp(_fp8_fwd, _fp8_bwd)

# reference spelling for the autograd function object
Fp8LinearFn = fp8_linear


class Fp8Linear(nn.Module):
    """Drop-in quantized Dense (parity: ``fp8_linear.py:84-88``)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features))
        b = (self.param('bias', nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        y = fp8_linear(flat, w.T.astype(jnp.float32), b)
        return y.reshape(*x.shape[:-1], self.features).astype(x.dtype)


class Fp8LinearKMaskedBias(nn.Module):
    """Quantized fused-QKV Dense with the K-third bias mask (parity:
    ``fp8_linear.py:91-96`` over ``attention.py:30-40``)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert self.features % 3 == 0
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features))
        b = self.param('bias', nn.initializers.zeros, (self.features,))
        third = self.features // 3
        default = jnp.concatenate([jnp.ones((third,)), jnp.zeros((third,)),
                                   jnp.ones((third,))])
        mask = self.variable('constants', 'bias_mask', lambda: default)
        flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        y = fp8_linear(flat, w.T.astype(jnp.float32),
                       (b * mask.value).astype(jnp.float32))
        return y.reshape(*x.shape[:-1], self.features).astype(x.dtype)


def convert_linears_to_fp8(root_module, *, filter: str = '.*'):
    """Reference surface (``fp8_linear.py:99-141``).

    The torch original swaps ``nn.Linear`` children in place.  Flax modules
    are immutable definitions — quantization is chosen when the model is
    DEFINED (use :class:`Fp8Linear` / ``ops.quant.QuantDense``) or applied to
    trained params at serving time (``ops.quant.quantize_params``).  This
    shim exists so ported call-sites fail loudly with that guidance instead
    of silently doing nothing.
    """
    raise NotImplementedError(
        'flax modules are immutable: build the model with Fp8Linear (this '
        'module) in place of Dense, or quantize trained params for serving '
        'via ever_tpu.ops.quant.quantize_params / QuantDense.')
