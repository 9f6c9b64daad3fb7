"""Int8 quantization kernels (Pallas) + a quantized Dense layer for serving.

The reference ships GPU-only low-precision linears: fp8 via
``torch._scaled_mm`` (``ever/module/dinov3/layers/fp8_linear.py:46-141``) and
2:4 structured sparsity via cuSPARSELt (``sparse_linear.py:19-90``).  The TPU
production-serving analog is int8: this module provides

- :func:`quantize_int8` — a Pallas kernel computing the per-tensor absmax
  scale and stochastically-rounded int8 values in ONE VMEM pass (the PRNG +
  ``pltpu.stochastic_round`` path from the TPU kernel playbook);
- :func:`int8_matmul` — int8×int8 matmul with fp32 rescale, MXU-tiled;
- :class:`QuantDense` — a drop-in serving layer holding int8 weights +
  scale, built from trained fp32 params via :func:`quantize_params`.

CPU/test fallback: kernels run under ``interpret=True`` off-TPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ['quantize_int8', 'int8_matmul', 'QuantDense', 'quantize_params']


def _on_tpu() -> bool:
    # tunneled TPU plugins report platform 'axon' with a 'TPU ...'
    # device_kind (same check as ops/attention.py:77, core/to.py:59)
    dev = jax.devices()[0]
    return dev.platform == 'tpu' or 'tpu' in dev.device_kind.lower()


def _quant_kernel(seed_ref, scale_ref, x_ref, values_ref):
    """Quantize ONE (bm, bn) tile given the precomputed per-tensor scale.

    The global abs-max reduction runs in plain XLA beforehand; tiling the
    rounding kernel over an (M/bm, N/bn) grid keeps VMEM bounded at any
    activation size (a whole-operand block failed at serving sizes — the
    same fix int8_matmul carries)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # unique PRNG stream per grid tile
    pltpu.prng_seed(seed_ref[0]
                    + pl.program_id(0) * pl.num_programs(1)
                    + pl.program_id(1))
    scaled = x_ref[:] / scale_ref[0]
    # stochastic round to int: floor(x + u), u ~ U[0, 1) from the hardware
    # PRNG (pltpu.stochastic_round only targets bf16/fp8 dtypes)
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
    # Mosaic can't cast uint32→f32 directly; the >>8 result fits in 24 bits
    # so the int32 view is non-negative
    u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    values_ref[:] = jnp.clip(jnp.floor(scaled + u), -128, 127).astype(jnp.int8)


def quantize_int8(x: jnp.ndarray, seed: int = 0,
                  interpret: Optional[bool] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor int8 quantization with stochastic rounding.

    Returns ``(values int8, scale fp32[1,1])`` such that
    ``values * scale ≈ x``.  2-D inputs only (reshape first).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = not _on_tpu()
    if x.ndim != 2:
        raise ValueError('quantize_int8 expects 2-D input')
    x = x.astype(jnp.float32)
    if interpret:
        # CPU fallback: the TPU PRNG primitives (pltpu.prng_seed /
        # stochastic_round) have no interpret-mode lowering — use
        # round-to-nearest (same scale contract, deterministic)
        abs_max = jnp.max(jnp.abs(x))
        scale = jnp.maximum(abs_max / 127.0, 1e-8).reshape(1, 1)
        values = jnp.clip(jnp.round(x / scale), -128, 127).astype(jnp.int8)
        return values, scale
    # pass 1 (XLA): the per-tensor scale — a plain reduction handles any
    # operand size without VMEM constraints
    abs_max = jnp.max(jnp.abs(x))
    scale = jnp.maximum(abs_max / 127.0, 1e-8).reshape(1, 1)
    # pass 2 (pallas, gridded): stochastic rounding per (bm, bn) tile
    bm, bn = 256, 1024
    m, n = x.shape
    pm, pn = (-m) % bm, (-n) % bn
    xp = jnp.pad(x, ((0, pm), (0, pn))) if (pm or pn) else x
    seed_arr = jnp.asarray([seed], jnp.int32)
    values = pl.pallas_call(
        _quant_kernel,
        grid=(xp.shape[0] // bm, xp.shape[1] // bn),
        out_shape=jax.ShapeDtypeStruct(xp.shape, jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(seed_arr, scale.reshape(1), xp)
    if pm or pn:
        values = values[:m, :n]
    return values, scale


def _matmul_kernel(x_ref, w_ref, xs_ref, ws_ref, out_ref):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out_ref[:] = acc.astype(jnp.float32) * (xs_ref[0, 0] * ws_ref[0, 0])


def int8_matmul(x_q: jnp.ndarray, x_scale: jnp.ndarray,
                w_q: jnp.ndarray, w_scale: jnp.ndarray,
                interpret: Optional[bool] = None,
                block_m: int = 256, block_n: int = 256) -> jnp.ndarray:
    """``(x_q · w_q) * (x_scale * w_scale)`` with int32 MXU accumulation.

    Tiled over an (M/bm, N/bn) grid with the full K contraction per tile
    (bm·K + K·bn int8 operand blocks + a bm·bn fp32 accumulator fit VMEM for
    any realistic dense layer) — a single whole-operand block would exceed
    VMEM for large token batches.  Indivisible M/N are zero-padded (zero
    rows/cols contribute nothing) and the output cropped.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = not _on_tpu()
    m, k = x_q.shape
    k2, n = w_q.shape
    assert k == k2
    bm, bn = min(block_m, m), min(block_n, n)
    pm, pn = (-m) % bm, (-n) % bn
    if pm:
        x_q = jnp.pad(x_q, ((0, pm), (0, 0)))
    if pn:
        w_q = jnp.pad(w_q, ((0, 0), (0, pn)))
    out = pl.pallas_call(
        _matmul_kernel,
        grid=((m + pm) // bm, (n + pn) // bn),
        out_shape=jax.ShapeDtypeStruct((m + pm, n + pn), jnp.float32),
        in_specs=[pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
                  pl.BlockSpec((k, bn), lambda i, j: (0, j)),
                  pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        interpret=interpret,
    )(x_q, w_q, x_scale, w_scale)
    return out[:m, :n] if (pm or pn) else out


def quantize_params(kernel: jnp.ndarray, seed: int = 0):
    """Quantize a [in, out] dense kernel for serving."""
    w_q, w_scale = quantize_int8(kernel, seed)
    return dict(kernel_q=w_q, scale=w_scale)


class QuantDense:
    """Serving-time int8 dense layer: y = int8_matmul(q(x), W_q) + b.

    Built from trained params::

        qd = QuantDense.from_params(params['head']['fc'])
        y = qd(x)                    # x: [M, in] fp32/bf16
    """

    def __init__(self, kernel_q, w_scale, bias=None):
        self.kernel_q = kernel_q
        self.w_scale = w_scale
        self.bias = bias

    @classmethod
    def from_params(cls, dense_params: dict, seed: int = 0) -> 'QuantDense':
        q = quantize_params(jnp.asarray(dense_params['kernel'], jnp.float32), seed)
        bias = dense_params.get('bias')
        return cls(q['kernel_q'], q['scale'],
                   None if bias is None else jnp.asarray(bias, jnp.float32))

    def __call__(self, x: jnp.ndarray, seed: int = 1) -> jnp.ndarray:
        orig_shape = x.shape
        x2 = x.reshape(-1, orig_shape[-1])
        x_q, x_scale = quantize_int8(x2, seed)
        y = int8_matmul(x_q, x_scale, self.kernel_q, self.w_scale)
        if self.bias is not None:
            y = y + self.bias
        return y.reshape(*orig_shape[:-1], y.shape[-1])
