"""Validate the gridded int8 quantize/matmul Pallas kernels on the real chip.

The CPU tests run interpret-mode fallbacks; this drives the TPU path at
serving sizes (the whole-operand VMEM failure mode) and checks numerics
against the fp32 reference.

    python tools/quant_check.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ever_tpu.ops.quant import int8_matmul, quantize_int8

    rng = np.random.default_rng(0)
    for (m, k) in ((8 * 4101, 4096), (4096, 16384), (512, 768)):
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        t0 = time.perf_counter()
        q, s = quantize_int8(x, seed=1)
        err = float(jnp.max(jnp.abs(q.astype(jnp.float32) * s - x)))
        dt = time.perf_counter() - t0
        scale = float(s.reshape(()))
        print(f'quantize [{m},{k}]: max|dequant-x|={err:.4g} '
              f'(scale {scale:.3g}; stochastic bound ~scale) '
              f'wall {dt*1e3:.1f} ms (incl compile)')
        assert err <= 1.01 * scale, 'stochastic rounding error exceeds 1 LSB'

    xm, wk = 8 * 4101, 4096
    w = jnp.asarray(rng.normal(size=(wk, 1024)).astype(np.float32) * 0.02)
    x = jnp.asarray(rng.normal(size=(xm, wk)).astype(np.float32))
    xq, xs = quantize_int8(x, seed=2)
    wq, ws = quantize_int8(w, seed=3)
    out = int8_matmul(xq, xs, wq, ws)
    ref = x @ w
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    print(f'int8_matmul [{xm},{wk}]x[{wk},1024]: rel err {rel:.4g}')
    assert rel < 0.02
    # timing: int8 vs fp32/bf16 matmul
    for name, fn in (
            ('int8', lambda: int8_matmul(xq, xs, wq, ws)),
            ('bf16', lambda: (x.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16))),
            ('fp32', lambda: x @ w)):
        fn()  # compile
        t0 = time.perf_counter()
        for _ in range(10):
            r = fn()
        _ = float(jax.device_get(jnp.sum(r[:1, :1])))   # tunnel-safe sync
        print(f'  {name}: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms')
    print('QUANT CHECK OK')


if __name__ == '__main__':
    main()
