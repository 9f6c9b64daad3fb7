"""Validate the Pallas flash-attention path on the real chip (VERDICT r1 #7).

Times + numerics-checks ``ops.attention`` impl='flash' vs 'xla' at the token
counts of big-tile ViT dense inference, then runs a full vit_small dense
forward at >= 4096 tokens under both impls.  Records whether the auto
dispatch (``FLASH_TOKEN_THRESHOLD``) picks the faster kernel — results go to
docs/PERFORMANCE.md.

    python tools/flash_attn_check.py            # on the TPU
"""

from __future__ import annotations

import time

import numpy as np


def sync(x):
    import jax
    import jax.numpy as jnp
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def bench(fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000, out


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from ever_tpu.ops.attention import attention

    dev = jax.devices()[0]
    print(f'device: {dev.device_kind} (platform={dev.platform})')

    rng = np.random.default_rng(0)
    print(f'{"tokens":>8} {"heads":>5} {"xla ms":>9} {"flash ms":>9} '
          f'{"speedup":>8} {"max|diff|":>10} {"auto":>6}')
    for n, h in ((1024, 6), (4096, 6), (4101, 6), (8192, 12), (16384, 12),
                 (16389, 12)):
        d = 64
        q, k, v = (jnp.asarray(rng.normal(size=(1, n, h, d)),
                               jnp.bfloat16) for _ in range(3))
        xla_fn = jax.jit(partial(attention, impl='xla'))
        t_x, o_x = bench(xla_fn, q, k, v)
        try:
            flash_fn = jax.jit(partial(attention, impl='flash'))
            t_f, o_f = bench(flash_fn, q, k, v)
            diff = float(jnp.max(jnp.abs(o_x.astype(jnp.float32) -
                                         o_f.astype(jnp.float32))))
        except Exception as e:
            t_f, diff = float('nan'), float('nan')
            print(f'  flash failed at n={n}: {type(e).__name__}: {e}')
            continue
        auto_fn = jax.jit(attention)
        t_a, _ = bench(auto_fn, q, k, v)
        auto_pick = 'flash' if abs(t_a - t_f) < abs(t_a - t_x) else 'xla'
        print(f'{n:>8} {h:>5} {t_x:>9.3f} {t_f:>9.3f} {t_x / t_f:>8.2f} '
              f'{diff:>10.4f} {auto_pick:>6}')

    # block-size sweep at the big-tile point (defaults are 128 everywhere)
    from ever_tpu.ops.attention import _flash
    n, h, d = 16384, 12, 64
    q, k, v = (jnp.asarray(rng.normal(size=(1, n, h, d)),
                           jnp.bfloat16) for _ in range(3))
    for bq, bk in ((128, 128), (256, 256), (512, 512), (512, 1024),
                   (1024, 1024), (1024, 2048), (2048, 2048)):
        try:
            fn = jax.jit(partial(_flash, block_q=bq, block_k=bk))
            t, _ = bench(fn, q, k, v)
            print(f'  flash 16384x12 block_q={bq:<5d} block_k={bk:<5d} {t:8.3f} ms')
        except Exception as e:
            print(f'  flash 16384x12 block_q={bq} block_k={bk} FAILED: '
                  f'{type(e).__name__}')

    # gradient parity through the padded segment-ids path (training big-tile
    # ViTs uses the kernel's backward; pads are sliced so no grad leaks)
    n, h, d = 4101, 6, 64
    q, k, v = (jnp.asarray(rng.normal(size=(1, n, h, d)), jnp.bfloat16)
               for _ in range(3))

    def loss(impl):
        def f(args):
            o = attention(*args, impl=impl)
            return jnp.sum(jnp.square(o.astype(jnp.float32)))
        return f

    gx = jax.jit(jax.grad(loss('xla')))((q, k, v))
    gf = jax.jit(jax.grad(loss('flash')))((q, k, v))
    rel = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
                    / (jnp.max(jnp.abs(a.astype(jnp.float32))) + 1e-9))
              for a, b in zip(gx, gf))
    print(f'grad parity at n={n} (padded): max rel diff {rel:.4f}')

    # full ViT dense forward at 4096 tokens (1024² image, patch 16)
    from ever_tpu.core import builder
    for impl in ('xla', 'flash'):
        vit = builder.make_model({'type': 'vit_small', 'params': dict(
            attn_impl=impl, dtype='bfloat16')})
        x = jnp.asarray(rng.normal(size=(1, 1024, 1024, 3)), jnp.bfloat16)
        variables = vit.init({'params': jax.random.key(0)}, x)
        fwd = jax.jit(lambda xx, vv=variables, m=vit:
                      m.apply(vv, xx)['x_norm_patchtokens'])
        t, out = bench(fwd, x, iters=5)
        print(f'vit_small dense 1024² ({out.shape[1]} tokens) impl={impl}: '
              f'{t:.1f} ms')


if __name__ == '__main__':
    main()
