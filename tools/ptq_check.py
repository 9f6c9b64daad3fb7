"""On-TPU validation of the int8 PTQ serving path (ops/ptq.py).

Times FarSeg-R50 512² whole-scene tiled inference fp(bf16) vs int8-PTQ with
bench.py's exact methodology (bf16 4096² scene, tile_batch=8, host-fetch
sync), and reports numeric agreement (argmax match + logit cosine).

Run bounded: ``timeout 1800 python tools/ptq_check.py``.
"""
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:  # robust to any launch cwd
    sys.path.insert(0, _REPO)


def vit_mode():
    """DINOv3 ViT dense serving fp vs int8 at 1024² (flash attention on)."""
    import jax
    import jax.numpy as jnp

    import ever_tpu  # noqa: F401
    from ever_tpu.core import builder
    from ever_tpu.ops import make_ptq_predict_fn, ptq_quantize

    rng = np.random.default_rng(0)
    print('device:', jax.devices()[0].device_kind)
    model = builder.make_model({'type': 'vit_large', 'params': dict(
        dtype='bfloat16')})
    x = jnp.asarray(rng.normal(size=(1, 1024, 1024, 3)).astype(np.float32))
    variables = model.init({'params': jax.random.key(0)}, x)
    qv = ptq_quantize(model, variables, [x], apply_kwargs={},
                      min_in_features=64)
    n_q = len(jax.tree_util.tree_leaves(qv['ptq'])) // 3
    print(f'{n_q} linears quantized')

    def fp(t):
        return model.apply(variables, t)['x_norm_patchtokens']

    q = make_ptq_predict_fn(model, qv)
    results = {}
    outs = {}
    for name, fn in [('fp_bf16', fp),
                     ('int8', lambda t: q(t)['x_norm_patchtokens'])]:
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jfn(x)
        _ = float(jax.device_get(jnp.sum(out[0, 0])))
        print(f'{name}: compile {time.perf_counter()-t0:.1f}s')
        t0 = time.perf_counter()
        for _ in range(10):
            out = jfn(x)
        _ = float(jax.device_get(jnp.sum(out[0, 0])))
        results[name] = (time.perf_counter() - t0) / 10 * 1e3
        outs[name] = np.asarray(jax.device_get(out), np.float32)
        print(f'{name}: {results[name]:.2f} ms/forward')
    a = outs['fp_bf16'].ravel() - outs['fp_bf16'].mean()
    b = outs['int8'].ravel() - outs['int8'].mean()
    cos = float((a * b).sum() /
                (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    print(json.dumps({
        'fp_ms': round(results['fp_bf16'], 2),
        'int8_ms': round(results['int8'], 2),
        'speedup': round(results['fp_bf16'] / results['int8'], 3),
        'feature_cosine': round(cos, 5),
        'n_linears_quantized': n_q,
    }))


def main():
    import jax
    import jax.numpy as jnp

    import ever_tpu  # noqa: F401  (enables the persistent compile cache)
    from ever_tpu.core import builder
    from ever_tpu.magic.tiled import tiled_inference
    from ever_tpu.ops import make_ptq_predict_fn, ptq_quantize

    rng = np.random.default_rng(0)
    print('device:', jax.devices()[0].device_kind)

    model = builder.make_model({'type': 'FarSeg', 'params': dict(
        encoder=dict(resnet_type='resnet50', stem='s2d', pack2_layer1=True),
        classes=7, dtype='bfloat16')})
    x0 = jnp.asarray(rng.normal(size=(8, 512, 512, 3)).astype(np.float32))
    variables = model.init({'params': jax.random.key(0)}, x0)

    calib = [jnp.asarray(rng.normal(size=(8, 512, 512, 3)).astype(np.float32))
             for _ in range(2)]
    t0 = time.perf_counter()
    qv = ptq_quantize(model, variables, calib,
                      apply_kwargs=dict(train=False), min_in_features=64)
    n_q = len(jax.tree_util.tree_leaves(qv['ptq'])) // 3
    print(f'calibrate+quantize: {time.perf_counter()-t0:.1f}s, '
          f'{n_q} convs quantized')

    def predict_fp(tiles):
        return model.apply(variables, tiles, train=False)

    predict_q = make_ptq_predict_fn(model, qv, train=False)

    scene = jnp.asarray(rng.normal(size=(4096, 4096, 3)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    n_tiles = 64
    results = {}
    outs = {}
    for name, fn in [('fp_bf16', predict_fp), ('int8_ptq', predict_q)]:
        t0 = time.perf_counter()
        out = tiled_inference(fn, scene, 512, 512, 7, tile_batch=8)
        _ = float(jax.device_get(jnp.sum(out[0, 0])))
        print(f'{name}: first call (compile) {time.perf_counter()-t0:.1f}s')
        t0 = time.perf_counter()
        for _ in range(3):
            out = tiled_inference(fn, scene, 512, 512, 7, tile_batch=8)
        _ = float(jax.device_get(jnp.sum(out[0, 0])))
        tps = n_tiles / ((time.perf_counter() - t0) / 3)
        results[name] = tps
        outs[name] = np.asarray(jax.device_get(out[::16, ::16]), np.float32)
        print(f'{name}: {tps:.1f} tiles/s/chip')

    a, b = outs['fp_bf16'], outs['int8_ptq']
    am, bm = a - a.mean(), b - b.mean()
    cos = float((am * bm).sum() /
                (np.linalg.norm(am) * np.linalg.norm(bm) + 1e-12))
    agree = float((a.argmax(-1) == b.argmax(-1)).mean())
    print(json.dumps({
        'fp_tiles_per_sec': round(results['fp_bf16'], 1),
        'int8_tiles_per_sec': round(results['int8_ptq'], 1),
        'speedup': round(results['int8_ptq'] / results['fp_bf16'], 3),
        'logit_cosine': round(cos, 5),
        'argmax_agreement': round(agree, 5),
        'n_convs_quantized': n_q,
    }))


if __name__ == '__main__':
    if '--vit' in sys.argv:
        vit_mode()
    else:
        main()
