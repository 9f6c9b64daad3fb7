"""Microbench: native tilekit kernels vs numpy host path.

Run: python tools/bench_native.py  (CPU only; measured on this image:
extract_tiles 1.5x, fused normalize f32 4.4x / bf16 5.0x, f32->bf16 1.2x).
"""
import time, numpy as np, ml_dtypes
from ever_tpu.native import extract_tiles, normalize_u8, to_bf16, d4_numpy, _load, HAS_NATIVE
import ever_tpu.native as nat
nat._load()
print('native:', nat.HAS_NATIVE)
rng = np.random.default_rng(0)
scene = rng.integers(0, 256, size=(8192, 8192, 3), dtype=np.uint8)
boxes = rng.integers(0, 8192-512, size=(64, 2)).astype(np.int64)
codes = rng.integers(0, 8, size=64).astype(np.int32)

def timeit(f, n=5):
    f()
    t0 = time.perf_counter()
    for _ in range(n): f()
    return (time.perf_counter()-t0)/n*1e3

t_nat = timeit(lambda: extract_tiles(scene, boxes, codes, (512,512)))
def np_path():
    out = np.empty((64,512,512,3), np.uint8)
    for i,(y0,x0) in enumerate(boxes):
        out[i] = d4_numpy(scene[y0:y0+512, x0:x0+512], int(codes[i]))
    return out
t_np = timeit(np_path)
print(f'extract_tiles 64x512² aug: native {t_nat:.2f} ms vs numpy {t_np:.2f} ms ({t_np/t_nat:.1f}x)')

img = rng.integers(0, 256, size=(64,512,512,3), dtype=np.uint8)
mean=[123.675,116.28,103.53]; std=[58.395,57.12,57.375]
t_nat = timeit(lambda: normalize_u8(img, mean, std))
mean_a = np.asarray(mean, np.float32); std_a = np.asarray(std, np.float32)
t_np = timeit(lambda: (img.astype(np.float32)-mean_a)/std_a)
print(f'normalize f32 64x512²: native {t_nat:.2f} ms vs numpy {t_np:.2f} ms ({t_np/t_nat:.1f}x)')
t_nat16 = timeit(lambda: normalize_u8(img, mean, std, dtype=ml_dtypes.bfloat16))
t_np16 = timeit(lambda: (((img.astype(np.float32)-mean_a)/std_a).astype(ml_dtypes.bfloat16)))
print(f'normalize bf16 64x512²: native {t_nat16:.2f} ms vs numpy {t_np16:.2f} ms ({t_np16/t_nat16:.1f}x)')
x = rng.normal(size=(64,512,512,3)).astype(np.float32)
t_nat = timeit(lambda: to_bf16(x))
t_np = timeit(lambda: x.astype(ml_dtypes.bfloat16))
print(f'f32->bf16 201MB: native {t_nat:.2f} ms vs numpy {t_np:.2f} ms ({t_np/t_nat:.1f}x)')
