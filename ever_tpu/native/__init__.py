"""Native (C++) host data-path kernels with numpy fallbacks.

``extract_tiles``/``normalize_u8``/``to_bf16`` dispatch to ``_tilekit.so``
(built from ``tilekit.cpp`` on first use) when available and fall back to
equivalent numpy code otherwise — identical outputs either way (tested in
``tests/test_native.py``).

Why native: the reference's host pipeline rides torch's C++ DataLoader and
C-backed PIL/albumentations; our loader is Python threads, so the per-sample
crop+augment and the fused normalize+cast are the host hot spots.  Both
kernels release the GIL (ctypes calls do), so the loader's thread pool
actually scales.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

__all__ = ['HAS_NATIVE', 'extract_tiles', 'extract_tiles_s2d',
           'normalize_u8', 'to_bf16', 'd4_numpy']

_lib = None
_tried = False
HAS_NATIVE = False
_load_lock = __import__('threading').Lock()


def _load():
    global _lib, _tried, HAS_NATIVE
    if _tried:
        return _lib
    with _load_lock:
        # re-check under the lock: two loader threads hitting first use
        # concurrently must not both compile (interleaved writes could
        # install a corrupt .so with a fresh mtime — permanently wedged)
        if _tried:
            return _lib
        return _load_locked()


def _load_locked():
    global _lib, _tried, HAS_NATIVE
    _tried = True
    try:
        from ever_tpu.native import build as _build
        if _build.needs_build():
            _build.build()
        lib = ctypes.CDLL(_build.LIB)
        lib.ever_tilekit_abi_version.restype = ctypes.c_int
        if lib.ever_tilekit_abi_version() != 1:
            raise RuntimeError('tilekit ABI mismatch')
        i64 = ctypes.c_int64
        u8 = ctypes.POINTER(ctypes.c_uint8)
        f32 = ctypes.POINTER(ctypes.c_float)
        u16 = ctypes.POINTER(ctypes.c_uint16)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.ever_extract_tiles_u8.restype = ctypes.c_int
        lib.ever_extract_tiles_u8.argtypes = [
            u8, i64, i64, i64, i64p, i32p, i64, i64, i64, u8]
        lib.ever_extract_tiles_s2d_u8.restype = ctypes.c_int
        lib.ever_extract_tiles_s2d_u8.argtypes = [
            u8, i64, i64, i64, i64p, i64, i64, i64, u8]
        lib.ever_normalize_u8_f32.restype = ctypes.c_int
        lib.ever_normalize_u8_f32.argtypes = [u8, i64, i64, f32, f32, f32]
        lib.ever_normalize_u8_bf16.restype = ctypes.c_int
        lib.ever_normalize_u8_bf16.argtypes = [u8, i64, i64, f32, f32, u16]
        lib.ever_f32_to_bf16.restype = ctypes.c_int
        lib.ever_f32_to_bf16.argtypes = [f32, i64, u16]
        _lib = lib
        HAS_NATIVE = True
    except Exception:
        _lib = None
        HAS_NATIVE = False
    return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def d4_numpy(tile: np.ndarray, code: int) -> np.ndarray:
    """Dihedral transform, numpy reference semantics of the native kernel:
    ``rot90(k=code&3)`` of the (optionally column-flipped, bit 4) tile."""
    if code & 4:
        tile = tile[:, ::-1]
    return np.rot90(tile, k=code & 3)


def extract_tiles(scene: np.ndarray, boxes: np.ndarray,
                  codes: Optional[np.ndarray] = None,
                  tile_hw=(512, 512), out: Optional[np.ndarray] = None
                  ) -> np.ndarray:
    """Gather N (th, tw) uint8 tiles at ``boxes[:, (y0, x0)]`` from an HWC
    scene, applying per-tile dihedral codes 0..7 (nonzero codes need
    th == tw)."""
    th, tw = int(tile_hw[0]), int(tile_hw[1])
    scene = np.ascontiguousarray(scene)
    if scene.ndim == 2:
        scene = scene[..., None]
    if scene.dtype != np.uint8:
        # uint8-only by design (the native kernel is u8); reject on the
        # fallback path too so both paths accept identical inputs instead of
        # silently truncating floats into the u8 buffer
        raise ValueError(f'extract_tiles: scene must be uint8, got {scene.dtype}')
    H, W, C = scene.shape
    boxes = np.ascontiguousarray(boxes, dtype=np.int64)
    if boxes.ndim != 2 or boxes.shape[-1] != 2:
        # a silent reshape(-1, 2) would reinterpret sliding_window's
        # [N, 4] (xmin, ymin, xmax, ymax) boxes as 2N transposed (y0, x0)
        # pairs and gather garbage tiles
        raise ValueError(
            f'boxes must be [N, 2] (y0, x0) pairs, got shape '
            f'{boxes.shape}; sliding_window emits [N, 4] '
            '(xmin, ymin, xmax, ymax) — convert with '
            'boxes[:, [1, 0]]')
    n = len(boxes)
    if out is None:
        out = np.empty((n, th, tw, C), np.uint8)
    else:
        # the native kernel writes n*th*tw*C raw bytes at out's base pointer
        # — a wrong-shape/dtype/non-contiguous buffer would be heap
        # corruption, not an error
        if (out.shape != (n, th, tw, C) or out.dtype != np.uint8
                or not out.flags['C_CONTIGUOUS'] or not out.flags.writeable):
            raise ValueError(
                f'extract_tiles: out must be a writable C-contiguous uint8 '
                f'array of shape {(n, th, tw, C)}; got shape={out.shape} '
                f'dtype={out.dtype}')
    lib = _load()
    if lib is not None:
        codes_arr = (np.ascontiguousarray(codes, dtype=np.int32)
                     if codes is not None else None)
        rc = lib.ever_extract_tiles_u8(
            _ptr(scene, ctypes.c_uint8), H, W, C,
            _ptr(boxes, ctypes.c_int64),
            _ptr(codes_arr, ctypes.c_int32) if codes_arr is not None else None,
            n, th, tw, _ptr(out, ctypes.c_uint8))
        if rc != 0:
            raise ValueError(f'extract_tiles: bad boxes/codes (rc={rc})')
        return out
    # numpy fallback
    for i, (y0, x0) in enumerate(boxes):
        t = scene[y0:y0 + th, x0:x0 + tw]
        if t.shape[:2] != (th, tw):
            raise ValueError('extract_tiles: box out of bounds')
        if codes is not None and int(codes[i]):
            if th != tw:
                raise ValueError('extract_tiles: d4 codes need square tiles')
            t = d4_numpy(t, int(codes[i]))
        out[i] = t
    return out


def extract_tiles_s2d(scene: np.ndarray, boxes: np.ndarray,
                      tile_hw=(512, 512)) -> np.ndarray:
    """Gather N uint8 tiles in 2x2 space-to-depth layout
    ``[N, th/2, tw/2, 4C]`` (what ``stem='s2d_input'`` encoders consume —
    the fold costs nothing during the gather, vs ~0.7 ms/step as a device
    transpose).  Channel order ``(dy*2+dx)*C + c`` matches
    ``module.resnet.space_to_depth`` / ``preprocess.SpaceToDepth``."""
    th, tw = int(tile_hw[0]), int(tile_hw[1])
    scene = np.ascontiguousarray(scene)
    if scene.ndim == 2:
        scene = scene[..., None]
    H, W, C = scene.shape
    boxes = np.ascontiguousarray(boxes, dtype=np.int64)
    if boxes.ndim != 2 or boxes.shape[-1] != 2:
        # a silent reshape(-1, 2) would reinterpret sliding_window's
        # [N, 4] (xmin, ymin, xmax, ymax) boxes as 2N transposed (y0, x0)
        # pairs and gather garbage tiles
        raise ValueError(
            f'boxes must be [N, 2] (y0, x0) pairs, got shape '
            f'{boxes.shape}; sliding_window emits [N, 4] '
            '(xmin, ymin, xmax, ymax) — convert with '
            'boxes[:, [1, 0]]')
    n = len(boxes)
    out = np.empty((n, th // 2, tw // 2, 4 * C), np.uint8)
    lib = _load()
    if lib is not None and scene.dtype == np.uint8:
        rc = lib.ever_extract_tiles_s2d_u8(
            _ptr(scene, ctypes.c_uint8), H, W, C,
            _ptr(boxes, ctypes.c_int64), n, th, tw,
            _ptr(out, ctypes.c_uint8))
        if rc != 0:
            raise ValueError(f'extract_tiles_s2d: bad boxes/dims (rc={rc})')
        return out
    # numpy fallback: plain gather then fold
    tiles = extract_tiles(scene, boxes, None, (th, tw))
    t6 = tiles.reshape(n, th // 2, 2, tw // 2, 2, C)
    return np.ascontiguousarray(t6.transpose(0, 1, 3, 2, 4, 5)).reshape(
        n, th // 2, tw // 2, 4 * C)


def normalize_u8(img: np.ndarray, mean, std, dtype=np.float32) -> np.ndarray:
    """Fused ``(img - mean) / std`` + cast for uint8 HWC/NHWC images.

    ``dtype`` float32 or bfloat16 (ml_dtypes); parity with the reference's
    ``th_mean_std_normalize`` (``ever/preprocess/function.py:9``) but with a
    single pass and no float64 temporaries.
    """
    img = np.ascontiguousarray(img)
    C = img.shape[-1]
    mean = np.ascontiguousarray(np.broadcast_to(
        np.asarray(mean, np.float32), (C,)))
    std = np.ascontiguousarray(np.broadcast_to(
        np.asarray(std, np.float32), (C,)))
    import ml_dtypes
    want_bf16 = np.dtype(dtype) == np.dtype(ml_dtypes.bfloat16)
    lib = _load()
    n_pixels = img.size // C
    if lib is not None and img.dtype == np.uint8 and C <= 64:
        if want_bf16:
            out = np.empty(img.shape, np.uint16)
            rc = lib.ever_normalize_u8_bf16(
                _ptr(img, ctypes.c_uint8), n_pixels, C,
                _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
                _ptr(out, ctypes.c_uint16))
            if rc != 0:
                raise ValueError(f'normalize_u8 rc={rc}')
            return out.view(ml_dtypes.bfloat16)
        out = np.empty(img.shape, np.float32)
        rc = lib.ever_normalize_u8_f32(
            _ptr(img, ctypes.c_uint8), n_pixels, C,
            _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
            _ptr(out, ctypes.c_float))
        if rc != 0:
            raise ValueError(f'normalize_u8 rc={rc}')
        return out
    out = (img.astype(np.float32) - mean) / std
    return out.astype(dtype) if np.dtype(dtype) != np.float32 else out


def to_bf16(x: np.ndarray) -> np.ndarray:
    """float32 -> bfloat16 (round-to-nearest-even), bulk."""
    import ml_dtypes
    x = np.ascontiguousarray(x, dtype=np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty(x.shape, np.uint16)
        rc = lib.ever_f32_to_bf16(_ptr(x, ctypes.c_float), x.size,
                                  _ptr(out, ctypes.c_uint16))
        if rc == 0:
            return out.view(ml_dtypes.bfloat16)
    return x.astype(ml_dtypes.bfloat16)
