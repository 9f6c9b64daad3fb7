"""Native tilekit kernels == numpy reference, bit-exactly."""

import numpy as np
import pytest

import ml_dtypes

from ever_tpu import native
from ever_tpu.native import d4_numpy, extract_tiles, normalize_u8, to_bf16


def test_native_library_builds_and_loads():
    native._load()
    assert native.HAS_NATIVE, 'tilekit failed to build — check g++ output'


def test_extract_tiles_matches_numpy_all_codes():
    rng = np.random.default_rng(0)
    scene = rng.integers(0, 256, size=(100, 120, 3), dtype=np.uint8)
    boxes = np.array([[0, 0], [10, 20], [68, 88], [3, 5],
                      [40, 40], [0, 88], [68, 0], [31, 57]], np.int64)
    codes = np.arange(8, dtype=np.int32)
    got = extract_tiles(scene, boxes, codes, tile_hw=(32, 32))
    assert got.shape == (8, 32, 32, 3)
    for i, (y0, x0) in enumerate(boxes):
        ref = d4_numpy(scene[y0:y0 + 32, x0:x0 + 32], int(codes[i]))
        np.testing.assert_array_equal(got[i], ref, err_msg=f'code {i}')


def test_extract_tiles_rect_no_aug_and_errors():
    rng = np.random.default_rng(1)
    scene = rng.integers(0, 256, size=(64, 80, 4), dtype=np.uint8)
    boxes = np.array([[0, 0], [32, 40]], np.int64)
    got = extract_tiles(scene, boxes, None, tile_hw=(16, 24))
    np.testing.assert_array_equal(got[1], scene[32:48, 40:64])
    with pytest.raises(ValueError):
        extract_tiles(scene, np.array([[60, 0]], np.int64), None, (16, 24))
    with pytest.raises(ValueError):
        extract_tiles(scene, boxes, np.array([1, 0], np.int32), (16, 24))
    with pytest.raises(ValueError):  # non-uint8 scenes rejected on BOTH paths
        extract_tiles(scene.astype(np.float32), boxes, None, (16, 24))


def test_normalize_u8_f32_and_bf16():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(4, 33, 35, 3), dtype=np.uint8)
    mean = [123.675, 116.28, 103.53]
    std = [58.395, 57.12, 57.375]
    ref = (img.astype(np.float32) - np.asarray(mean, np.float32)) \
        / np.asarray(std, np.float32)
    got = normalize_u8(img, mean, std)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    got16 = normalize_u8(img, mean, std, dtype=ml_dtypes.bfloat16)
    assert got16.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        got16.view(np.uint16),
        ref.astype(ml_dtypes.bfloat16).view(np.uint16))


def test_to_bf16_round_to_nearest_even():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1000,)).astype(np.float32)
    x[:4] = [0.0, -0.0, 1e-40, 3.389e38]
    np.testing.assert_array_equal(to_bf16(x).view(np.uint16),
                                  x.astype(ml_dtypes.bfloat16).view(np.uint16))


def test_extract_tiles_s2d_matches_fold():
    """native s2d gather == plain gather + SpaceToDepth fold, bit-exact;
    channel order matches module.resnet.space_to_depth."""
    rng = np.random.default_rng(4)
    scene = rng.integers(0, 256, size=(64, 80, 3), dtype=np.uint8)
    boxes = np.array([[0, 0], [10, 20], [32, 48]], np.int64)
    got = native.extract_tiles_s2d(scene, boxes, tile_hw=(32, 32))
    assert got.shape == (3, 16, 16, 12)
    plain = extract_tiles(scene, boxes, None, (32, 32))
    ref = plain.reshape(3, 16, 2, 16, 2, 3).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(3, 16, 16, 12)
    np.testing.assert_array_equal(got, ref)

    # same order the jnp stem fold expects
    import jax.numpy as jnp
    from ever_tpu.module.resnet import space_to_depth
    jref = np.asarray(space_to_depth(jnp.asarray(plain.astype(np.float32)), 2))
    np.testing.assert_array_equal(got.astype(np.float32), jref)


def test_extract_tiles_rejects_bad_out_buffer():
    """A caller-supplied out buffer must be validated before the native
    kernel writes n*th*tw*C raw bytes into it (heap corruption otherwise)."""
    import pytest
    from ever_tpu.native import extract_tiles
    scene = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array([[0, 0]], np.int64)
    with pytest.raises(ValueError, match='out'):
        extract_tiles(scene, boxes, tile_hw=(32, 32),
                      out=np.empty((1, 16, 16, 3), np.uint8))
    with pytest.raises(ValueError, match='out'):
        extract_tiles(scene, boxes, tile_hw=(32, 32),
                      out=np.empty((1, 32, 32, 3), np.float32))
    ok = extract_tiles(scene, boxes, tile_hw=(32, 32),
                       out=np.empty((1, 32, 32, 3), np.uint8))
    assert ok.shape == (1, 32, 32, 3)


def test_to_bf16_preserves_nan():
    """Low-mantissa NaNs must not round into +/-Inf on the native path
    (numpy's astype keeps a quiet NaN — the two paths must agree)."""
    from ever_tpu.native import to_bf16
    import ml_dtypes
    raw = np.array([0x7F800001, 0xFF800001, 0x7FC00000], np.uint32)
    x = raw.view(np.float32)
    got = np.asarray(to_bf16(x)).astype(np.float32)
    assert np.all(np.isnan(got)), got
    ref = x.astype(ml_dtypes.bfloat16).astype(np.float32)
    assert np.all(np.isnan(ref))
