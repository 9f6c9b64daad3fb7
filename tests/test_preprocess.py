import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ever_tpu.preprocess import (
    Compose,
    DivisiblePad,
    FixedPad,
    MeanStdNormalize,
    RandomCrop,
    RandomHorizontalFlip,
    RandomRotate90K,
    RandomScale,
    ToArray,
    divisible_pad,
    mean_std_normalize,
)
from ever_tpu.preprocess.device import batch_augment, dihedral_augment, random_crop


def _sample(h=40, w=60):
    rng = np.random.default_rng(0)
    return (rng.integers(0, 255, size=(h, w, 3)).astype(np.float32),
            rng.integers(0, 7, size=(h, w)).astype(np.int32))


def test_host_pipeline_shapes():
    img, mask = _sample()
    pipe = Compose([
        ToArray(),
        RandomHorizontalFlip(p=1.0, seed=0),
        RandomRotate90K(p=1.0, seed=0),
        RandomScale(scale_range=(0.5, 2.0), size_divisor=8, seed=0),
        RandomCrop((32, 32), seed=0),
        MeanStdNormalize(),
    ])
    out_img, out_mask = pipe(img, mask)
    assert out_img.shape == (32, 32, 3)
    assert out_mask.shape == (32, 32)
    assert out_img.dtype == np.float32


def test_random_crop_pads_small_with_255():
    img, mask = _sample(10, 10)
    out_img, out_mask = RandomCrop((32, 32), seed=0)(img, mask)
    assert out_img.shape == (32, 32, 3)
    assert (out_mask == 255).sum() > 0  # padded region carries ignore label


def test_divisible_and_fixed_pad():
    img, mask = _sample(30, 50)
    out_img, out_mask = DivisiblePad(32)(img, mask)
    assert out_img.shape == (32, 64, 3) and out_mask.shape == (32, 64)
    out_img, out_mask = FixedPad((64, 64))(img, mask)
    assert out_img.shape == (64, 64, 3)
    # jnp variant
    assert divisible_pad(jnp.ones((1, 30, 50, 3)), 32).shape == (1, 32, 64, 3)


def test_mean_std_normalize_matches_manual():
    x = np.full((2, 2, 3), 123.675, np.float32)
    out = np.asarray(mean_std_normalize(jnp.asarray(x)))
    assert out[0, 0, 0] == pytest.approx(0.0, abs=1e-5)


def test_device_dihedral_preserves_pairing():
    """Image and mask get the SAME random symmetry."""
    img = jnp.arange(16, dtype=jnp.float32).reshape(4, 4, 1)
    mask = jnp.arange(16, dtype=jnp.int32).reshape(4, 4)
    for seed in range(8):
        im2, m2 = dihedral_augment(jax.random.key(seed), img, mask)
        np.testing.assert_array_equal(np.asarray(im2[..., 0], np.int32),
                                      np.asarray(m2))


def test_device_random_crop_static_shape():
    img = jnp.ones((16, 16, 3))
    mask = jnp.ones((16, 16), jnp.int32)
    im2, m2 = random_crop(jax.random.key(0), img, (8, 8), mask)
    assert im2.shape == (8, 8, 3) and m2.shape == (8, 8)


def test_batch_augment_fused():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, size=(4, 16, 16, 3)).astype(np.float32))
    masks = jnp.asarray(rng.integers(0, 7, size=(4, 16, 16)).astype(np.int32))
    out_img, out_mask = batch_augment(jax.random.key(0), images, masks,
                                      crop_size=(8, 8))
    assert out_img.shape == (4, 8, 8, 3)
    assert out_mask.shape == (4, 8, 8)
    assert out_img.dtype == jnp.float32


def test_joint_transforms_accept_mask_lists():
    """ToArray advertises multi-task label lists — every joint transform must
    apply the same spatial op to each mask in the list."""
    from ever_tpu.preprocess.segm import (Compose, DivisiblePad, FixedPad,
                                          RandomCrop, RandomHorizontalFlip,
                                          RandomRotate90K, RandomScale,
                                          RandomTranspose, RandomVerticalFlip,
                                          ToArray)
    img = np.arange(24 * 20 * 3, dtype=np.uint8).reshape(24, 20, 3)
    masks = [np.arange(24 * 20, dtype=np.int64).reshape(24, 20),
             np.ones((24, 20), np.int64)]
    pipe = Compose([ToArray(),
                    RandomHorizontalFlip(p=1.0, seed=0),
                    RandomVerticalFlip(p=1.0, seed=0),
                    RandomTranspose(p=1.0, seed=0),
                    RandomRotate90K(p=1.0, seed=0),
                    RandomScale(scale_range=(1.0, 1.0), size_divisor=None, seed=0),
                    RandomCrop((16, 16), seed=0),
                    DivisiblePad(32),
                    FixedPad((40, 40))])
    out_img, out_masks = pipe(img, masks)
    assert isinstance(out_masks, list) and len(out_masks) == 2
    for m in out_masks:
        assert m.shape == out_img.shape[:2] == (40, 40)
    # both masks saw the SAME spatial ops: mask1 is constant 1 where valid
    assert set(np.unique(out_masks[1])) <= {1, 255}


def test_transform_rng_reseeds_after_fork(monkeypatch):
    """A forked loader worker must not replay the parent's augmentation
    stream (the inherited Generator state made every worker identical)."""
    import os
    from ever_tpu.preprocess.segm import RandomHorizontalFlip
    t = RandomHorizontalFlip(p=0.5, seed=42)
    parent_draws = [float(t.rng.random()) for _ in range(4)]
    t2 = RandomHorizontalFlip(p=0.5, seed=42)
    real_pid = os.getpid()
    monkeypatch.setattr(os, 'getpid', lambda: real_pid + 1)  # "child"
    child_draws = [float(t2.rng.random()) for _ in range(4)]
    assert parent_draws != child_draws
    # deterministic per (seed, pid): a parent-constructed transform forked
    # into the same child pid draws the same stream
    monkeypatch.setattr(os, 'getpid', lambda: real_pid)
    t3 = RandomHorizontalFlip(p=0.5, seed=42)
    monkeypatch.setattr(os, 'getpid', lambda: real_pid + 1)
    child2 = [float(t3.rng.random()) for _ in range(4)]
    assert child_draws == child2


def test_compose_customop_image_only():
    """Reference contract (comm.py:4-34): with no mask, CustomOp calls
    fn(image) and Compose returns a bare image."""
    from ever_tpu.preprocess.segm import Compose, CustomOp

    pipe = Compose([CustomOp(lambda img: img * 2)])
    out = pipe(np.ones((4, 4, 3), np.float32))
    assert not isinstance(out, tuple)
    np.testing.assert_array_equal(out, 2 * np.ones((4, 4, 3), np.float32))
    pipe2 = Compose([CustomOp(lambda i, m: (i + 1, m))])
    i2, m2 = pipe2(np.zeros((2, 2, 3), np.float32), np.zeros((2, 2), np.int32))
    np.testing.assert_array_equal(i2, 1)


def test_divisible_pad_2d_mask():
    """th_divisible_pad accepts bare HW masks (reference function.py:35-64)."""
    import jax.numpy as jnp
    from ever_tpu.preprocess.function import divisible_pad, pad_to_size

    m = jnp.ones((30, 45), jnp.int32)
    out = divisible_pad(m, 32, value=255)
    assert out.shape == (32, 64)
    assert int(out[31, 0]) == 255
    out2 = pad_to_size(m, (32, 64), value=255)
    assert out2.shape == (32, 64)


def test_rotate90k_reference_surface():
    """RandomRotate90K(k=(0,1,2,3)) draws k uniformly (reference
    segm.py:70-82); k=(2,) always rotates twice."""
    from ever_tpu.preprocess.segm import RandomRotate90K

    img = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    t = RandomRotate90K(k=(2,), seed=0)
    out, _ = t(img, None)
    np.testing.assert_array_equal(out, np.rot90(img, 2, axes=(0, 1)))
    ks = set()
    t = RandomRotate90K(seed=0)
    for _ in range(50):
        out, _ = t(np.ones((2, 3, 1), np.float32), None)
        ks.add(out.shape[:2])
    assert ks == {(2, 3), (3, 2)}   # all four k values get drawn


def test_random_scale_discrete_reference_mode():
    """RandomScale(scales=[...]) floor-snaps like the reference
    (int(h*s)//d*d): 500px at scale 1.0, divisor 32 -> 480, not 512."""
    from ever_tpu.preprocess.segm import RandomScale

    t = RandomScale(scales=[1.0], size_divisor=32, seed=0)
    img = np.ones((500, 500, 3), np.float32)
    out, _ = t(img, None)
    assert out.shape == (480, 480, 3)
