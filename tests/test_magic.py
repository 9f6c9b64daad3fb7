import numpy as np
import pytest

import jax.numpy as jnp

from ever_tpu.interface.transform_base import Transform
from ever_tpu.magic import (
    HorizontalFlip,
    Identity,
    Rotate90k,
    Scale,
    TestTimeAugmentation,
    Transpose,
    VerticalFlip,
    d4_tta,
    pad_crop_apply,
    sliding_window,
    tiled_inference,
    tta,
)


def test_sliding_window_covers_and_inbounds():
    boxes = sliding_window((1000, 900), 512, 256)
    assert boxes.shape[1] == 4
    # every box full-size and in-bounds (inward shift, not padding)
    assert np.all(boxes[:, 2] - boxes[:, 0] == 512)
    assert np.all(boxes[:, 3] - boxes[:, 1] == 512)
    assert np.all(boxes[:, 0] >= 0) and np.all(boxes[:, 2] <= 900)
    assert np.all(boxes[:, 1] >= 0) and np.all(boxes[:, 3] <= 1000)
    # full coverage
    cover = np.zeros((1000, 900), bool)
    for x0, y0, x1, y1 in boxes:
        cover[y0:y1, x0:x1] = True
    assert cover.all()


def test_sliding_window_small_image():
    boxes = sliding_window((100, 100), 512, 256)
    assert np.all(boxes == [[0, 0, 100, 100]])


def test_transforms_roundtrip():
    for t in (Identity(), Rotate90k(1), Rotate90k(2), Rotate90k(3),
              HorizontalFlip(), VerticalFlip(), Transpose()):
        Transform.unit_test(t)
    for sf in (0.5, 1.0, 2.0):
        # Scale round-trip is approximate; check shape restoration
        s = Scale(scale_factor=sf)
        x = jnp.ones((1, 64, 64, 3))
        y = s.inv_transform(s.transform(x))
        assert y.shape == x.shape


def test_tta_identity_average():
    model = lambda x: x * 2.0
    x = jnp.arange(2 * 16 * 16 * 3, dtype=jnp.float32).reshape(2, 16, 16, 3)
    out = tta(model, x, [Identity(), HorizontalFlip(), VerticalFlip()])
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0, rtol=1e-6)
    wrapped = TestTimeAugmentation(model, [Identity(), Rotate90k(2)])
    np.testing.assert_allclose(np.asarray(wrapped(x)), np.asarray(x) * 2.0, rtol=1e-6)


def test_d4_tta_equivariant_model():
    model = lambda x: x * 3.0  # pointwise → commutes with the group
    x = jnp.arange(1 * 8 * 8 * 2, dtype=jnp.float32).reshape(1, 8, 8, 2)
    out = d4_tta(model, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 3.0, rtol=1e-5)


def test_tiled_inference_identity():
    """Identity predictor → tiled output equals the input everywhere,
    including overlap-averaged regions."""
    rng = np.random.default_rng(0)
    img = rng.normal(size=(100, 80, 3)).astype(np.float32)
    out = tiled_inference(lambda t: t, jnp.asarray(img), kernel_size=32,
                          stride=24, num_classes=3, tile_batch=4)
    np.testing.assert_allclose(np.asarray(out), img, rtol=1e-5, atol=1e-5)


def test_tiled_inference_variables_argument():
    """predict_fn(variables, tiles) + variables= must match the closure
    form — plain, d4-TTA, and mesh-sharded.  The argument form is
    load-bearing for big models: closure params become compile-request
    constants and the tunnel's remote_compile chokes on them (r5)."""
    from ever_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(size=(100, 80, 3)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32))
    params = {'w': wgt}

    def closure(t):
        return t @ wgt

    def with_vars(v, t):
        return t @ v['w']

    for kwargs in (dict(), dict(tta='d4'),
                   dict(mesh=make_mesh(('data',))),
                   dict(mesh=make_mesh(('data',)), tta='d4')):
        a = tiled_inference(closure, img, 32, 24, 3, tile_batch=4, **kwargs)
        b = tiled_inference(with_vars, img, 32, 24, 3, tile_batch=4,
                            variables=params, **kwargs)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=str(kwargs))


def test_pad_crop_apply():
    calls = {}

    def fn(x):
        calls['shape'] = x.shape
        return x

    x = jnp.ones((1, 30, 50, 3))
    y = pad_crop_apply(fn, x, size_divisor=32)
    assert calls['shape'] == (1, 32, 64, 3)
    assert y.shape == (1, 30, 50, 3)


def _context_predict(tiles):
    """Non-pointwise head: each pixel sees the tile mean, so a duplicated
    pad tile produces *different* values than its neighbors — catches any
    padding scheme that lets pad tiles leak into the overlap average."""
    return tiles.mean(axis=(1, 2, 3), keepdims=True) + tiles[..., :1] * 0.0


def _numpy_tiled_reference(predict, scene, k, stride, num_classes):
    boxes = sliding_window(scene.shape[:2], k, stride)
    acc = np.zeros(scene.shape[:2] + (num_classes,), np.float32)
    cnt = np.zeros(scene.shape[:2] + (1,), np.float32)
    for x0, y0, x1, y1 in boxes:
        tile = np.asarray(scene[y0:y1, x0:x1])[None]
        pred = np.asarray(predict(jnp.asarray(tile)))[0]
        acc[y0:y1, x0:x1] += pred
        cnt[y0:y1, x0:x1] += 1.0
    return acc / np.maximum(cnt, 1.0)


def test_tiled_inference_context_dependent_head():
    """Pad tiles must carry zero weight: with a context-dependent head a
    duplicated last tile would skew overlap averages (ADVICE r1)."""
    rng = np.random.default_rng(1)
    scene = jnp.asarray(rng.normal(size=(100, 130, 3)).astype(np.float32))
    ref = _numpy_tiled_reference(_context_predict, scene, 32, 24, 1)
    got = tiled_inference(_context_predict, scene, 32, 24, 1, tile_batch=4)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_tiled_inference_sharded_context_dependent_head():
    import jax
    from ever_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(1)
    scene = jnp.asarray(rng.normal(size=(100, 130, 3)).astype(np.float32))
    ref = _numpy_tiled_reference(_context_predict, scene, 32, 24, 1)
    mesh = make_mesh(('data',))
    got = tiled_inference(_context_predict, scene, 32, 24, 1, tile_batch=4,
                          mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_tiled_inference_tta_matches_sequential():
    """tta='d4' (TTA fused into the scan, one program) must equal the
    sequential oracle: per tile, apply all 8 dihedral variants, invert,
    average, then paste (reference semantics, ever/magic/transform/tta.py)."""
    rng = np.random.default_rng(2)
    scene = jnp.asarray(rng.normal(size=(70, 60, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 2)).astype(np.float32))

    def predict(tiles):   # anisotropic head → TTA actually changes the output
        shifted = jnp.roll(tiles, 1, axis=1)
        return jnp.einsum('bhwc,cn->bhwn', tiles + 0.5 * shifted, kernel)

    def tta_oracle(tiles):
        outs = []
        for flip in (False, True):
            base = jnp.flip(tiles, axis=2) if flip else tiles
            for k in range(4):
                pred = predict(jnp.rot90(base, k, axes=(1, 2)))
                pred = jnp.rot90(pred, 4 - k, axes=(1, 2))
                if flip:
                    pred = jnp.flip(pred, axis=2)
                outs.append(pred)
        return sum(outs) / 8.0

    ref = _numpy_tiled_reference(tta_oracle, scene, 32, 24, 2)
    got = tiled_inference(predict, scene, 32, 24, 2, tile_batch=4, tta='d4')
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)

    # sharded variant composes with TTA too
    from ever_tpu.parallel.mesh import make_mesh
    got_sh = tiled_inference(predict, scene, 32, 24, 2, tile_batch=4,
                             tta='d4', mesh=make_mesh(('data',)))
    np.testing.assert_allclose(np.asarray(got_sh), ref, rtol=1e-4, atol=1e-4)


def test_tiled_inference_sharded_matches_single_device():
    """mesh= shards the tile list over 'data'; result equals the
    single-device scan exactly (overlapping geometry + tail padding)."""
    import jax
    import jax.numpy as jnp
    from ever_tpu.magic.tiled import tiled_inference
    from ever_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    scene = jnp.asarray(rng.normal(size=(100, 130, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))

    def predict(tiles):   # deterministic toy head
        return jnp.einsum('bhwc,cn->bhwn', tiles, kernel)

    ref = tiled_inference(predict, scene, 32, 24, 4, tile_batch=4)
    mesh = make_mesh(('data',))
    got = tiled_inference(predict, scene, 32, 24, 4, tile_batch=4, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_d4_wrapper_memoized_without_global_cache():
    """The d4-TTA wrapper memoizes per predict_fn via a function attribute —
    no module-global dict pinning closures (and their captured params)."""
    from ever_tpu.magic import tiled as tiled_mod
    from ever_tpu.magic.tiled import _d4_wrapped
    assert not hasattr(tiled_mod, '_TTA_WRAPPERS')

    def predict(tiles):
        return tiles

    w1 = _d4_wrapped(predict)
    w2 = _d4_wrapped(predict)
    assert w1 is w2
    import jax.numpy as jnp
    out = w1(jnp.ones((2, 8, 8, 3)))
    assert out.shape == (2, 8, 8, 3)


def test_tiled_inference_scene_smaller_than_tile():
    """Scenes smaller than one tile pad internally and crop back (the static
    gather slice used to read out of bounds and abort the deployment)."""
    import jax.numpy as jnp
    from ever_tpu.magic.tiled import tiled_inference
    scene = jnp.ones((40, 72, 3), jnp.float32)

    def predict(tiles):
        return jnp.repeat(jnp.mean(tiles, axis=-1, keepdims=True), 2, -1)

    out = tiled_inference(predict, scene, 64, 64, 2)
    assert out.shape == (40, 72, 2)


def test_tiled_inference_sharded_memoizes_compiled_fn():
    """Repeated mesh-sharded calls with the same predict_fn/geometry must
    reuse one compiled program (jit keys on callable identity; a fresh
    shard_map per call re-traced every scene)."""
    import jax.numpy as jnp
    from ever_tpu.magic.tiled import tiled_inference
    from ever_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(('data',))

    def predict(tiles):
        return jnp.repeat(jnp.mean(tiles, -1, keepdims=True), 3, -1)

    scene = jnp.ones((96, 96, 3), jnp.float32)
    a = tiled_inference(predict, scene, 32, 32, 3, mesh=mesh)
    b = tiled_inference(predict, scene, 32, 32, 3, mesh=mesh)
    assert len(predict._ever_sharded_cache) == 1
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
