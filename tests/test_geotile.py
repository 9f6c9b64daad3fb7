import numpy as np
import pytest

from ever_tpu.data.geotile import GeoTileDataset


def _make_scene(tmp_path, name, h, w):
    from PIL import Image
    rng = np.random.default_rng(hash(name) % 2**31)
    img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
    mask = rng.integers(0, 7, size=(h, w)).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / f'{name}_img.png')
    Image.fromarray(mask).save(tmp_path / f'{name}_mask.png')


def test_geotile_grid_and_patches(tmp_path):
    _make_scene(tmp_path, 'a', 100, 130)
    _make_scene(tmp_path, 'b', 64, 64)
    ds = GeoTileDataset(dict(
        image_glob=str(tmp_path / '*_img.png'),
        mask_glob=str(tmp_path / '*_mask.png'),
        patch_size=64, stride=48))
    # scene a: rows at y=0,36(shifted); cols x=0,48,66 → 2x3=6; scene b: 1
    assert len(ds) == 7
    img, mask = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.float32
    assert mask.shape == (64, 64) and mask.dtype == np.int32
    # every patch full-size (inward shift at edges)
    for i in range(len(ds)):
        im, m = ds[i]
        assert im.shape == (64, 64, 3)


def test_geotile_with_transforms_and_loader(tmp_path):
    from ever_tpu import preprocess as pp
    from ever_tpu.data.loader import DataLoader
    _make_scene(tmp_path, 'c', 96, 96)
    ds = GeoTileDataset(dict(
        image_glob=str(tmp_path / 'c_img.png'),
        mask_glob=str(tmp_path / 'c_mask.png'),
        patch_size=64, stride=32,
        transforms=[pp.MeanStdNormalize()]))
    dl = DataLoader(ds, batch_size=4)
    batch = next(iter(dl))
    assert batch[0].shape == (4, 64, 64, 3)
    assert abs(float(batch[0].mean())) < 3.0  # normalized scale


def test_geotile_npy_and_imageless(tmp_path):
    np.save(tmp_path / 'scene.npy', np.zeros((80, 80, 4), np.float32))
    ds = GeoTileDataset(dict(image_glob=str(tmp_path / 'scene.npy'),
                             patch_size=64, stride=64))
    img = ds[0]
    assert img.shape == (64, 64, 4)


def test_geotile_mismatch_raises(tmp_path):
    _make_scene(tmp_path, 'd', 64, 64)
    with pytest.raises(ValueError):
        GeoTileDataset(dict(image_glob=str(tmp_path / '*_img.png'),
                            mask_glob=str(tmp_path / 'nope*.png') if False else
                            str(tmp_path / '*unmatched*.png')))


def test_geotile_read_batch_fast_path_matches_per_item(tmp_path):
    """DataLoader uses GeoTileDataset.read_batch (native batched tile
    gather) when scenes are uint8 and there are no transforms; results must
    equal the per-item path exactly."""
    from ever_tpu.data.loader import DataLoader, default_collate
    _make_scene(tmp_path, 'd', 100, 130)
    _make_scene(tmp_path, 'e', 64, 64)
    ds = GeoTileDataset(dict(
        image_glob=str(tmp_path / '*_img.png'),
        mask_glob=str(tmp_path / '*_mask.png'),
        patch_size=64, stride=48))
    idxs = list(range(len(ds)))
    fast = ds.read_batch(idxs)
    assert fast is not NotImplemented
    ref = default_collate([ds[i] for i in idxs])
    np.testing.assert_array_equal(fast[0], ref[0])
    np.testing.assert_array_equal(fast[1], ref[1])
    assert fast[0].dtype == np.float32 and fast[1].dtype == np.int32

    batch = next(iter(DataLoader(ds, batch_size=len(ds))))
    np.testing.assert_array_equal(batch[0], ref[0])

    # with python transforms the fast path declines
    ds2 = GeoTileDataset(dict(
        image_glob=str(tmp_path / 'd_img.png'),
        mask_glob=str(tmp_path / 'd_mask.png'),
        patch_size=64, stride=48,
        transforms=[lambda im, m: (im, m)]))
    assert ds2.read_batch([0]) is NotImplemented

    # a user collate_fn must win over read_batch (ADVICE r1): the batch
    # structure comes from the custom collate, not the default fast path
    def tag_collate(items):
        return {'custom': default_collate(items)}

    tagged = next(iter(DataLoader(ds, batch_size=len(ds),
                                  collate_fn=tag_collate)))
    assert set(tagged) == {'custom'}
    np.testing.assert_array_equal(tagged['custom'][0], ref[0])


def test_geotile_s2d_layout(tmp_path):
    """layout='s2d' yields folded [k/2,k/2,4C] tiles on both the per-item
    and the native batched path, equal to SpaceToDepth of the hwc tiles."""
    from ever_tpu.data.loader import DataLoader
    from ever_tpu.preprocess.segm import SpaceToDepth
    _make_scene(tmp_path, 'f', 96, 96)
    common = dict(image_glob=str(tmp_path / 'f_img.png'),
                  mask_glob=str(tmp_path / 'f_mask.png'),
                  patch_size=64, stride=32)
    ds_hwc = GeoTileDataset(dict(**common))
    ds_s2d = GeoTileDataset(dict(**common, layout='s2d'))
    assert len(ds_hwc) == len(ds_s2d)
    img_h, mask_h = ds_hwc[1]
    img_s, mask_s = ds_s2d[1]
    ref, _ = SpaceToDepth()(img_h, None)
    np.testing.assert_array_equal(img_s, ref)
    np.testing.assert_array_equal(mask_s, mask_h)

    fast = ds_s2d.read_batch(list(range(len(ds_s2d))))
    assert fast is not NotImplemented
    assert fast[0].shape == (len(ds_s2d), 32, 32, 12)
    for i in range(len(ds_s2d)):
        np.testing.assert_array_equal(fast[0][i], ds_s2d[i][0])


def test_geotile_uint8_dtype(tmp_path):
    _make_scene(tmp_path, 'g', 96, 96)
    ds = GeoTileDataset(dict(
        image_glob=str(tmp_path / 'g_img.png'),
        mask_glob=str(tmp_path / 'g_mask.png'),
        patch_size=64, stride=32, image_dtype='uint8'))
    img, mask = ds[0]
    assert img.dtype == np.uint8 and mask.dtype == np.int32
    fast = ds.read_batch([0, 1])
    assert fast[0].dtype == np.uint8
    np.testing.assert_array_equal(fast[0][0], img)
