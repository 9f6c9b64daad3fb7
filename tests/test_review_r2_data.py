"""Regression tests for the round-2 data/magic/api review findings."""

import numpy as np
import pytest

import ever_tpu  # noqa: F401 — registrations
from ever_tpu.core import registry


def _write_png(path, arr):
    from PIL import Image
    Image.fromarray(arr).save(path)


def test_geotile_rejects_scene_smaller_than_patch(tmp_path):
    """A scene smaller than patch_size must fail at CONSTRUCTION with an
    actionable message, not mid-epoch with a stack/bounds error."""
    rng = np.random.default_rng(0)
    _write_png(tmp_path / 'small.png',
               rng.integers(0, 255, size=(40, 40, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match='smaller than'):
        registry.DATASET['geotile'](dict(
            image_glob=str(tmp_path / '*.png'), patch_size=64, stride=64))


def test_geotile_scene_size_multiband_tiff(tmp_path):
    """_scene_size must use the same tifffile-first decode as read_raster:
    PIL cannot open >4-band TIFFs the fetch path fully supports."""
    tifffile = pytest.importorskip('tifffile')
    rng = np.random.default_rng(0)
    scene = rng.integers(0, 255, size=(32, 48, 6), dtype=np.uint8)
    tifffile.imwrite(str(tmp_path / 'scene.tif'), scene)
    ds = registry.DATASET['geotile'](dict(
        image_glob=str(tmp_path / '*.tif'), patch_size=16, stride=16))
    assert len(ds) == 6  # 2x3 grid of 16x16 patches over 32x48
    img = ds[0]
    assert img.shape == (16, 16, 6)


def test_geotile_mask_dtype_config(tmp_path):
    """The documented mask_dtype key must actually take effect (config keys
    that silently do nothing have masked real bugs before)."""
    rng = np.random.default_rng(0)
    _write_png(tmp_path / 'img.png',
               rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8))
    _write_png(tmp_path / 'msk.png',
               rng.integers(0, 7, size=(32, 32), dtype=np.uint8))
    ds = registry.DATASET['geotile'](dict(
        scene_pairs=[(str(tmp_path / 'img.png'), str(tmp_path / 'msk.png'))],
        patch_size=16, stride=16, mask_dtype='uint8'))
    _, mask = ds[0]
    assert mask.dtype == np.uint8
    # the native batched fast path honors it too
    out = ds.read_batch([0, 1])
    if out is not NotImplemented:
        assert out[1].dtype == np.uint8


def test_tiled_inference_rejects_gapped_stride():
    import jax.numpy as jnp
    from ever_tpu.magic.tiled import tiled_inference

    img = jnp.zeros((64, 64, 3), jnp.float32)
    with pytest.raises(ValueError, match='stride'):
        tiled_inference(lambda t: t, img, kernel_size=16, stride=24,
                        num_classes=3)


def test_scale_transform_arg_validation():
    from ever_tpu.magic.transform import Scale

    with pytest.raises(ValueError, match='exactly one'):
        Scale()
    with pytest.raises(ValueError, match='exactly one'):
        Scale(size=(16, 16), scale_factor=0.5)
    s = Scale(scale_factor=0.5)   # valid spellings still construct
    t = Scale(size=(16, 16))
    x = np.zeros((1, 32, 32, 3), np.float32)
    assert np.asarray(s.transform(x)).shape == (1, 16, 16, 3)
    assert np.asarray(t.transform(x)).shape == (1, 16, 16, 3)


def test_loader_in_flight_scales_with_num_workers():
    """torch semantics: num_workers * prefetch_factor batches in flight —
    the loader must actually occupy its workers, not cap at prefetch_factor."""
    import threading
    import time
    from ever_tpu.data.loader import DataLoader

    peak = [0]
    active = [0]
    lock = threading.Lock()

    class DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            with lock:
                active[0] += 1
                peak[0] = max(peak[0], active[0])
            time.sleep(0.02)
            with lock:
                active[0] -= 1
            return np.zeros(2, np.float32)

    dl = DataLoader(DS(), batch_size=1, num_workers=8, prefetch_factor=2)
    for _ in dl:
        pass
    assert peak[0] >= 4, f'only {peak[0]} concurrent fetches with 8 workers'


def test_create_project_ships_template_tree(tmp_path):
    """`ever_tpu create` must copy the full project_template (train/infer
    entry points AND the benchmark configs), not bare scaffolding."""
    from ever_tpu.util._main import create_project

    dest = tmp_path / 'proj'
    create_project(str(dest))
    assert (dest / 'train.py').exists() and (dest / 'infer.py').exists()
    for d in ('configs', 'module', 'data'):
        assert (dest / d).is_dir()
    cfgs = {p.name for p in (dest / 'configs').glob('*.py')}
    assert 'farseg_r50_loveda.py' in cfgs and len(cfgs) >= 5


def test_erdataset_auto_drops_ragged_training_tail():
    """SPMD shards every training batch over the mesh: a ragged last batch
    (len % batch_size) cannot be laid out and used to crash mid-epoch.
    drop_last=None (auto) drops it for training samplers, keeps eval tails,
    and honors an explicit False."""
    from ever_tpu.interface.dataloader import ERDataset

    class DS(ERDataset):
        def set_default_config(self):
            pass

        def __len__(self):
            return 12

        def __getitem__(self, i):
            return np.zeros(2, np.float32)

    dl = DS(dict(batch_size=8)).to_dataloader()
    batches = list(dl)
    assert len(batches) == 1 and batches[0].shape[0] == 8

    dl = DS(dict(batch_size=8, sampler_type='SequentialSampler')).to_dataloader()
    assert [b.shape[0] for b in dl] == [8, 4]  # eval keeps the tail

    dl = DS(dict(batch_size=8, drop_last=False)).to_dataloader()
    assert [b.shape[0] for b in dl] == [8, 4]  # explicit False honored

    with pytest.raises(ValueError, match='fewer than one'):
        DS(dict(batch_size=16)).to_dataloader()


def test_generated_project_auto_registers_and_honors_trainer_flag(tmp_path, monkeypatch):
    """train.py from `ever_tpu create` must import the project's module/ and
    data/ registrations and defer to the --trainer CLI flag (it used to
    hardcode 'th_ddp', silently ignoring --trainer gan_th_ddp)."""
    import runpy
    import sys
    from ever_tpu.util._main import create_project

    proj = tmp_path / 'proj'
    create_project(str(proj))
    (proj / 'module' / 'm.py').write_text('''
import jax
import jax.numpy as jnp
import flax.linen as nn
from ever_tpu.core import registry
from ever_tpu.interface import ERModule
from ever_tpu.module import loss as L


class _G(nn.Module):
    @nn.compact
    def __call__(self, z):
        return nn.Dense(8)(nn.relu(nn.Dense(16)(z)))


class _D(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(1)(nn.relu(nn.Dense(16)(x)))


@registry.MODEL.register('tpl_test_gan')
class TplGAN(ERModule):
    def set_default_config(self):
        self.config.update(dict())

    def setup(self):
        self.G = _G()
        self.D = _D()

    def __call__(self, z, train=False):
        return self.G(z)

    def d_loss(self, batch, train=False):
        z, real = batch
        fake = jax.lax.stop_gradient(self.G(z))
        rl, fl = self.D(real), self.D(fake)
        return dict(d_loss=L.sigmoid_focal_loss(rl, jnp.ones_like(rl), alpha=-1, gamma=0.0)
                    + L.sigmoid_focal_loss(fl, jnp.zeros_like(fl), alpha=-1, gamma=0.0))

    def g_loss(self, batch, train=False):
        z, real = batch
        fl = self.D(self.G(z))
        return dict(g_loss=L.sigmoid_focal_loss(fl, jnp.ones_like(fl), alpha=-1, gamma=0.0))
''')
    (proj / 'data' / 'd.py').write_text('''
import numpy as np
from ever_tpu.core import registry
from ever_tpu.interface import ERDataset


@registry.DATASET.register('tpl_test_gan_data')
class TplGanData(ERDataset):
    def set_default_config(self):
        self._config.update(dict(n=8))

    def __len__(self):
        return int(self.config.n)

    def __getitem__(self, i):
        rng = np.random.default_rng(int(i))
        return (rng.normal(size=(4,)).astype(np.float32),
                rng.normal(size=(8,)).astype(np.float32) + 3.0)
''')
    (proj / 'configs' / 'g.py').write_text('''
config = dict(
    model=dict(type='tpl_test_gan', params=dict()),
    data=dict(train=dict(type='tpl_test_gan_data', params=dict(batch_size=8))),
    learning_rate=dict(G=dict(type='constant', params=dict(base_lr=1e-3)),
                       D=dict(type='constant', params=dict(base_lr=2e-3))),
    optimizer=dict(G=dict(type='adam', params=dict()),
                   D=dict(type='adam', params=dict())),
    train=dict(num_iters=2, log_interval_step=1, save_ckpt_interval_epoch=-1),
)
''')
    monkeypatch.setattr(sys, 'argv', [
        'train.py', '--config_path', str(proj / 'configs' / 'g.py'),
        '--model_dir', str(proj / 'run'), '--trainer', 'gan_th_ddp'])
    runpy.run_path(str(proj / 'train.py'), run_name='__main__')
    assert (proj / 'run' / 'config.pkl').exists()
    from ever_tpu.core import registry
    del registry.MODEL['tpl_test_gan']
    del registry.DATASET['tpl_test_gan_data']


def test_loveda_partial_masks_fail_at_construction(tmp_path):
    """LoveDA gets the same all-or-none mask guard as the other scene
    datasets (a partial split mixed tuples with bare arrays mid-epoch)."""
    from tests.test_loveda import _make_loveda

    root = _make_loveda(tmp_path)   # root IS tmp_path in this helper
    import os
    victims = sorted((tmp_path / 'Train' / 'Urban' / 'masks_png').glob('*.png'))
    os.remove(victims[0])
    with pytest.raises(FileNotFoundError, match='missing their mask'):
        registry.DATASET['loveda'](dict(root=root, split='train'))


def test_geotile_read_batch_multichannel_mask(tmp_path):
    """The batched fast path must carry C-channel masks like the per-item
    path (it hardcoded a 1-channel buffer and crashed on color masks)."""
    from PIL import Image
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    msk = rng.integers(0, 7, (32, 48, 3), dtype=np.uint8)
    Image.fromarray(img).save(tmp_path / 'img.png')
    Image.fromarray(msk).save(tmp_path / 'msk.png')
    ds = registry.DATASET['geotile'](dict(
        scene_pairs=[(str(tmp_path / 'img.png'), str(tmp_path / 'msk.png'))],
        patch_size=16, stride=16, mask_dtype='uint8'))
    out = ds.read_batch([0, 1])
    if out is NotImplemented:
        pytest.skip('native fast path unavailable for this scene type')
    xb, mb = out
    assert mb.shape == (2, 16, 16, 3)
    x0, m0 = ds[0]
    np.testing.assert_array_equal(mb[0], m0)


def test_extract_tiles_rejects_4col_boxes(tmp_path):
    """sliding_window emits [N,4] (xmin,ymin,xmax,ymax); extract_tiles takes
    [N,2] (y0,x0) — a silent reshape used to gather garbage tiles."""
    from ever_tpu.magic.sliding_window import sliding_window
    from ever_tpu.native import extract_tiles

    scene = np.zeros((64, 64, 3), np.uint8)
    boxes4 = sliding_window((64, 64), 32, 32)
    with pytest.raises(ValueError, match=r'\[N, 2\]'):
        extract_tiles(scene, np.asarray(boxes4), None, (32, 32))
    # the documented conversion works
    b2 = np.asarray(boxes4)[:, [1, 0]]
    tiles = extract_tiles(scene, b2, None, (32, 32))
    assert tiles.shape == (4, 32, 32, 3)


def test_tiled_inference_memoizes_partials():
    """functools.partial / bound-method predict fns reject attribute
    assignment; the fallback cache must still memoize them (every call used
    to re-lower the whole scene program)."""
    import functools
    import jax.numpy as jnp
    from ever_tpu.magic.tiled import _get_attached, _d4_wrapped

    def base(tiles, scale):
        return jnp.repeat(tiles[..., :1] * scale, 3, axis=-1)

    pf = functools.partial(base, scale=2.0)
    w1 = _d4_wrapped(pf)
    w2 = _d4_wrapped(pf)
    assert w1 is w2
    assert _get_attached(pf, '_ever_d4_wrapper') is w1
