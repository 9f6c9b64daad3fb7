"""Built-in benchmark datasets (levircd / xview2 / isaid) — layout parsing,
label encoding, and train-forward compatibility with their config's model
(the contract every project_template config relies on)."""

import numpy as np
import pytest

import ever_tpu  # noqa: F401 — registrations
from ever_tpu.core import builder, registry


def _png(path, arr):
    from PIL import Image
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)


def _make_levircd(tmp_path, n=3, size=64):
    rng = np.random.default_rng(0)
    root = tmp_path / 'levircd'
    for split in ('train', 'test'):
        for i in range(n):
            _png(root / split / 'A' / f'{i:04d}.png',
                 rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
            _png(root / split / 'B' / f'{i:04d}.png',
                 rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
            _png(root / split / 'label' / f'{i:04d}.png',
                 (rng.integers(0, 2, (size, size), dtype=np.uint8) * 255))
    return str(root)


def _make_xview2(tmp_path, n=3, size=64):
    rng = np.random.default_rng(0)
    root = tmp_path / 'xbd'
    for split in ('train', 'hold'):
        for i in range(n):
            sid = f'scene_{i:05d}'
            _png(root / split / 'images' / f'{sid}_pre_disaster.png',
                 rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
            _png(root / split / 'images' / f'{sid}_post_disaster.png',
                 rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
            _png(root / split / 'targets' / f'{sid}_pre_disaster_target.png',
                 rng.integers(0, 2, (size, size), dtype=np.uint8))
            _png(root / split / 'targets' / f'{sid}_post_disaster_target.png',
                 rng.integers(0, 6, (size, size), dtype=np.uint8))
    return str(root)


def _make_isaid(tmp_path, n=3, size=64):
    from ever_tpu.data.benchmarks import ISAID_PALETTE
    rng = np.random.default_rng(0)
    colors = np.asarray(list(ISAID_PALETTE.keys()), np.uint8)
    root = tmp_path / 'isaid'
    for split in ('train', 'val'):
        for i in range(n):
            _png(root / split / 'images' / f'P{i:04d}.png',
                 rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
            idx = rng.integers(0, len(colors), (size, size))
            _png(root / split / 'images' / f'P{i:04d}_instance_color_RGB.png',
                 colors[idx])
    return str(root)


def test_levircd_layout_and_contract(tmp_path):
    root = _make_levircd(tmp_path)
    ds = registry.DATASET['levircd'](dict(root=root, split='train',
                                          crop_size=32))
    assert len(ds) == 3
    x, y = ds[0]
    assert x.shape == (32, 32, 6) and x.dtype == np.float32
    assert y['change'].shape == (32, 32)
    assert set(np.unique(y['change'])) <= {0, 1}
    # LEVIR-CD has no per-temporal semantics: masks are all ignore_index
    assert y['masks'].shape == (32, 32, 2)
    assert (y['masks'] == 255).all()
    # eval split keeps full scenes
    x_f, y_f = registry.DATASET['levircd'](dict(root=root, split='test'))[0]
    assert x_f.shape == (64, 64, 6) and y_f['change'].shape == (64, 64)
    # per-epoch reseeded random crops differ
    ds.set_epoch(1)
    a, _ = ds[0]
    ds.set_epoch(2)
    b, _ = ds[0]
    assert not np.array_equal(a, b)


def test_levircd_trains_changemask_and_changestar(tmp_path):
    """All-ignore masks must NOT produce NaN losses — the change branch
    alone drives training (module docstring in data/benchmarks.py)."""
    import jax
    import jax.numpy as jnp

    root = _make_levircd(tmp_path, size=32)
    ds = registry.DATASET['levircd'](dict(root=root, split='train',
                                          crop_size=32, batch_size=2))
    dl = ds.to_dataloader()
    x, y = next(iter(dl))
    for typ, extra in (('ChangeMask', dict(classes=2)),
                       ('ChangeStar', dict(
                           classes=1,
                           changemixin=dict(in_channels=64, inner_channels=8,
                                            num_convs=2, scale_factor=4.0)))):
        model = builder.make_model({'type': typ, 'params': dict(
            encoder=dict(resnet_type='resnet18'),
            fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=32),
            decoder=dict(in_channels=32, out_channels=32,
                         in_feat_output_strides=(4, 8, 16, 32),
                         out_feat_output_stride=4),
            loss=dict(ignore_index=255), **extra)})
        variables = model.init({'params': jax.random.PRNGKey(0)},
                               jnp.asarray(x),
                               jax.tree.map(jnp.asarray, y), train=True)
        out = model.apply(variables, jnp.asarray(x),
                          jax.tree.map(jnp.asarray, y), train=True,
                          mutable=['batch_stats'])[0]
        total = sum(float(v) for k, v in out.items() if k.endswith('loss'))
        assert np.isfinite(total), (typ, out)


def test_xview2_layout_and_contract(tmp_path):
    import jax
    import jax.numpy as jnp

    root = _make_xview2(tmp_path)
    ds = registry.DATASET['xview2'](dict(root=root, split='train',
                                         crop_size=32))
    x, y = ds[0]
    assert x.shape == (32, 32, 6)
    assert set(np.unique(y['loc'])) <= {0, 1}
    vals = set(np.unique(y['damage']).tolist())
    assert vals <= set(range(5)) | {255}          # 5 (un-classified) -> 255
    # hold split keeps full scenes
    xh, _ = registry.DATASET['xview2'](dict(root=root, split='hold'))[0]
    assert xh.shape == (64, 64, 6)

    model = builder.make_model({'type': 'ChangeOS', 'params': dict(
        encoder=dict(resnet_type='resnet18'),
        fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=32),
        decoder=dict(in_channels=32, out_channels=32,
                     in_feat_output_strides=(4, 8, 16, 32),
                     out_feat_output_stride=4),
        damage_classes=5, loss=dict(ignore_index=255))})
    xb = jnp.asarray(x[None])
    yb = jax.tree.map(lambda a: jnp.asarray(a[None]), y)
    variables = model.init({'params': jax.random.PRNGKey(0)}, xb, yb,
                           train=True)
    out = model.apply(variables, xb, yb, train=True,
                      mutable=['batch_stats'])[0]
    assert all(np.isfinite(float(v)) for v in out.values())


def test_isaid_layout_and_palette(tmp_path):
    from ever_tpu.data.benchmarks import ISAID_PALETTE

    root = _make_isaid(tmp_path)
    ds = registry.DATASET['isaid'](dict(root=root, split='train',
                                        crop_size=32))
    assert len(ds) == 3                    # masks not listed as images
    img, mask = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert mask.shape == (32, 32)
    assert set(np.unique(mask)) <= set(ISAID_PALETTE.values())
    # unknown colors decode to ignore
    raw = np.zeros((4, 4, 3), np.uint8)
    raw[..., 0] = 17
    assert (ds._decode_mask(raw) == 255).all()
    # Semantic_masks/ subdirectory layout also resolves
    import shutil
    sm = tmp_path / 'isaid' / 'val' / 'Semantic_masks' / 'images'
    sm.mkdir(parents=True)
    for p in (tmp_path / 'isaid' / 'val' / 'images').glob('*_instance_color_RGB.png'):
        shutil.move(str(p), sm / p.name)
    ds_v = registry.DATASET['isaid'](dict(root=root, split='val'))
    _, m = ds_v[0]
    assert m.shape == (64, 64)


def test_benchmark_configs_build_models():
    """Every project_template config's model section must build."""
    import os
    from ever_tpu.core.config import import_config

    cfg_dir = os.path.join(os.path.dirname(ever_tpu.__file__), '..',
                           'project_template', 'configs')
    n = 0
    for name in sorted(os.listdir(cfg_dir)):
        if not name.endswith('.py'):
            continue
        cfg = import_config(os.path.join(cfg_dir, name))
        cfg.model.params['dtype'] = 'float32'
        model = builder.make_model(cfg.model)
        assert model is not None, name
        assert cfg.data.train.type in registry.DATASET, name
        n += 1
    assert n >= 5


def test_changeos_auto_damage_eval(tmp_path):
    """The launcher auto-routes {'loc','damage'} labels to the
    damage-assessment eval: argmax(damage) gated by the loc head."""
    from ever_tpu.core.launcher import Launcher

    root = _make_xview2(tmp_path, n=2, size=32)
    ds = registry.DATASET['xview2'](dict(root=root, split='hold',
                                         batch_size=2,
                                         sampler_type='SequentialSampler'))
    dl = ds.to_dataloader()
    model = builder.make_model({'type': 'ChangeOS', 'params': dict(
        encoder=dict(resnet_type='resnet18'),
        fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=16),
        decoder=dict(in_channels=16, out_channels=16,
                     in_feat_output_strides=(4, 8, 16, 32),
                     out_feat_output_stride=4),
        damage_classes=5, loss=dict(ignore_index=255))})
    factory, _ = builder.make_optimizer({'type': 'sgd', 'params': dict()})
    tl = Launcher(str(tmp_path / 'run'), model, factory.build(0.01), None)
    tl.init_state(next(iter(dl)))
    acc = tl.evaluate(dl)
    assert acc is not None
    assert 0.0 <= float(np.mean(acc.iou())) <= 1.0


def test_levircd_change_detection_eval(tmp_path):
    """{'change'} labels auto-route to the binary change-detection eval."""
    from ever_tpu.core.launcher import Launcher

    root = _make_levircd(tmp_path, n=2, size=32)
    ds = registry.DATASET['levircd'](dict(root=root, split='test',
                                          batch_size=2,
                                          sampler_type='SequentialSampler'))
    dl = ds.to_dataloader()
    model = builder.make_model({'type': 'ChangeMask', 'params': dict(
        encoder=dict(resnet_type='resnet18'),
        fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=16),
        decoder=dict(in_channels=16, out_channels=16,
                     in_feat_output_strides=(4, 8, 16, 32),
                     out_feat_output_stride=4),
        classes=2, loss=dict(ignore_index=255))})
    factory, _ = builder.make_optimizer({'type': 'sgd', 'params': dict()})
    tl = Launcher(str(tmp_path / 'run'), model, factory.build(0.01), None)
    tl.init_state(next(iter(dl)))
    acc = tl.evaluate(dl)
    assert acc is not None
    # two rows (no-change / change) + mean/OA/Kappa footer
    assert len(acc.rows) >= 2


def test_scene_smaller_than_crop_is_padded(tmp_path):
    """Training scenes smaller than crop_size pad (image 0, label ignore)
    instead of silently skipping the crop and crashing np.stack on the
    mixed-size batch."""
    root = _make_levircd(tmp_path, n=2, size=24)   # 24 < crop 32
    ds = registry.DATASET['levircd'](dict(root=root, split='train',
                                          crop_size=32))
    x, y = ds[0]
    assert x.shape == (32, 32, 6)
    assert y['change'].shape == (32, 32)
    # the pad region (32² − 24² = 448 px) is ignore-labeled and zero-imaged;
    # the random hflip may mirror it, so count rather than index
    assert int((y['change'] == 255).sum()) == 448
    assert int((x == 0).all(axis=-1).sum()) >= 448

    iroot = _make_isaid(tmp_path, n=2, size=24)
    img, mask = registry.DATASET['isaid'](dict(root=iroot, split='train',
                                               crop_size=32))[0]
    assert img.shape == (32, 32, 3) and mask.shape == (32, 32)
    assert int((mask == 255).sum()) == 448


def test_partial_labels_fail_at_construction(tmp_path):
    """A split with SOME labels missing must fail at construction (mixed
    tuple/bare samples would crash default_collate mid-epoch)."""
    root = _make_levircd(tmp_path, n=3, size=24)
    import os
    os.remove(os.path.join(root, 'train', 'label', '0001.png'))
    with pytest.raises(FileNotFoundError, match='missing their label'):
        registry.DATASET['levircd'](dict(root=root, split='train'))

    # ALL labels missing is a valid (test) split
    for f in list((tmp_path / 'levircd' / 'test' / 'label').glob('*.png')):
        f.unlink()
    ds = registry.DATASET['levircd'](dict(root=root, split='test'))
    x = ds[0]
    assert not isinstance(x, tuple) and x.shape == (24, 24, 6)
