"""DinoSeg fine-tune model + ViT remat knob (the transformer training path).

The remat knob is the TPU analog of the reference's per-stage ``with_cp``
gradient checkpointing (``ever/module/resnet.py:189-208``) applied to the
DINOv3 trunk; DinoSeg is the dense fine-tune protocol over
``get_intermediate_layers`` (``vision_transformer.py:296-333``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ever_tpu.core import builder
from ever_tpu.parallel.spmd import build_train_step, create_train_state


def _data(batch=2, size=32, classes=7, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(batch, size, size, 3)).astype(np.float32)
    y = rng.integers(0, classes, size=(batch, size, size)).astype(np.int32)
    return x, y


def test_dinoseg_train_step_and_eval():
    x, y = _data()
    model = builder.make_model({'type': 'DinoSeg', 'params': dict(
        backbone=dict(name='vit_small', drop_path_rate=0.1),
        classes=7)})
    tx = optax.sgd(0.01)
    state = create_train_state(model, tx, (x, y))
    step = build_train_step(model, tx, donate=False)
    state, metrics = step(state, (jnp.asarray(x), jnp.asarray(y)))
    assert np.isfinite(float(metrics['cls_loss']))
    assert float(metrics['total_loss']) == pytest.approx(
        float(metrics['cls_loss']))
    prob = model.apply({'params': state.params}, jnp.asarray(x), train=False)
    assert prob.shape == (2, 32, 32, 7)
    np.testing.assert_allclose(np.asarray(jnp.sum(prob, -1)), 1.0, atol=1e-5)


def test_dinoseg_sat_preset_geometry():
    """The sat493m preset keys (LayerScale, rope rescale, eps 1e-5) reach the
    trunk; user backbone keys override the preset."""
    model = builder.make_model({'type': 'DinoSeg', 'params': dict(
        backbone=dict(name='vitl16_sat493m', drop_path_rate=0.2),
        classes=3)})
    bound = model.bind({'params': {}})
    assert bound.vit.layerscale_init == 1e-5
    assert bound.vit.pos_embed_rope_rescale_coords == 2.0
    assert bound.vit.norm_eps == 1e-5
    assert bound.vit.drop_path_rate == 0.2
    assert bound.vit.vit_type == 'vit_large'


def test_dinoseg_unknown_backbone_raises():
    model = builder.make_model({'type': 'DinoSeg', 'params': dict(
        backbone=dict(name='vit_nonexistent'), classes=3)})
    x, y = _data()
    with pytest.raises(ValueError, match='unknown ViT backbone'):
        model.init({'params': jax.random.key(0), 'dropout': jax.random.key(1)},
                   x, y, train=True)


@pytest.mark.parametrize('mode', ['full', 'dots'])
def test_remat_grads_match_unrematted(mode):
    """Per-block remat must not change the math: grads equal to the plain
    trunk's at fp32 tolerance (no stochastic depth so forwards agree)."""
    x, y = _data()
    plain = builder.make_model({'type': 'DinoSeg', 'params': dict(
        backbone=dict(name='vit_small'), classes=7)})
    remat = builder.make_model({'type': 'DinoSeg', 'params': dict(
        backbone=dict(name='vit_small', remat=mode), classes=7)})
    v = plain.init({'params': jax.random.key(0), 'dropout': jax.random.key(1)},
                   x, y, train=True)

    def loss(mod, p):
        d = mod.apply({'params': p}, x, y, train=True,
                      rngs={'dropout': jax.random.key(2)})
        return d['cls_loss']

    g1 = jax.grad(lambda p: loss(plain, p))(v['params'])
    g2 = jax.grad(lambda p: loss(remat, p))(v['params'])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_remat_invalid_mode_raises():
    model = builder.make_model({'type': 'DinoSeg', 'params': dict(
        backbone=dict(name='vit_small', remat='bogus'), classes=7)})
    x, y = _data()
    with pytest.raises(ValueError, match='remat'):
        model.init({'params': jax.random.key(0), 'dropout': jax.random.key(1)},
                   x, y, train=True)


def test_vitencoder_remat_plumbs_through():
    enc = builder.make_model({'type': 'ViTEncoder', 'params': dict(
        vit_type='vit_small', remat='full')})
    x = np.random.default_rng(0).normal(size=(1, 32, 32, 3)).astype(np.float32)
    v = enc.init({'params': jax.random.key(0)}, x)
    feats = enc.apply(v, jnp.asarray(x))
    assert len(feats) == 4  # os4/8/16/32 pyramid still produced under remat
