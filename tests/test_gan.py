"""GAN trainer path: dual optimizers, D/G alternating jitted step."""

import argparse

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ever_tpu  # noqa: F401
from ever_tpu.core import registry
from ever_tpu.interface import ERDataset, ERModule
from ever_tpu.module import loss as L


class _G(nn.Module):
    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(32)(z))
        return nn.Dense(8)(h)


class _D(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(32)(x))
        return nn.Dense(1)(h)


@registry.MODEL.register('unit_test_gan')
class TinyGAN(ERModule):
    def set_default_config(self):
        self.config.update(dict(latent=4))

    def setup(self):
        self.G = _G()
        self.D = _D()

    def __call__(self, z, train: bool = False):
        return self.G(z)

    def d_loss(self, batch, train: bool = False):
        z, real = batch
        fake = jax.lax.stop_gradient(self.G(z))
        real_logit = self.D(real)
        fake_logit = self.D(fake)
        loss = (L.sigmoid_focal_loss(real_logit, jnp.ones_like(real_logit),
                                     alpha=-1, gamma=0.0)
                + L.sigmoid_focal_loss(fake_logit, jnp.zeros_like(fake_logit),
                                       alpha=-1, gamma=0.0))
        return dict(d_loss=loss)

    def g_loss(self, batch, train: bool = False):
        z, real = batch
        fake = self.G(z)
        fake_logit = self.D(fake)
        return dict(g_loss=L.sigmoid_focal_loss(
            fake_logit, jnp.ones_like(fake_logit), alpha=-1, gamma=0.0))


@registry.DATASET.register('unit_test_gan_data')
class GanData(ERDataset):
    def set_default_config(self):
        self._config.update(dict(n=16))

    def __len__(self):
        return self.config.n

    def __getitem__(self, i):
        rng = np.random.default_rng(int(i))
        return (rng.normal(size=(4,)).astype(np.float32),
                rng.normal(size=(8,)).astype(np.float32) + 3.0)


def test_gan_trainer_runs(tmp_path):
    from ever_tpu.trainer.gan import GANSPMDTrainer

    cfg = tmp_path / 'gan_cfg.py'
    cfg.write_text("""
config = dict(
    model=dict(type='unit_test_gan', params=dict()),
    data=dict(train=dict(type='unit_test_gan_data', params=dict(batch_size=8))),
    learning_rate=dict(
        G=dict(type='constant', params=dict(base_lr=1e-3)),
        D=dict(type='constant', params=dict(base_lr=2e-3))),
    optimizer=dict(
        G=dict(type='adam', params=dict()),
        D=dict(type='adam', params=dict())),
    train=dict(num_iters=4, log_interval_step=1, save_ckpt_interval_epoch=1),
)
""")
    args = argparse.Namespace(config_path=str(cfg), model_dir=str(tmp_path / 'run'),
                              trainer='gan_spmd', mixed_precision='fp32',
                              use_wandb=False, use_tensorboard=False,
                              project=None, entity=None, opts=[])
    trainer = GANSPMDTrainer(args)
    result = trainer.run()
    launcher = result['launcher']
    assert launcher.global_step == 4
    assert int(launcher.state.step) == 4
    assert set(launcher.state.opt_state) == {'G', 'D'}


def test_gan_d_and_g_params_update_independently():
    from ever_tpu.core import builder
    from ever_tpu.trainer.gan import GANState, build_gan_train_step
    import optax

    model = builder.make_model({'type': 'unit_test_gan', 'params': {}})
    z = np.zeros((4, 4), np.float32)
    real = np.ones((4, 8), np.float32)
    variables = model.init({'params': jax.random.key(0)}, (z, real),
                           method=model.d_loss, train=True)
    params = variables['params']
    txs = {'G': optax.sgd(0.1), 'D': optax.sgd(0.1)}
    state = GANState(step=jnp.zeros((), jnp.int32), params=params,
                     batch_stats={}, opt_state={r: txs[r].init(params[r])
                                                for r in txs})
    step = build_gan_train_step(model, txs, donate=False)
    new_state, metrics = step(state, (jnp.asarray(z), jnp.asarray(real)))
    assert 'D_d_loss' in metrics and 'G_g_loss' in metrics
    # both subtrees changed
    for role in ('G', 'D'):
        before = jax.tree.leaves(state.params[role])
        after = jax.tree.leaves(new_state.params[role])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_gan_steps_per_loop_raises(tmp_path):
    """steps_per_loop>1 would run the non-GAN K-loop over the dict-of-
    optimizers state — must raise an actionable error instead."""
    import pytest
    from ever_tpu.trainer.gan import GANLauncher
    tl = GANLauncher(str(tmp_path), TinyGAN({}), optimizers={},
                     lr_schedules={})
    with pytest.raises(NotImplementedError, match='steps_per_loop'):
        tl._train_loop_k(None, 2, 2, False, 1, None)


def test_gan_restore_before_init_raises(tmp_path):
    import pytest
    from ever_tpu.trainer.gan import GANLauncher
    tl = GANLauncher(str(tmp_path), TinyGAN({}), optimizers={},
                     lr_schedules={})
    with pytest.raises(RuntimeError, match='init_state'):
        tl.restore_state({}, {}, {}, 3)


def test_dcgan_model_trains():
    """The in-tree DCGAN (module/gan.py) drives the dual-optimizer step:
    BN batch_stats thread through d_loss/g_loss, both roles update, and
    generate() produces images in [-1, 1]."""
    import optax

    from ever_tpu.core import builder
    from ever_tpu.trainer.gan import build_gan_train_step, create_gan_state

    model = builder.make_model({'type': 'DCGAN', 'params': dict(
        image_size=16, channels=3, latent_dim=8, base_width=8)})
    txs = {r: optax.adam(2e-4) for r in ('G', 'D')}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 3)).astype(np.float32))
    state = create_gan_state(model, txs, x)
    assert set(state.params) >= {'G', 'D'}
    assert state.batch_stats  # DCGAN uses BatchNorm

    step = build_gan_train_step(model, txs, donate=False)
    new_state, metrics = step(state, x)
    new_state, metrics = step(new_state, x)
    assert np.isfinite(float(metrics['D_d_loss']))
    assert np.isfinite(float(metrics['G_g_loss']))
    for role in ('G', 'D'):
        before = jax.tree.leaves(state.params[role])
        after = jax.tree.leaves(new_state.params[role])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))

    z = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    imgs = model.apply({'params': new_state.params,
                        'batch_stats': new_state.batch_stats}, z,
                       method=model.generate)
    assert imgs.shape == (2, 16, 16, 3)
    assert float(jnp.max(jnp.abs(imgs))) <= 1.0
