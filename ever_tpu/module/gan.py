"""DCGAN generator/discriminator pair for the GAN training contract.

The reference ships GAN *infrastructure* (``THDDPGANTrainer``/``GANLauncher``,
``ever/trainer/th_ddp_trainer.py:43-90``: a model exposing ``.G``/``.D`` whose
``forward_backward`` drives both optimizers) but no in-tree GAN model.  This
module provides a first-class one so the dual-optimizer path
(``ever_tpu/trainer/gan.py``) is exercisable end-to-end: a standard DCGAN
with the ever_tpu GAN contract — ``d_loss(batch, train)`` /
``g_loss(batch, train)`` each taking the batch whole and returning a loss
dict (keys ending in ``loss`` are summed).

Params nest under top-level ``G`` / ``D`` keys (flax setup attribute names),
which is exactly the split ``build_gan_train_step`` differentiates per role.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ever_tpu.core import registry
from ever_tpu.interface.module import ERModule

Dtype = Any

__all__ = ['DCGAN', 'DCGANGenerator', 'DCGANDiscriminator']


class DCGANGenerator(nn.Module):
    image_size: int = 64
    channels: int = 3
    latent_dim: int = 128
    base_width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = False):
        size = 4
        n_up = 0
        while size < self.image_size:
            size *= 2
            n_up += 1
        width = self.base_width * (2 ** min(n_up - 1, 3))
        x = nn.Dense(4 * 4 * width, dtype=self.dtype, name='fc')(z)
        x = x.reshape(z.shape[0], 4, 4, width)
        x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype, name='bn_fc')(x))
        for i in range(n_up):
            width = max(self.base_width, width // 2)
            last = i == n_up - 1
            out_ch = self.channels if last else width
            x = nn.ConvTranspose(out_ch, (4, 4), strides=(2, 2),
                                 padding='SAME', dtype=self.dtype,
                                 name=f'up{i}')(x)
            if last:
                return jnp.tanh(x)
            x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                     dtype=self.dtype, name=f'bn{i}')(x))
        return jnp.tanh(x)


class DCGANDiscriminator(nn.Module):
    base_width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = self.base_width
        i = 0
        while x.shape[1] > 4:
            x = nn.Conv(width, (4, 4), strides=(2, 2), padding='SAME',
                        dtype=self.dtype, name=f'down{i}')(x)
            if i > 0:   # DCGAN: no norm on the first conv
                x = nn.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype, name=f'bn{i}')(x)
            x = nn.leaky_relu(x, 0.2)
            width = min(width * 2, self.base_width * 8)
            i += 1
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1, dtype=self.dtype, name='logit')(x)[:, 0]


@registry.MODEL.register()
class DCGAN(ERModule):
    """Unconditional DCGAN under the ever_tpu GAN contract.

    ``batch`` = real images in [-1, 1], NHWC.  The latent is sampled from
    the ``dropout`` rng stream (the one the GAN step threads per role).
    """

    def set_default_config(self):
        self.config.update(dict(
            image_size=64,
            channels=3,
            latent_dim=128,
            base_width=64,
            dtype='float32',
        ))

    def setup(self):
        dtype = jnp.dtype(self.config.dtype)
        self.G = DCGANGenerator(
            image_size=int(self.config.image_size),
            channels=int(self.config.channels),
            latent_dim=int(self.config.latent_dim),
            base_width=int(self.config.base_width), dtype=dtype)
        self.D = DCGANDiscriminator(
            base_width=int(self.config.base_width), dtype=dtype)

    def _latent(self, n):
        rng = self.make_rng('dropout')
        return jax.random.normal(rng, (n, int(self.config.latent_dim)),
                                 jnp.dtype(self.config.dtype))

    def d_loss(self, batch, train: bool = False):
        real = batch.astype(jnp.dtype(self.config.dtype))
        fake = self.G(self._latent(real.shape[0]), train)
        logit_real = self.D(real, train).astype(jnp.float32)
        logit_fake = self.D(fake, train).astype(jnp.float32)
        # non-saturating BCE: real -> 1, fake -> 0
        loss = jnp.mean(jax.nn.softplus(-logit_real)) + \
            jnp.mean(jax.nn.softplus(logit_fake))
        return dict(d_loss=loss,
                    d_real_acc=jnp.mean((logit_real > 0).astype(jnp.float32)))

    def g_loss(self, batch, train: bool = False):
        fake = self.G(self._latent(batch.shape[0]), train)
        logit_fake = self.D(fake, train).astype(jnp.float32)
        return dict(g_loss=jnp.mean(jax.nn.softplus(-logit_fake)))

    def generate(self, z, train: bool = False):
        return self.G(z, train)

    def __call__(self, batch, train: bool = False):
        # default forward = discriminator scores (used for init)
        return self.d_loss(batch, train)
