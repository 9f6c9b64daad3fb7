"""LR schedules (registered in ``LR``), jnp-traceable.

Parity with ``ever/opt/learning_rate.py:9-157``: multistep / poly / cosine /
constant / search schedules with linear / exp / constant warmup
(``WarmupMixin``, ``learning_rate.py:14-38``).  Each schedule is a pure
``step -> lr`` function, so it composes with optax inside the jitted train
step — the imperative ``set_lr`` of the reference disappears.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ever_tpu.core import registry
from ever_tpu.interface.learning_rate import LearningRateBase


class WarmupMixin:
    """Warmup ramp applied for ``step <= warmup_step``.

    ``warmup = {type: 'linear'|'exp'|'constant', step: int, ratio: float}``
    (parity: ``ever/opt/learning_rate.py:14-38``).
    """

    def _init_warmup(self, warmup: Optional[dict]):
        self.warmup = dict(warmup) if warmup else None
        if warmup:
            self.warmup_type = warmup['type']
            self.warmup_step = int(warmup['step'])
            self.warmup_ratio = float(warmup['ratio'])
            if self.warmup_type not in ('linear', 'exp', 'constant'):
                raise ValueError(f'unknown warmup_type: {self.warmup_type}')
        else:
            self.warmup_type = None
            self.warmup_step = 0
            self.warmup_ratio = None

    def warmup_lr(self, step, base_lr):
        t = jnp.asarray(step, jnp.float32) / max(self.warmup_step, 1)
        if self.warmup_type == 'linear':
            return base_lr * (1.0 - (1.0 - t) * (1.0 - self.warmup_ratio))
        if self.warmup_type == 'exp':
            return base_lr * self.warmup_ratio ** (1.0 - t)
        return jnp.full_like(t, base_lr * self.warmup_ratio)

    def with_warmup(self, step, main_lr):
        if self.warmup is None:
            return main_lr
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(step <= self.warmup_step,
                         self.warmup_lr(step, self.base_lr), main_lr)


@registry.LR.register('multistep')
class MultiStepLearningRate(LearningRateBase, WarmupMixin):
    """``base_lr * gamma**(#milestones passed)`` (parity: ``learning_rate.py:41-86``)."""

    def __init__(self, steps, base_lr=0.1, gamma=0.1, warmup=None):
        super().__init__(base_lr)
        self._steps = np.asarray(list(steps), np.int64)
        if self._steps.shape[0] > 1 and not np.all(np.diff(self._steps) > 0):
            raise ValueError(f'milestones must be increasing: {steps}')
        self._gamma = float(gamma)
        self._init_warmup(warmup)
        if self.warmup is not None and self.warmup_step >= int(self._steps[0]):
            raise ValueError('warmup_step must precede the first milestone')

    def value_at(self, global_step):
        step = jnp.asarray(global_step, jnp.float32)
        n_passed = jnp.sum(step > jnp.asarray(self._steps, jnp.float32))
        main = self.base_lr * self._gamma ** n_passed.astype(jnp.float32)
        return self.with_warmup(step, main)


@registry.LR.register('poly')
class PolyLearningRate(LearningRateBase, WarmupMixin):
    """``base_lr * (1 - (s - w)/(max - w))**power`` (parity: ``learning_rate.py:89-120``)."""

    def __init__(self, base_lr, power, max_iters, warmup=None):
        super().__init__(base_lr)
        self.power = float(power)
        self.max_iters = int(max_iters)
        self._init_warmup(warmup)
        if self.warmup_step >= self.max_iters:
            raise ValueError('warmup_step must be < max_iters')

    def value_at(self, global_step):
        step = jnp.asarray(global_step, jnp.float32)
        frac = (step - self.warmup_step) / (self.max_iters - self.warmup_step)
        factor = jnp.maximum(1.0 - frac, 0.0) ** self.power
        return self.with_warmup(step, self.base_lr * factor)


@registry.LR.register('cosine')
class CosineAnnealingLearningRate(LearningRateBase, WarmupMixin):
    """Cosine decay to ``eta_min`` (parity: ``learning_rate.py:123-134``).

    ``warmup`` extends the reference (whose cosine schedule has none):
    transformer fine-tunes — the DinoSeg/ViT configs — need a linear ramp,
    and the reference's own ``WarmupMixin`` spelling is reused verbatim so
    one config dialect covers every schedule."""

    def __init__(self, base_lr, max_iters, eta_min=0.0, warmup=None):
        super().__init__(base_lr)
        self.eta_min = float(eta_min)
        self.max_iters = int(max_iters)
        self._init_warmup(warmup)
        if self.warmup_step >= self.max_iters:
            raise ValueError('warmup_step must be < max_iters')

    def value_at(self, global_step):
        step = jnp.asarray(global_step, jnp.float32)
        frac = ((step - self.warmup_step)
                / max(self.max_iters - self.warmup_step, 1))
        cos = jnp.cos(math.pi * jnp.clip(frac, 0.0, 1.0))
        main = self.eta_min + 0.5 * (self.base_lr - self.eta_min) * (1.0 + cos)
        return self.with_warmup(step, main)


@registry.LR.register('constant')
class ConstantLearningRate(LearningRateBase):
    """Fixed LR (parity: ``learning_rate.py:137-143``)."""

    def value_at(self, global_step):
        return jnp.full((), self.base_lr, jnp.float32)


@registry.LR.register('search')
class SearchLearningRate(LearningRateBase):
    """Exponential LR sweep for range tests (parity: ``learning_rate.py:146-157``)."""

    def __init__(self, init_lr, final_lr, max_iters):
        super().__init__(init_lr)
        if not (init_lr < final_lr and max_iters > 0):
            raise ValueError('need init_lr < final_lr and max_iters > 0')
        self.mult = (final_lr / init_lr) ** (1.0 / max_iters)

    def value_at(self, global_step):
        step = jnp.asarray(global_step, jnp.float32)
        return self.base_lr * self.mult ** step


__all__ = [
    'WarmupMixin', 'MultiStepLearningRate', 'PolyLearningRate',
    'CosineAnnealingLearningRate', 'ConstantLearningRate', 'SearchLearningRate',
]


def set_lr(opt_state, lr: float):
    """Force a learning rate into an optax state (parity:
    ``ever/opt/learning_rate.py:9-11``, which mutates torch param groups).

    Works with states produced by ``optax.inject_hyperparams`` (sets
    ``hyperparams['learning_rate']``); for plain schedule-driven states the
    schedule owns the rate and this returns the state unchanged — pass a new
    schedule instead (functional JAX has no mutable param groups).
    """
    hp = getattr(opt_state, 'hyperparams', None)
    if hp is not None and 'learning_rate' in hp:
        hp['learning_rate'] = lr
    return opt_state


__all__ += ['set_lr']
