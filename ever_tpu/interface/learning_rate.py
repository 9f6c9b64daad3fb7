"""LR schedule contract.

Parity with ``ever/interface/learning_rate.py:1-10``, adapted to JAX: a
schedule is a *pure function of the global step* so it can live inside the
jitted train step (optax-schedule compatible).  The reference's
``step(global_step, optimizer)`` imperatively sets ``param_group['lr']``; here
``__call__(step) -> lr`` returns the value and optax applies it.
"""

from __future__ import annotations


class LearningRateBase:
    def __init__(self, base_lr: float):
        self._base_lr = float(base_lr)

    @property
    def base_lr(self) -> float:
        return self._base_lr

    def value_at(self, global_step):
        """Return the LR at ``global_step`` (jnp-traceable). Override me."""
        raise NotImplementedError

    # optax-schedule protocol
    def __call__(self, global_step):
        return self.value_at(global_step)

    # reference-surface compat: returns the lr instead of mutating an optimizer
    def step(self, global_step, optimizer=None):
        return self.value_at(global_step)


__all__ = ['LearningRateBase']
