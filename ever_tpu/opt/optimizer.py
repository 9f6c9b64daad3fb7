"""Optimizers (registered in ``OPT``) as optax factories.

Parity with ``ever/opt/optimizer.py:7-15`` (sgd / adam / adamw registered with
torch-style kwargs) plus the gradient-application semantics of
``ever/interface/module.py:83-108``: unscale → clip-by-global-norm (default
``max_norm=35, norm_type=2``) → step → zero.  In JAX this whole sequence is a
single optax chain applied inside the jitted train step; fp16 GradScaler
machinery is unnecessary on TPU (bf16 keeps fp32 exponent range, see
``SURVEY.md §5.9``).

Each registry entry returns an :class:`OptimizerFactory`; the trainer later
calls ``factory.build(schedule, grad_clip=..., param_groups=...)`` to obtain
the final ``optax.GradientTransformation``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ever_tpu.core import registry

# Reference default clip (``ever/interface/module.py:96-108``).
DEFAULT_GRAD_CLIP = dict(max_norm=35.0)


class ClipByGlobalNormState(NamedTuple):
    """Carries the pre-clip gradient norm so the train step can report it
    without a SECOND ``optax.global_norm`` — measured on TPU, a separate
    norm over the grads doubles the step time (XLA re-materialises the
    backward instead of CSE-ing with the clip's own norm)."""

    grad_norm: jnp.ndarray


def clip_by_global_norm_recording(
        max_norm: Optional[float]) -> optax.GradientTransformation:
    """``optax.clip_by_global_norm`` that records the norm in its state.

    Clip semantics match the reference (`clip_grad`,
    ``ever/interface/module.py:96-108``): scale = min(1, max_norm / norm).
    ``max_norm=None`` records the norm WITHOUT scaling — the grad_norm
    metric pathway for unclipped configs (the reference clips only when
    the config has a grad_clip key).
    """

    def init_fn(params):
        del params
        return ClipByGlobalNormState(jnp.zeros((), jnp.float32))

    def update_fn(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)
        if max_norm is not None:
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            updates = jax.tree.map(lambda u: u * scale, updates)
        return updates, ClipByGlobalNormState(jnp.asarray(norm, jnp.float32))

    return optax.GradientTransformation(init_fn, update_fn)


def find_recorded_grad_norm(opt_state) -> Optional[jnp.ndarray]:
    """Fish the recorded pre-clip norm out of a (possibly nested) opt state."""
    found = []

    def visit(node):
        if isinstance(node, ClipByGlobalNormState):
            found.append(node.grad_norm)
            return
        # optax nests states in tuples/NamedTuples AND dicts (e.g.
        # multi_transform's PartitionState.inner_states, used by the
        # freeze_at/frozen_prefixes build path) — recurse both
        if isinstance(node, tuple):
            for child in node:
                visit(child)
        elif isinstance(node, dict):
            for child in node.values():
                visit(child)
        elif hasattr(node, 'inner_state'):
            visit(node.inner_state)
        elif hasattr(node, 'inner_states'):
            visit(node.inner_states)

    visit(opt_state)
    return found[0] if found else None


class OptimizerFactory:
    """Deferred optax optimizer: torch-style kwargs now, schedule at build time."""

    def __init__(self, fn: Callable[..., optax.GradientTransformation], **params):
        self._fn = fn
        self.params = dict(params)

    def build(self,
              learning_rate,
              grad_clip: Optional[dict] = None,
              param_groups: Optional[Tuple[Any, Dict[str, float]]] = None,
              frozen_prefixes: Optional[Tuple[str, ...]] = None,
              ) -> optax.GradientTransformation:
        """Build the full update chain.

        - ``learning_rate``: float or ``step -> lr`` schedule.
        - ``grad_clip``: ``{'max_norm': float}``; None (default) trains
          UNCLIPPED like a reference config without the key
          (parity: ``optimizer.er_config['grad_clip']`` lookup,
          ``ever/core/builder.py:15-22`` + ``interface/module.py:96-108``).
        - ``param_groups``: optional ``(labels_pytree, {label: lr_mult})`` for
          per-group LR multipliers (parity: ``custom_param_groups``,
          ``ever/interface/module.py:73-74`` / ``trainer/trainer.py:84-119``).
        - ``frozen_prefixes``: param-path prefixes excluded from optimization
          (parity: ``freeze_at``/``frozen_stages``, ``resnet.py:162-173``).
        """
        parts = []
        if grad_clip:
            parts.append(clip_by_global_norm_recording(
                float(grad_clip.get('max_norm', 35.0))))
        else:
            # reference parity: no grad_clip key -> train UNCLIPPED
            # (ever/interface/module.py:96-108 runs only when configured);
            # the record-only transform keeps the grad_norm metric
            parts.append(clip_by_global_norm_recording(None))
        core = self._make_core(learning_rate)
        if param_groups is not None:
            labels, mults = param_groups
            scaled = {
                label: optax.chain(core, optax.scale(float(mult)))
                for label, mult in mults.items()
            }
            parts.append(optax.multi_transform(scaled, labels))
        else:
            parts.append(core)
        if frozen_prefixes:
            from ever_tpu.util.param_util import freeze_mask
            import jax as _jax

            def label_fn(params):
                mask = freeze_mask(params, frozen_prefixes)
                return _jax.tree.map(lambda trainable: 'train' if trainable
                                     else 'frozen', mask)

            # frozen subtrees get hard-zero updates (optax.masked would pass
            # the raw gradient through for masked-out leaves)
            return optax.multi_transform(
                {'train': optax.chain(*parts), 'frozen': optax.set_to_zero()},
                label_fn)
        return optax.chain(*parts)

    def _make_core(self, learning_rate) -> optax.GradientTransformation:
        return self._fn(learning_rate=learning_rate, **self.params)


def _sgd(learning_rate, momentum: float = 0.0, weight_decay: float = 0.0,
         nesterov: bool = False, dampening: float = 0.0):
    if dampening:
        raise NotImplementedError('sgd dampening is not supported')
    parts = []
    if weight_decay:
        # torch SGD applies L2 before momentum: grad += wd * param.
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.sgd(learning_rate, momentum=momentum or None, nesterov=nesterov))
    return optax.chain(*parts)


def _adam(learning_rate, betas=(0.9, 0.999), eps: float = 1e-8, weight_decay: float = 0.0):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps))
    return optax.chain(*parts)


def _adamw(learning_rate, betas=(0.9, 0.999), eps: float = 1e-8, weight_decay: float = 0.01):
    return optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay)


def _lamb(learning_rate, betas=(0.9, 0.999), eps: float = 1e-6, weight_decay: float = 0.0):
    return optax.lamb(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                      weight_decay=weight_decay)


def _factory(fn):
    def make(**params) -> OptimizerFactory:
        return OptimizerFactory(fn, **params)
    return make


registry.OPT.register('sgd', _factory(_sgd))
registry.OPT.register('adam', _factory(_adam))
registry.OPT.register('adamw', _factory(_adamw))
# TPU-native extra (no apex fused_adam needed; XLA fuses the update):
registry.OPT.register('lamb', _factory(_lamb))
# 'fused_adam' parity alias — on TPU plain adam *is* fused by XLA.
registry.OPT.register('fused_adam', _factory(_adam))

__all__ = ['OptimizerFactory', 'DEFAULT_GRAD_CLIP',
           'clip_by_global_norm_recording', 'find_recorded_grad_norm',
           'ClipByGlobalNormState']
