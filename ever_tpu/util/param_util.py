"""Parameter counting / freezing / FLOPs accounting for param pytrees.

Parity: ``ever/util/param_util.py:13-113``.  "Freezing" in JAX is an
optimizer mask, not a mutable flag: :func:`freeze_mask` builds a bool pytree
from path prefixes/predicates for ``optax.masked``/``multi_transform``.
FLOPs come from XLA's own cost analysis (replaces torchprofile).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np

from ever_tpu.core.logger import get_logger

logger = get_logger('ever_tpu.param_util')

__all__ = ['count_model_parameters', 'trainable_parameters', 'freeze_mask',
           'freeze_params', 'freeze_modules', 'freeze_bn', 'apply_freeze',
           'count_model_flops', 'param_paths', 'copy_conv_parameters',
           'copy_bn_parameters']


def count_model_parameters(params, _default_logger=logger) -> int:
    cnt = sum(int(np.prod(p.shape)) if p.ndim else 1
              for p in jax.tree.leaves(params))
    _default_logger.info('#params: %d, %s M', cnt, round(cnt / 1e6, 3))
    return cnt


def trainable_parameters(params, mask=None, _default_logger=logger) -> int:
    """Count params where ``mask`` is True (all, if no mask)."""
    if mask is None:
        return count_model_parameters(params, _default_logger)
    cnt = 0
    for p, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask)):
        if m:
            cnt += int(np.prod(p.shape)) if p.ndim else 1
    _default_logger.info('#trainable params: %d, %s M', cnt, round(cnt / 1e6, 3))
    return cnt


def param_paths(params) -> Sequence[str]:
    """Flat '/'-joined path for every leaf."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    return ['/'.join(str(getattr(k, 'key', k)) for k in path)
            for path, _ in flat]


def freeze_mask(params, frozen_prefixes: Sequence[str] = (),
                predicate: Optional[Callable[[str], bool]] = None):
    """Bool pytree: True = trainable, False = frozen.

    Matches leaves whose '/'-joined path starts with any prefix (parity with
    ``freeze_params``/``freeze_modules``/``_freeze_at``,
    ``param_util.py:37-58`` + ``resnet.py:162-173``).
    """
    def decide(path_str: str) -> bool:
        if predicate is not None and predicate(path_str):
            return False
        return not any(path_str.startswith(p) for p in frozen_prefixes)

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    flags = [decide('/'.join(str(getattr(k, 'key', k)) for k in path))
             for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, flags)


def freeze_params(params, prefix: str = ''):
    """Mask freezing every leaf under ``prefix`` (named-parity with
    ``ever/util/param_util.py:37-43``; freezing is an optimizer mask here)."""
    return freeze_mask(params, frozen_prefixes=(prefix,))


def freeze_modules(params, name_fragment: str):
    """Mask freezing every leaf whose path contains ``name_fragment``
    (named-parity with ``param_util.py:46-52``, where the selector is a
    module class; here it is a path fragment, e.g. ``'layer1'``)."""
    return freeze_mask(params, predicate=lambda p: name_fragment in p)


_BN_PAT = ('bn', 'batchnorm', 'batch_norm', 'norm')


def freeze_bn(params):
    """Mask freezing normalization scale/bias leaves (named-parity with
    ``param_util.py:55-58``).  Note running statistics live in
    ``batch_stats`` and are pinned separately via the ``Norm(frozen=True)``
    / ``batchnorm_trainable=False`` config (``module/ops.py``)."""
    def is_bn(path: str) -> bool:
        parts = path.lower().split('/')
        return any(any(p.startswith(b) or p.endswith(b) for b in _BN_PAT)
                   for p in parts[:-1])
    return freeze_mask(params, predicate=is_bn)


def apply_freeze(tx, mask):
    """Wrap an optax transform so leaves with ``mask=False`` get HARD-ZERO
    updates.  Use this (not ``optax.masked``) with the masks above:
    ``optax.masked`` passes the raw gradient through for masked-out leaves,
    which silently trains "frozen" parameters."""
    import jax as _jax
    import optax
    labels = _jax.tree.map(lambda m: 'train' if m else 'frozen', mask)
    return optax.multi_transform(
        {'train': tx, 'frozen': optax.set_to_zero()}, labels)


def copy_conv_parameters(src: dict, dst: dict) -> dict:
    """Copy conv kernel (+bias) params between matching subtrees
    (parity: ``ever/util/param_util.py:78-95``).  Returns a new dst dict."""
    out = dict(dst)
    for k in ('kernel', 'bias'):
        if k in src and k in dst:
            if np.shape(src[k]) != np.shape(dst[k]):
                raise ValueError(f'{k} shape mismatch: '
                                 f'{np.shape(src[k])} vs {np.shape(dst[k])}')
            out[k] = np.array(src[k])
    return out


def copy_bn_parameters(src_params: dict, dst_params: dict,
                       src_stats: Optional[dict] = None,
                       dst_stats: Optional[dict] = None):
    """Copy BatchNorm scale/bias (+ running stats) between matching subtrees
    (parity: ``ever/util/param_util.py:98-113``)."""
    new_params = dict(dst_params)
    for k in ('scale', 'bias'):
        if k in src_params:
            new_params[k] = np.array(src_params[k])
    if src_stats is not None and dst_stats is not None:
        new_stats = dict(dst_stats)
        for k in ('mean', 'var'):
            if k in src_stats:
                new_stats[k] = np.array(src_stats[k])
        return new_params, new_stats
    return new_params


def count_model_flops(fn: Callable, *sample_args, _default_logger=logger) -> int:
    """FLOPs of a jitted callable from XLA cost analysis
    (replaces torchprofile MACs, ``param_util.py:61-75``)."""
    lowered = jax.jit(fn).lower(*sample_args)
    analysis = lowered.compile().cost_analysis()
    flops = int(analysis.get('flops', 0)) if analysis else 0
    _default_logger.info('# FLOPs: %d, %s G', flops, round(flops / 1e9, 2))
    return flops


def count_model_params_flops(params, fn, *sample_args,
                             _default_logger=logger) -> None:
    """Log parameter count + FLOPs in one call (parity:
    ``ever/util/param_util.py:73-75``)."""
    count_model_parameters(params, _default_logger)
    count_model_flops(fn, *sample_args, _default_logger=_default_logger)


def copy_weight_bias(src: dict, dst: dict) -> dict:
    """Copy kernel/scale + bias leaves between param subtrees (parity:
    ``ever/util/param_util.py:105-113``).  Returns the updated ``dst``."""
    out = dict(dst)
    for k in ('kernel', 'weight', 'scale', 'bias'):
        if k in src and k in out:
            out[k] = src[k]
    return out


__all__ += ['count_model_params_flops', 'copy_weight_bias']
