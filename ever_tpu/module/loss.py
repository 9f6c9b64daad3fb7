"""Segmentation losses (NHWC logits, ``ignore_index`` aware, registered in LOSS).

Parity target: ``ever/module/loss.py``.  Structural differences forced (and
*simplified*) by XLA:

- No dynamic-shape ``masked_select``: ignore handling is mask-weighted
  arithmetic with static shapes (same math; the reference's
  ``select``/``_masked_ignore`` jit-scripts disappear).
- The reference's cross-rank synchronized statistics use a *differentiable*
  ``torch.distributed.nn.all_reduce`` (``loss.py:20-23,41-75``).  Under
  SPMD ``jit`` with a batch sharded over the mesh, every ``jnp.sum`` over the
  batch axis already reduces globally (XLA inserts the collective, and it is
  differentiable by construction) — so ``sync_statistics`` needs no code.
  When used under ``shard_map``/``pmap`` with an explicit axis, pass
  ``axis_name`` to psum the statistics.
- Logits are [N, H, W, C]; labels are [N, H, W] int (or float for binary).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ever_tpu.core import registry

__all__ = [
    'softmax_ce_loss_with_logits', 'dice_loss_with_logits',
    'tversky_loss_with_logits', 'online_hard_example_mining', 'focal_loss',
    'sigmoid_focal_loss', 'label_smoothing_cross_entropy',
    'label_smoothing_binary_cross_entropy', 'binary_cross_entropy_with_logits',
    'soft_cross_entropy',
]


def _maybe_psum(x, axis_name: Optional[str]):
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


def _valid_mask(y_true, ignore_index: int):
    return (y_true != ignore_index).astype(jnp.float32)


def _flatten_logits(y_pred, y_true):
    c = y_pred.shape[-1]
    return y_pred.reshape(-1, c).astype(jnp.float32), y_true.reshape(-1)


@registry.LOSS.register('softmax_ce')
def softmax_ce_loss_with_logits(y_pred, y_true, ignore_index: int = 255,
                                reduction: str = 'mean',
                                class_weight: Optional[Sequence[float]] = None):
    """Masked-mean pixel cross-entropy (the reference reaches this through
    ``F.cross_entropy(ignore_index=...)`` in user models)."""
    y_pred, y_true = _flatten_logits(y_pred, y_true)
    c = y_pred.shape[-1]
    valid = _valid_mask(y_true, ignore_index)
    labels = jnp.where(y_true == ignore_index, 0, y_true)
    logp = jax.nn.log_softmax(y_pred, axis=-1)
    # one-hot contraction instead of take_along_axis: per-row gathers are
    # pathologically slow on TPU (measured +30ms on a 512² batch-8 step)
    onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)
    nll = -jnp.sum(logp * onehot, axis=-1)
    if class_weight is not None:
        w = jnp.asarray(class_weight, jnp.float32)[labels]
        nll = nll * w
        valid_w = valid * w
    else:
        valid_w = valid
    nll = nll * valid
    if reduction == 'mean':
        return jnp.sum(nll) / jnp.maximum(jnp.sum(valid_w), 1.0)
    if reduction == 'sum':
        return jnp.sum(nll)
    return nll


def _dice_stats(y_prob, y_onehot, valid, axis_name):
    """Per-class (intersection, denominator) sums over valid pixels."""
    y_prob = y_prob * valid[:, None]
    y_onehot = y_onehot * valid[:, None]
    inter = jnp.sum(y_prob * y_onehot, axis=0)
    z = jnp.sum(y_prob, axis=0) + jnp.sum(y_onehot, axis=0)
    return _maybe_psum(inter, axis_name), _maybe_psum(z, axis_name)


@registry.LOSS.register('dice')
def dice_loss_with_logits(y_pred, y_true, smooth_value: float = 1.0,
                          ignore_index: int = 255, ignore_channel: int = -1,
                          axis_name: Optional[str] = None, **_compat):
    """Dice loss with globally-synchronized statistics
    (parity: ``ever/module/loss.py:41-75``)."""
    c = y_pred.shape[-1]
    y_pred, y_true = _flatten_logits(y_pred, y_true)
    valid = _valid_mask(y_true, ignore_index)
    if c == 1:
        y_prob = jax.nn.sigmoid(y_pred)
        y_onehot = y_true.reshape(-1, 1).astype(jnp.float32)
    else:
        y_prob = jax.nn.softmax(y_pred, axis=-1)
        labels = jnp.where(y_true == ignore_index, 0, y_true)
        y_onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)
    inter, z = _dice_stats(y_prob, y_onehot, valid, axis_name)
    coeff = (2.0 * inter + smooth_value) / (z + smooth_value)
    if ignore_channel != -1 and c > 1:
        keep = jnp.ones((c,), bool).at[ignore_channel].set(False)
        coeff = jnp.sum(jnp.where(keep, coeff, 0.0)) / jnp.sum(keep)
    else:
        coeff = jnp.mean(coeff)
    return 1.0 - coeff


@registry.LOSS.register('tversky')
def tversky_loss_with_logits(y_pred, y_true,
                             alpha: Union[float, Sequence[float]],
                             beta: Optional[float] = None, gamma: float = 1.0,
                             smooth_value: float = 1.0, ignore_index: int = 255,
                             reduction: str = 'mean',
                             axis_name: Optional[str] = None, **_compat):
    """(Focal-)Tversky loss with synchronized statistics
    (parity: ``ever/module/loss.py:78-145``)."""
    c = y_pred.shape[-1]
    y_pred, y_true = _flatten_logits(y_pred, y_true)
    valid = _valid_mask(y_true, ignore_index)
    if isinstance(alpha, (list, tuple)):
        alpha = jnp.asarray(alpha, jnp.float32)
    if beta is None:
        beta = 1.0 - alpha
    if c > 1:
        y_prob = jax.nn.softmax(y_pred, axis=-1)
        labels = jnp.where(y_true == ignore_index, 0, y_true)
        y_onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)
    else:
        y_prob = jax.nn.sigmoid(y_pred)
        y_onehot = y_true.reshape(-1, 1).astype(jnp.float32)
    y_prob = y_prob * valid[:, None]
    y_onehot = y_onehot * valid[:, None]
    tp = jnp.sum(y_prob * y_onehot, axis=0)
    fp = jnp.sum(y_prob, axis=0) - tp
    fn = jnp.sum(y_onehot, axis=0) - tp
    num = _maybe_psum(tp, axis_name) + smooth_value
    den = _maybe_psum(tp + alpha * fn + beta * fp, axis_name) + smooth_value
    loss = (1.0 - num / den) ** gamma
    if reduction == 'mean':
        return jnp.mean(loss)
    if reduction == 'none':
        return loss
    raise ValueError(f'unknown reduction: {reduction}')


@registry.LOSS.register('ohem')
def online_hard_example_mining(losses, keep_ratio: float):
    """Top-k hard example mean (parity: ``ever/module/loss.py:148-158``).
    ``losses`` is any-shape per-element loss; k is static."""
    if not 0 < keep_ratio < 1:
        raise ValueError('The value of keep_ratio must be from 0 to 1.')
    flat = losses.reshape(-1).astype(jnp.float32)
    k = max(int(keep_ratio * flat.shape[0]), 1)
    top, _ = jax.lax.top_k(flat, k)
    nonzero = (top != 0).astype(jnp.float32)
    return jnp.sum(top * nonzero) / jnp.maximum(jnp.sum(nonzero), 1.0)


def _bce_with_logits(y_pred, y_true):
    # numerically stable BCE-with-logits
    return jnp.maximum(y_pred, 0) - y_pred * y_true + jnp.log1p(jnp.exp(-jnp.abs(y_pred)))


@registry.LOSS.register('focal')
def focal_loss(y_pred, y_true, gamma: float = 2.0, normalize: bool = False):
    """Binary focal loss with stop-gradient modulating factor
    (parity: ``ever/module/loss.py:161-177``)."""
    y_pred = y_pred.astype(jnp.float32)
    y_true = y_true.astype(jnp.float32)
    p = jax.lax.stop_gradient(jax.nn.sigmoid(y_pred))
    pt = (1 - p) * y_true + p * (1 - y_true)
    mod = pt ** gamma
    losses = _bce_with_logits(y_pred, y_true)
    if normalize:
        modulated = losses * mod
        scale = jnp.sum(losses) / jnp.maximum(jnp.sum(modulated), 1e-12)
        return jnp.sum(modulated) * scale
    return jnp.mean(losses * mod)


@registry.LOSS.register('sigmoid_focal')
def sigmoid_focal_loss(y_pred, y_true, alpha: float = -1, gamma: float = 2,
                       reduction: str = 'mean'):
    """fvcore-style focal loss (parity: ``ever/module/loss.py:180-204``)."""
    y_pred = y_pred.astype(jnp.float32)
    y_true = y_true.astype(jnp.float32)
    p = jax.nn.sigmoid(y_pred)
    ce = _bce_with_logits(y_pred, y_true)
    p_t = p * y_true + (1 - p) * (1 - y_true)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * y_true + (1 - alpha) * (1 - y_true)
        loss = alpha_t * loss
    if reduction == 'mean':
        return jnp.mean(loss)
    if reduction == 'sum':
        return jnp.sum(loss)
    return loss


@registry.LOSS.register('label_smoothing_ce')
def label_smoothing_cross_entropy(output, target, eps: float = 0.1,
                                  reduction: str = 'mean', ignore_index: int = -1):
    """Label-smoothed CE (parity: ``ever/module/loss.py:207-218``)."""
    output, target = _flatten_logits(output, target)
    c = output.shape[-1]
    valid = _valid_mask(target, ignore_index)
    labels = jnp.where(target == ignore_index, 0, target)
    logp = jax.nn.log_softmax(output, axis=-1)
    smooth_term = -jnp.sum(logp, axis=-1) * valid
    onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)
    nll = -jnp.sum(logp * onehot, axis=-1) * valid
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    if reduction == 'mean':
        smooth_term, nll = jnp.sum(smooth_term) / denom, jnp.sum(nll) / denom
    elif reduction == 'sum':
        smooth_term, nll = jnp.sum(smooth_term), jnp.sum(nll)
    return smooth_term * eps / c + (1 - eps) * nll


@registry.LOSS.register('label_smoothing_bce')
def label_smoothing_binary_cross_entropy(output, target, eps: float = 0.1,
                                         reduction: str = 'mean',
                                         ignore_index: int = 255):
    """Smoothed binary CE (parity: ``ever/module/loss.py:221-226``)."""
    output = output.reshape(-1).astype(jnp.float32)
    target = target.reshape(-1).astype(jnp.float32)
    valid = (target != ignore_index).astype(jnp.float32)
    t = jnp.where(target == 0, target + eps, target - eps)
    losses = _bce_with_logits(output, jnp.where(valid > 0, t, 0.0)) * valid
    if reduction == 'mean':
        return jnp.sum(losses) / jnp.maximum(jnp.sum(valid), 1.0)
    if reduction == 'sum':
        return jnp.sum(losses)
    return losses


@registry.LOSS.register('bce')
def binary_cross_entropy_with_logits(output, target, reduction: str = 'mean',
                                     ignore_index: int = 255, pos_weight=None):
    """Masked BCE (parity: ``ever/module/loss.py:229-235``)."""
    output = output.reshape(-1).astype(jnp.float32)
    target = target.reshape(-1).astype(jnp.float32)
    valid = (target != ignore_index).astype(jnp.float32)
    t = jnp.where(valid > 0, target, 0.0)
    losses = _bce_with_logits(output, t)
    if pos_weight is not None:
        # torch semantics: weight the positive term
        losses = losses + (pos_weight - 1.0) * t * (
            jnp.log1p(jnp.exp(-jnp.abs(output))) + jnp.maximum(-output, 0))
    losses = losses * valid
    if reduction == 'mean':
        return jnp.sum(losses) / jnp.maximum(jnp.sum(valid), 1.0)
    if reduction == 'sum':
        return jnp.sum(losses)
    return losses


@registry.LOSS.register('soft_ce')
def soft_cross_entropy(input, target):
    """Soft-label CE over NHWC (parity: ``ever/module/loss.py:238-242``)."""
    assert input.ndim == 4 and target.ndim == 4
    logp = jax.nn.log_softmax(input.astype(jnp.float32), axis=-1)
    return -jnp.sum(jnp.mean(target * logp, axis=(0, 1, 2)))


# -- reference spellings (loss.py:20-51) --------------------------------------

def all_reduce_sum(x, axis_name: Optional[str] = None):
    """Differentiable cross-replica sum (parity: ``ever/module/loss.py:20-23``,
    the one gradient-carrying collective).  ``jax.lax.psum`` is differentiable
    by construction; with no mesh axis it is the identity."""
    return _maybe_psum(x, axis_name)


def select(y_pred, y_true, ignore_index: int = 255):
    """Mask out ignored pixels (parity: ``ever/module/loss.py:26-37``).

    The reference gathers valid rows (data-dependent shapes); under XLA we
    keep static shapes and return ``(y_pred_flat, y_true_flat, valid_mask)``
    — every loss in this module consumes the mask form.
    """
    y_pred, y_true = _flatten_logits(y_pred, y_true)
    return y_pred, y_true, _valid_mask(y_true, ignore_index)


def dice_coeff(y_prob, y_onehot, valid=None, smooth_value: float = 1.0,
               axis_name: Optional[str] = None):
    """Mean per-class dice coefficient over valid pixels (parity:
    ``ever/module/loss.py:40-51``; statistics cross-replica-summed when
    ``axis_name`` is given, mirroring ``sync_statistics=True``)."""
    if valid is None:
        valid = jnp.ones(y_prob.shape[0], jnp.float32)
    inter, z = _dice_stats(y_prob, y_onehot, valid, axis_name)
    return jnp.mean((2.0 * inter + smooth_value) / (z + smooth_value))


__all__ += ['all_reduce_sum', 'select', 'dice_coeff']
