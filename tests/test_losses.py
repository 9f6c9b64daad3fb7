"""Golden-value loss tests: jax implementations vs torch reference formulas.

The torch CPU wheel in this image lets us check numerical parity against the
exact expressions the reference uses (``ever/module/loss.py``) without copying
its code — we call torch.nn.functional directly.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

from ever_tpu.module import loss as L  # noqa: E402

RNG = np.random.default_rng(0)


def _data(n=2, h=8, w=8, c=5, ignore_frac=0.1):
    logits = RNG.normal(size=(n, h, w, c)).astype(np.float32)
    labels = RNG.integers(0, c, size=(n, h, w)).astype(np.int32)
    mask = RNG.random(size=(n, h, w)) < ignore_frac
    labels[mask] = 255
    return logits, labels


def test_softmax_ce_matches_torch():
    logits, labels = _data()
    ours = float(L.softmax_ce_loss_with_logits(logits, labels, ignore_index=255))
    t = F.cross_entropy(torch.from_numpy(logits).permute(0, 3, 1, 2),
                        torch.from_numpy(labels).long(), ignore_index=255)
    assert ours == pytest.approx(float(t), rel=1e-5)


def test_dice_matches_reference_formula():
    logits, labels = _data(ignore_frac=0.0)
    c = logits.shape[-1]
    ours = float(L.dice_loss_with_logits(logits, labels, smooth_value=1.0))
    # reference formula (loss.py:41-75) recomputed in torch
    y_prob = torch.softmax(torch.from_numpy(logits).reshape(-1, c), dim=1)
    y_onehot = F.one_hot(torch.from_numpy(labels).long().reshape(-1), c).float()
    inter = (y_prob * y_onehot).sum(0)
    z = y_prob.sum(0) + y_onehot.sum(0) + 1.0
    expected = 1.0 - ((2 * inter + 1.0) / z).mean()
    assert ours == pytest.approx(float(expected), rel=1e-5)


def test_dice_respects_ignore_index():
    logits, labels = _data(ignore_frac=0.3)
    with_ignore = float(L.dice_loss_with_logits(logits, labels))
    labels0 = labels.copy()
    labels0[labels0 == 255] = 0
    without = float(L.dice_loss_with_logits(logits, labels0))
    assert with_ignore != pytest.approx(without)


def test_tversky_equals_dice_at_half():
    """alpha=beta=0.5, gamma=1, smooth→0 → tversky == dice (the smooth term
    enters the two formulas at different scales, so equality needs smooth≈0)."""
    logits, labels = _data(ignore_frac=0.0)
    d = float(L.dice_loss_with_logits(logits, labels, smooth_value=1e-7))
    tv = float(L.tversky_loss_with_logits(logits, labels, alpha=0.5, beta=0.5,
                                          gamma=1.0, smooth_value=1e-7))
    assert tv == pytest.approx(d, rel=1e-4)


def test_bce_matches_torch():
    logits = RNG.normal(size=(64,)).astype(np.float32)
    targets = RNG.integers(0, 2, size=(64,)).astype(np.float32)
    ours = float(L.binary_cross_entropy_with_logits(logits, targets, ignore_index=255))
    t = F.binary_cross_entropy_with_logits(torch.from_numpy(logits),
                                           torch.from_numpy(targets))
    assert ours == pytest.approx(float(t), rel=1e-5)


def test_sigmoid_focal_matches_fvcore_formula():
    logits = RNG.normal(size=(32,)).astype(np.float32)
    targets = RNG.integers(0, 2, size=(32,)).astype(np.float32)
    ours = float(L.sigmoid_focal_loss(logits, targets, alpha=0.25, gamma=2.0))
    yp, yt = torch.from_numpy(logits), torch.from_numpy(targets)
    p = torch.sigmoid(yp)
    ce = F.binary_cross_entropy_with_logits(yp, yt, reduction='none')
    p_t = p * yt + (1 - p) * (1 - yt)
    loss = ce * (1 - p_t) ** 2.0
    alpha_t = 0.25 * yt + 0.75 * (1 - yt)
    expected = (alpha_t * loss).mean()
    assert ours == pytest.approx(float(expected), rel=1e-5)


def test_label_smoothing_ce_matches_torch_formula():
    logits, labels = _data(ignore_frac=0.0)
    c = logits.shape[-1]
    eps = 0.1
    ours = float(L.label_smoothing_cross_entropy(logits, labels, eps=eps,
                                                 ignore_index=-1))
    yp = torch.from_numpy(logits).reshape(-1, c)
    yt = torch.from_numpy(labels).long().reshape(-1)
    logp = F.log_softmax(yp, dim=1)
    expected = (-logp.sum(1)).mean() * eps / c + (1 - eps) * F.nll_loss(logp, yt)
    assert ours == pytest.approx(float(expected), rel=1e-5)


def test_ohem_topk():
    losses = np.array([5.0, 4.0, 3.0, 0.0, 1.0, 2.0, 0.5, 0.1], np.float32)
    out = float(L.online_hard_example_mining(losses, keep_ratio=0.5))
    assert out == pytest.approx((5 + 4 + 3 + 2) / 4)


def test_soft_cross_entropy():
    logits, _ = _data(ignore_frac=0.0)
    target = np.abs(RNG.normal(size=logits.shape)).astype(np.float32)
    target /= target.sum(-1, keepdims=True)
    ours = float(L.soft_cross_entropy(logits, target))
    logp = F.log_softmax(torch.from_numpy(logits), dim=-1)
    expected = -(torch.from_numpy(target) * logp).mean(dim=(0, 1, 2)).sum()
    assert ours == pytest.approx(float(expected), rel=1e-5)
