import numpy as np
import pytest

from ever_tpu.metric import ConfusionMatrix, PixelMetric
from ever_tpu.metric.function import (
    cohen_kappa_score,
    confusion_matrix,
    mean_iou,
    overall_accuracy_score,
)


def test_confusion_matrix_counts():
    y_true = np.array([0, 0, 1, 1, 2, 2, 255], np.int32)
    y_pred = np.array([0, 1, 1, 1, 2, 0, 0], np.int32)
    cm = np.asarray(confusion_matrix(y_true, y_pred, 3))
    expected = np.array([[1, 1, 0], [0, 2, 0], [1, 0, 1]], np.float32)
    np.testing.assert_array_equal(cm, expected)  # ignore pixel dropped


def test_streaming_accumulation():
    m = ConfusionMatrix(3)
    m.forward(np.array([0, 1]), np.array([0, 1]))
    m.forward(np.array([2, 2]), np.array([2, 0]))
    assert m.dense_cm.sum() == 4
    m.reset()
    assert m.dense_cm.sum() == 0


def test_cm_from_probabilities():
    m = ConfusionMatrix(3)
    probs = np.array([[0.1, 0.8, 0.1], [0.9, 0.05, 0.05]], np.float32)
    m.forward(np.array([1, 0]), probs)
    assert m.dense_cm[1, 1] == 1 and m.dense_cm[0, 0] == 1


def test_metrics_vs_sklearn_formulas():
    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 4, 1000)
    y_pred = rng.integers(0, 4, 1000)
    cm = np.asarray(confusion_matrix(y_true, y_pred, 4))
    # OA
    oa = float(overall_accuracy_score(cm))
    assert oa == pytest.approx((y_true == y_pred).mean(), abs=1e-5)
    # kappa vs direct formula
    po = (y_true == y_pred).mean()
    pe = sum(((y_true == k).mean() * (y_pred == k).mean()) for k in range(4))
    kappa_direct = (po - pe) / (1 - pe)
    assert float(cohen_kappa_score(cm)) == pytest.approx(kappa_direct, abs=1e-4)


def test_pixel_metric_summary_and_table(tmp_path):
    pm = PixelMetric(3, logdir=str(tmp_path), class_names=['a', 'b', 'c'])
    y_true = np.array([0, 0, 1, 1, 2, 2])
    pm.forward(y_true, y_true)  # perfect prediction
    tb = pm.summary_all()
    assert tb.iou(0) == pytest.approx(1.0, abs=1e-4)
    assert tb.get('iou', [0, 1, 2]) == [pytest.approx(1.0, abs=1e-4)] * 3
    # CM npy dumped under logdir/cm
    import glob
    assert glob.glob(str(tmp_path / 'cm' / 'confusion_matrix-*.npy'))
    # CSV export
    tb.to_csv(str(tmp_path / 'acc.csv'))
    assert (tmp_path / 'acc.csv').exists()
    # mIoU helper agrees
    assert float(mean_iou(pm.dense_cm)) == pytest.approx(1.0, abs=1e-4)


def test_score_tracker():
    from ever_tpu.metric import ScoreTracker
    st = ScoreTracker()
    st.append(dict(miou=0.5), step=1)
    st.append(dict(miou=0.7), step=2)
    st.append(dict(miou=0.6), step=3)
    assert st.highest_score('miou') == {'step': 2, 'miou': 0.7}
    assert st.lowest_score('miou') == {'step': 1, 'miou': 0.5}
    assert len(st) == 3


def test_confusion_matrix_counts_past_2_24():
    """f32-weighted bincount saturates at 2^24 per cell; counts must be
    integer-exact for whole-scene evals (one 12k x 12k scene overflows)."""
    n = 2 ** 24 + 10
    y = np.zeros(n, np.int32)
    cm = np.asarray(confusion_matrix(y, y, 2))
    assert int(cm[0, 0]) == n
    assert int(cm.sum()) == n


def test_gathered_cm_exact_past_2_24():
    """The cross-process CM gather must survive the f64->f32 downcast
    process_allgather applies when x64 is off (hi/lo split)."""
    from ever_tpu.metric.pixel import PixelMetric
    pm = PixelMetric(2)
    big = float(2 ** 26 + 3)   # not representable in f32
    pm._total[0, 0] = big
    pm._total[1, 1] = 7.0
    dense = pm._gathered_cm()
    assert dense[0, 0] == big and dense[1, 1] == 7.0


def test_score_tracker_ragged_keys():
    """Evals reporting different score keys must keep columns rectangular
    (a ragged column misattributed best scores and crashed to_csv)."""
    import tempfile, os
    from ever_tpu.metric.utils import ScoreTracker
    st = ScoreTracker()
    st.append({'miou': 0.5}, step=0)
    st.append({'miou': 0.6, 'oa': 0.9}, step=1)
    st.append({'oa': 0.8}, step=2)
    best_oa = st.highest_score('oa')
    assert best_oa['step'] == 1 and best_oa['oa'] == 0.9
    assert st.highest_score('miou')['step'] == 1
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, 's.csv')
        st.to_csv(p)   # must not raise
        assert os.path.exists(p)
