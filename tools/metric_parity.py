"""Metric-pipeline parity vs the PyTorch reference (VERDICT r4 #5).

Feeds IDENTICAL (y_true, y_pred) streams through the reference
``PixelMetric`` (``/root/reference/ever/metric/pixel.py:127-206``, torch/
numpy/scipy path) and ``ever_tpu.metric.pixel.PixelMetric`` (on-device
bincount CM), then asserts the full ``summary_all`` table — per-class
IoU/F1/precision/recall, their means, OA, kappa — the dense confusion
matrix, the ``AccTable`` getter surface, and the CSV export agree to
<= 1e-6.  Edge cases covered: ignore-255 pixels in every batch, one batch
that is ENTIRELY ignored, a class absent from both truth and prediction,
and a class present only in predictions.

It also scores one synthetic-LoveDA-style stream through BOTH frameworks'
*eval closures* (reference ``evaluate_pixel_prediction_task``,
``ever/metric/evaluate_fn.py:22-60``, driven with an identity torch module;
ours from ``ever_tpu.metric.evaluate_fn`` driven with a stub launcher) so
the last untested link of the "mIoU within 0.2 pts" claim — the closure
plumbing around the metric — is pinned, not just the metric math.

    python tools/metric_parity.py    # asserts + writes docs/parity/METRIC_PARITY.md

The same comparisons run in the test suite via
``tests/test_metric_reference_parity.py``.
"""

from __future__ import annotations

import csv
import io
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
REFERENCE = '/root/reference'
NUM_CLASSES = 7
TOL = 1e-6


def import_reference():
    """Import the reference ``ever`` package with functional stubs for deps
    the image lacks (wandb, tqdm, albumentations, prettytable).  The
    prettytable stub is REAL enough for the reference's AccTable/PrettyTable
    use (field_names, add_row, _rows, get_string) so ``summary_all`` builds
    genuine tables rather than failing into a no-op."""
    if not os.path.isdir(REFERENCE):
        raise RuntimeError('reference repo not available')

    class _PrettyTable:
        def __init__(self, field_names=None, **kw):
            self.field_names = list(field_names) if field_names else []
            self._rows = []

        def add_row(self, row):
            self._rows.append(list(row))

        def get_string(self):
            rows = [self.field_names] + self._rows
            return '\n'.join(' | '.join(str(c) for c in r) for r in rows)

        def __str__(self):
            return self.get_string()

    class _T:
        def __init__(self, *a, **k):
            pass

    def stub(name, **attrs):
        try:
            __import__(name)
            return
        except ImportError:
            pass
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod

    stub('wandb', run=None, init=lambda **k: None, log=lambda *a, **k: None)
    stub('prettytable', PrettyTable=_PrettyTable)
    stub('tqdm', tqdm=lambda x, **k: x)
    stub('albumentations', DualTransform=_T, ImageOnlyTransform=_T,
         RandomScale=_T, BasicTransform=_T, Compose=_T)
    stub('albumentations.pytorch', ToTensorV2=_T)
    # an earlier non-functional prettytable stub (tests/test_reference_parity
    # pre-r5) may already be installed — upgrade it in place
    pt = sys.modules.get('prettytable')
    if pt is not None and not hasattr(pt.PrettyTable, 'add_row'):
        pt.PrettyTable = _PrettyTable
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import ever
    return ever


def make_streams(num_classes=NUM_CLASSES, batches=6, seed=0):
    """Synthetic (y_true, y_pred) batches with the edge cases that bite.

    - every batch carries scattered 255 (ignore) pixels;
    - batch 2 is ENTIRELY 255 (contributes nothing);
    - class ``num_classes - 1`` appears in NEITHER truth nor prediction
      (absent class: IoU/F1/precision/recall must come out 0, and the mean
      must still divide by num_classes — reference semantics);
    - class ``num_classes - 2`` appears ONLY in predictions.
    """
    rng = np.random.default_rng(seed)
    streams = []
    hi_true = num_classes - 2      # truth labels in [0, hi_true)
    hi_pred = num_classes - 1      # predictions in [0, hi_pred)
    for b in range(batches):
        y_true = rng.integers(0, hi_true, size=(2, 64, 64)).astype(np.int64)
        y_pred = np.where(rng.random((2, 64, 64)) < 0.7, y_true,
                          rng.integers(0, hi_pred, size=(2, 64, 64))
                          ).astype(np.int64)
        mask = rng.random((2, 64, 64)) < 0.1
        y_true = np.where(mask, 255, y_true)
        if b == 2:
            y_true = np.full_like(y_true, 255)
        streams.append((y_true, y_pred))
    return streams


def _table_cells(tb):
    """[(row_idx, col_idx, value)] numeric cells + string cells of a table."""
    cells = []
    for i, row in enumerate(getattr(tb, '_rows', None) or tb.rows):
        for j, c in enumerate(row):
            cells.append((i, j, c))
    return cells


def compare_tables(ref_tb, our_tb):
    """Max |delta| over numeric cells; asserts shape + non-numeric equality."""
    ref_cells, our_cells = _table_cells(ref_tb), _table_cells(our_tb)
    assert len(ref_cells) == len(our_cells), \
        f'table shapes differ: {len(ref_cells)} vs {len(our_cells)}'
    max_delta = 0.0
    for (i, j, a), (i2, j2, b) in zip(ref_cells, our_cells):
        assert (i, j) == (i2, j2)
        try:
            fa, fb = float(a), float(b)
            max_delta = max(max_delta, abs(fa - fb))
        except (TypeError, ValueError):
            assert str(a) == str(b), f'cell ({i},{j}): {a!r} vs {b!r}'
    return max_delta


def _csv_numeric_cells(text):
    vals = []
    for row in csv.reader(io.StringIO(text)):
        for c in row:
            try:
                vals.append(float(c))
            except ValueError:
                vals.append(c)
    return vals


def run_pixelmetric_parity():
    """Stream-level parity through both PixelMetrics.  Returns a report dict."""
    ever = import_reference()
    import torch
    from ever.metric.pixel import PixelMetric as RefPixelMetric

    import jax
    jax.config.update('jax_platforms', 'cpu')
    from ever_tpu.metric.pixel import PixelMetric

    streams = make_streams()
    ref_pm = RefPixelMetric(NUM_CLASSES)
    our_pm = PixelMetric(NUM_CLASSES)
    for y_true, y_pred in streams:
        # reference convention (LoveDA closures): the caller masks ignore
        # pixels before forward; ours masks ignore_index=255 internally
        valid = y_true != 255
        ref_pm.forward(torch.from_numpy(y_true[valid]),
                       torch.from_numpy(y_pred[valid]))
        our_pm.forward(y_true, y_pred)

    cm_ref = ref_pm._total.toarray().astype(np.float64)
    cm_ours = our_pm.dense_cm
    np.testing.assert_array_equal(cm_ref, cm_ours)

    ref_tb = ref_pm.summary_all()
    our_tb = our_pm.summary_all()
    table_delta = compare_tables(ref_tb, our_tb)
    assert table_delta <= TOL, f'summary_all table delta {table_delta}'

    # unrounded metric functions on the SAME counts (pins the math itself,
    # independent of summary rounding; kappa: reference f32 vs our f64 cast)
    fn_delta = 0.0
    for name in ('compute_iou_per_class', 'compute_F_measure_per_class',
                 'compute_precision_per_class', 'compute_recall_per_class'):
        a = getattr(RefPixelMetric, name)(cm_ref)
        b = getattr(PixelMetric, name)(cm_ours)
        fn_delta = max(fn_delta, float(np.max(np.abs(a - b))))
    for name in ('compute_overall_accuracy', 'cohen_kappa_score'):
        a = float(getattr(RefPixelMetric, name)(cm_ref))
        b = float(getattr(PixelMetric, name)(cm_ours))
        fn_delta = max(fn_delta, abs(a - b))
    assert fn_delta <= TOL, f'metric function delta {fn_delta}'

    # AccTable getter surface
    getter_delta = 0.0
    for g in ('iou', 'f1', 'precision', 'recall'):
        a = np.asarray(getattr(ref_tb, g)(list(range(NUM_CLASSES))), np.float64)
        b = np.asarray(getattr(our_tb, g)(list(range(NUM_CLASSES))), np.float64)
        getter_delta = max(getter_delta, float(np.max(np.abs(a - b))))
    assert getter_delta <= TOL, f'AccTable getter delta {getter_delta}'

    # CSV export: same layout (pandas index col + field_names), same numbers
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        ref_csv, our_csv = os.path.join(td, 'ref.csv'), os.path.join(td, 'ours.csv')
        ref_tb.to_csv(ref_csv)
        our_tb.to_csv(our_csv)
        a = _csv_numeric_cells(open(ref_csv).read())
        b = _csv_numeric_cells(open(our_csv).read())
    assert len(a) == len(b), 'CSV shapes differ'
    csv_delta = 0.0
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            csv_delta = max(csv_delta, abs(x - y))
        else:
            assert str(x) == str(y), f'CSV cell {x!r} vs {y!r}'
    assert csv_delta <= TOL, f'CSV delta {csv_delta}'

    return dict(cm_equal=True, table_delta=table_delta, fn_delta=fn_delta,
                getter_delta=getter_delta, csv_delta=csv_delta,
                ref_table=ref_tb, our_table=our_tb, cm=cm_ours)


def run_closure_parity():
    """Synthetic-LoveDA scoring through BOTH frameworks' eval closures.

    The "model" is identity: each batch's x IS the logits tensor, so both
    closures score the same prediction stream end to end (loader → forward
    → prediction_fn → PixelMetric → summary table)."""
    ever = import_reference()
    import torch
    import torch.nn as nn
    from ever.metric.evaluate_fn import evaluate_pixel_prediction_task as ref_task

    import jax
    jax.config.update('jax_platforms', 'cpu')
    from ever_tpu.metric.evaluate_fn import (
        evaluate_pixel_prediction_task as our_task)

    rng = np.random.default_rng(7)
    batches = []
    for _ in range(4):
        logits = rng.normal(size=(2, 32, 32, NUM_CLASSES)).astype(np.float32)
        y = rng.integers(0, NUM_CLASSES - 1, size=(2, 32, 32)).astype(np.int64)
        y[:, 0, :4] = 255
        batches.append((logits, y))

    # --- reference closure: identity torch module, NCHW logits ------------
    class Identity(nn.Module):
        def forward(self, x):
            return x

    def ref_prediction_fn(y_true, y_pred, info, model_dir, checkpoint):
        y_pred = y_pred.argmax(dim=1)
        valid = y_true != 255
        return y_true[valid], y_pred[valid]

    ref_loader = [(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                   torch.from_numpy(y)) for x, y in batches]
    ref_self = types.SimpleNamespace(model=Identity(), model_dir=None,
                                     logger=None, checkpoint=None)
    ref_fn = ref_task(NUM_CLASSES, prediction_fn=ref_prediction_fn,
                      cuda_empty_cache=False)
    ref_tb = ref_fn(ref_self, ref_loader)

    # --- our closure: stub launcher whose eval step is identity -----------
    our_self = types.SimpleNamespace(
        model_dir=None, logger=None, checkpoint=None, mesh=None,
        state=None, get_eval_step=lambda local=False: (
            lambda state, batch: batch[0]))
    our_fn = our_task(NUM_CLASSES)
    our_tb = our_fn(our_self, batches)

    delta = compare_tables(ref_tb, our_tb)
    assert delta <= TOL, f'closure table delta {delta}'
    return dict(closure_delta=delta, ref_table=ref_tb, our_table=our_tb)


def main():
    rep = run_pixelmetric_parity()
    crep = run_closure_parity()
    out = os.path.join(REPO, 'docs', 'parity', 'METRIC_PARITY.md')
    with open(out, 'w') as f:
        f.write(f"""# Metric-pipeline parity vs reference (VERDICT r4 #5)

Generated by `python tools/metric_parity.py`.  Identical (y_true, y_pred)
streams (6 batches, 2x64x64, scattered ignore-255, one all-ignored batch,
one absent class, one prediction-only class) scored by the reference
`PixelMetric` (`/root/reference/ever/metric/pixel.py:127-206`) and
`ever_tpu.metric.pixel.PixelMetric`.

| comparison | max delta | gate |
|---|---|---|
| dense confusion matrix | 0 (bit-equal) | exact |
| `summary_all` table (per-class iou/f1/precision/recall, means, OA, kappa) | {rep['table_delta']:.3g} | <= 1e-6 |
| unrounded metric functions (incl. kappa f32-vs-f64 seam) | {rep['fn_delta']:.3g} | <= 1e-6 |
| AccTable getter surface (`iou/f1/precision/recall`) | {rep['getter_delta']:.3g} | <= 1e-6 |
| CSV export (layout + values) | {rep['csv_delta']:.3g} | <= 1e-6 |
| eval-closure end-to-end (reference `evaluate_pixel_prediction_task` with an identity torch module vs our closure with a stub launcher, same logits stream) | {crep['closure_delta']:.3g} | <= 1e-6 |

## summary_all (ours — reference table is cell-identical to the deltas above)

```
{rep['our_table'].get_string()}
```

## closure-scored table (ours)

```
{crep['our_table'].get_string()}
```

Re-runnable in CI: `tests/test_metric_reference_parity.py` executes the same
two comparisons.
""")
    print(f'wrote {out}')
    print({k: v for k, v in rep.items()
           if k not in ('ref_table', 'our_table', 'cm')})
    print({k: v for k, v in crep.items()
           if k not in ('ref_table', 'our_table')})


if __name__ == '__main__':
    main()
