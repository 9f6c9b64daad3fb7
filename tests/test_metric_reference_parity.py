"""Metric-pipeline parity vs the reference PixelMetric (VERDICT r4 #5).

Runs the same comparisons as ``tools/metric_parity.py`` (which also writes
``docs/parity/METRIC_PARITY.md``): identical prediction streams through the
reference ``ever/metric/pixel.py:127-206`` and ours, full-table agreement to
<= 1e-6 including the ignore-255 / absent-class edge cases, plus an
end-to-end scoring through BOTH frameworks' eval closures.
"""

import importlib.util
import os

import pytest

pytest.importorskip('torch')

_TOOL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     'tools', 'metric_parity.py')


@pytest.fixture(scope='module')
def metric_parity():
    if not os.path.isdir('/root/reference'):
        pytest.skip('reference repo not available')
    spec = importlib.util.spec_from_file_location('metric_parity', _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parity
def test_pixelmetric_full_table_matches_reference(metric_parity):
    rep = metric_parity.run_pixelmetric_parity()
    assert rep['cm_equal']
    assert rep['table_delta'] <= 1e-6
    assert rep['fn_delta'] <= 1e-6
    assert rep['getter_delta'] <= 1e-6
    assert rep['csv_delta'] <= 1e-6


@pytest.mark.parity
def test_eval_closures_match_reference(metric_parity):
    rep = metric_parity.run_closure_parity()
    assert rep['closure_delta'] <= 1e-6
