import numpy as np
import pytest

import ever_tpu.opt  # noqa: F401 — registration side effects
from ever_tpu.core import registry
from ever_tpu.opt.learning_rate import (
    ConstantLearningRate,
    CosineAnnealingLearningRate,
    MultiStepLearningRate,
    PolyLearningRate,
    SearchLearningRate,
)


def test_registered():
    for name in ('multistep', 'poly', 'cosine', 'constant', 'search'):
        assert name in registry.LR
    for name in ('sgd', 'adam', 'adamw'):
        assert name in registry.OPT


def test_multistep():
    lr = MultiStepLearningRate(steps=[10, 20], base_lr=1.0, gamma=0.1)
    assert float(lr(5)) == pytest.approx(1.0)
    assert float(lr(15)) == pytest.approx(0.1)
    assert float(lr(25)) == pytest.approx(0.01, rel=1e-5)


def test_multistep_warmup_linear():
    lr = MultiStepLearningRate(steps=[100], base_lr=1.0, gamma=0.1,
                               warmup=dict(type='linear', step=10, ratio=0.1))
    # at step 0: base*(1-(1-0)*(1-0.1)) = 0.1
    assert float(lr(0)) == pytest.approx(0.1)
    # at warmup end: base
    assert float(lr(10)) == pytest.approx(1.0)
    assert float(lr(50)) == pytest.approx(1.0)


def test_poly_matches_reference_formula():
    base, power, max_iters = 0.01, 0.9, 100
    lr = PolyLearningRate(base_lr=base, power=power, max_iters=max_iters)
    for s in (0, 10, 50, 99):
        expected = base * (1 - s / max_iters) ** power
        assert float(lr(s)) == pytest.approx(expected, rel=1e-5)


def test_cosine():
    lr = CosineAnnealingLearningRate(base_lr=1.0, max_iters=100, eta_min=0.1)
    assert float(lr(0)) == pytest.approx(1.0)
    assert float(lr(100)) == pytest.approx(0.1)
    assert float(lr(50)) == pytest.approx(0.55)


def test_cosine_warmup():
    # warmup extension (the reference cosine has none): linear ramp to
    # base_lr over `step`, then cosine over the remaining horizon
    lr = CosineAnnealingLearningRate(
        base_lr=1.0, max_iters=110, eta_min=0.1,
        warmup=dict(type='linear', step=10, ratio=0.01))
    assert float(lr(0)) == pytest.approx(0.01)
    assert float(lr(10)) == pytest.approx(1.0)
    assert float(lr(60)) == pytest.approx(0.55)   # midpoint of 10..110
    assert float(lr(110)) == pytest.approx(0.1)
    assert float(lr(200)) == pytest.approx(0.1)   # clipped past horizon


def test_constant_and_search():
    assert float(ConstantLearningRate(base_lr=0.3)(123)) == pytest.approx(0.3)
    lr = SearchLearningRate(init_lr=1e-5, final_lr=1.0, max_iters=100)
    assert float(lr(0)) == pytest.approx(1e-5)
    assert float(lr(100)) == pytest.approx(1.0, rel=1e-3)


def test_schedule_is_jittable():
    import jax

    lr = PolyLearningRate(base_lr=0.01, power=0.9, max_iters=100,
                          warmup=dict(type='linear', step=5, ratio=0.1))
    vals = jax.jit(jax.vmap(lr.value_at))(np.arange(20))
    assert vals.shape == (20,)
    assert float(vals[0]) == pytest.approx(0.001)
