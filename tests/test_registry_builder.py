import flax.linen as nn
import pytest

from ever_tpu.core import builder, registry
from ever_tpu.core.config import AttrDict
from ever_tpu.core.registry import Registry
from ever_tpu.interface.module import ERModule


def test_registry_styles():
    R = Registry('t')

    @R.register()
    class A:
        pass

    @R.register('bee')
    class B:
        pass

    def c():
        pass

    R.register('sea', c)

    @R.register
    class D:
        pass

    assert R['A'] is A and R['bee'] is B and R['sea'] is c and R['D'] is D


def test_registry_overwrite_warns(caplog):
    R = Registry('t')
    R.register('x', lambda: 1)
    R.register('x', lambda: 2)
    assert R['x']() == 2


def test_register_file(tmp_path):
    f = tmp_path / 'mymod.py'
    f.write_text(
        'from ever_tpu.core import registry\n'
        "registry.MODEL.register('unit_test_dummy', object)\n")
    registry.register_file(str(f))
    assert 'unit_test_dummy' in registry.MODEL
    del registry.MODEL['unit_test_dummy']


class _Seg(ERModule):
    def set_default_config(self):
        self.config.update(dict(classes=7, width=8))

    @nn.compact
    def __call__(self, x, y=None, train=False):
        return nn.Dense(self.config.classes)(x)


def test_make_model_ermodule():
    registry.MODEL.register('unit_test_seg', _Seg)
    try:
        m = builder.make_model(AttrDict(dict(type='unit_test_seg',
                                             params=dict(classes=3))))
        assert isinstance(m, _Seg)
        assert m.config.classes == 3 and m.config.width == 8
    finally:
        del registry.MODEL['unit_test_seg']


def test_make_model_plain_callable():
    registry.MODEL.register('unit_test_plain', lambda classes: ('plain', classes))
    try:
        m = builder.make_model(AttrDict(dict(type='unit_test_plain',
                                             params=dict(classes=3))))
        assert m == ('plain', 3)
    finally:
        del registry.MODEL['unit_test_plain']


def test_make_model_requires_type():
    with pytest.raises(KeyError):
        builder.make_model(AttrDict(dict(params={})))


def test_make_learningrate_and_optimizer():
    import ever_tpu.opt  # noqa: F401 — trigger registration
    lr = builder.make_learningrate(AttrDict(dict(
        type='poly', params=dict(base_lr=0.01, power=0.9, max_iters=100))))
    assert float(lr(0)) == pytest.approx(0.01)

    tx_factory, opt_cfg = builder.make_optimizer(AttrDict(dict(
        type='sgd', params=dict(momentum=0.9), grad_clip=dict(max_norm=10.0))))
    tx = tx_factory.build(lr, grad_clip=opt_cfg.get('grad_clip'))
    assert hasattr(tx, 'init') and hasattr(tx, 'update')


def test_register_dir_same_basename_different_dirs(tmp_path):
    """module/x.py and callback/x.py must BOTH import (keying modules by
    basename silently skipped the second file's registrations)."""
    from ever_tpu.core import registry
    d1 = tmp_path / 'module'; d2 = tmp_path / 'callback'
    d1.mkdir(); d2.mkdir()
    (d1 / 'same.py').write_text(
        'from ever_tpu.core import registry\n'
        "registry.MODEL.register('_t_samebase_model')(object)\n")
    (d2 / 'same.py').write_text(
        'from ever_tpu.core import registry\n'
        "registry.CALLBACK.register('_t_samebase_cb')(object)\n")
    registry.register_dir(str(d1))
    registry.register_dir(str(d2))
    assert '_t_samebase_model' in registry.MODEL
    assert '_t_samebase_cb' in registry.CALLBACK


def test_register_file_dotted_dirnames_do_not_alias(tmp_path):
    """Dots in directory names must not alias two distinct files into one
    module key (a/b.c/x.py vs a/b/c/x.py)."""
    from ever_tpu.core import registry
    d1 = tmp_path / 'a' / 'b.c'; d1.mkdir(parents=True)
    d2 = tmp_path / 'a' / 'b' / 'c'; d2.mkdir(parents=True)
    (d1 / 'x.py').write_text(
        'from ever_tpu.core import registry\n'
        "registry.MODEL.register('_t_dot1')(object)\n")
    (d2 / 'x.py').write_text(
        'from ever_tpu.core import registry\n'
        "registry.MODEL.register('_t_dot2')(object)\n")
    registry.register_file(str(d1 / 'x.py'))
    registry.register_file(str(d2 / 'x.py'))
    assert '_t_dot1' in registry.MODEL and '_t_dot2' in registry.MODEL


def test_grad_norm_recorded_through_multi_transform():
    """freeze_at wraps the clip in optax.multi_transform; the recorded
    pre-clip norm must still be findable through its dict-valued state."""
    import jax
    import jax.numpy as jnp
    from ever_tpu.core import builder
    from ever_tpu.opt.optimizer import find_recorded_grad_norm
    factory, opt_cfg = builder.make_optimizer(
        {'type': 'sgd', 'params': dict(momentum=0.9),
         'grad_clip': dict(max_norm=1.0)})
    schedule = builder.make_learningrate(
        {'type': 'constant', 'params': dict(base_lr=0.1)})
    tx = factory.build(schedule, grad_clip=opt_cfg.get('grad_clip'),
                       frozen_prefixes=('frozen',))
    params = {'frozen': jnp.ones(3), 'live': jnp.ones(3)}
    state = tx.init(params)
    grads = {'frozen': jnp.ones(3), 'live': jnp.full(3, 2.0)}
    _, new_state = tx.update(grads, state, params)
    gn = find_recorded_grad_norm(new_state)
    assert gn is not None and float(gn) > 0
