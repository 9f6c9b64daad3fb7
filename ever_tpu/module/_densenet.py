"""Path-parity shim: ``ever.module._densenet`` (reference ``ever/module/_densenet.py:30-244``).

``CollectibleSequential`` (the reference's feature-tapping Sequential,
``_densenet.py:30``) has no stateful analog in flax — the trunk returns its
multi-scale taps directly — but the name is kept as a tiny functional
collector for ported code.
"""

from ever_tpu.module.densenet import DENSENET_SPECS, DenseNet

__all__ = ['DenseNet', 'CollectibleSequential',
           'densenet121', 'densenet161', 'densenet169', 'densenet201']


class CollectibleSequential:
    """Apply callables in order, collecting each intermediate output.

    Functional stand-in for ``_densenet.py:30`` (torch Sequential whose
    forward returns the per-layer feature list).
    """

    def __init__(self, *layers):
        self.layers = list(layers)

    def __call__(self, x):
        feats = []
        for layer in self.layers:
            x = layer(x)
            feats.append(x)
        return feats


def _factory(name):
    def make(pretrained=False, **kwargs):
        del pretrained  # weights load via util.weight_io converters
        return DenseNet(densenet_type=name, **kwargs)
    make.__name__ = name
    make.__doc__ = f'``{name}`` trunk (reference ``ever/module/_densenet.py:170-244``).'
    return make


for _name in DENSENET_SPECS:
    globals()[_name] = _factory(_name)
