"""Path-parity shim: ``ever.module._resnets`` (reference ``ever/module/_resnets.py:241-344``).

The reference vendors torchvision's ResNet; ours is one flax trunk
(:class:`ever_tpu.module.resnet.ResNet`) parameterized by ``resnet_type``.
The factory spellings below return a configured trunk (`pretrained` weights
are applied by the trainer via :mod:`ever_tpu.util.weight_io`, so the flag is
accepted for signature parity and ignored here).
"""

from functools import partial

from ever_tpu.module.resnet import (RESNET_SPECS, BasicBlock, Bottleneck,
                                    ResNet)

__all__ = ['BasicBlock', 'Bottleneck', 'ResNet',
           'resnet18', 'resnet34', 'resnet50', 'resnet101', 'resnet152',
           'resnext50_32x4d', 'resnext101_32x4d', 'resnext101_32x8d',
           'resnet50_v1c', 'resnet101_v1c', 'conv3x3', 'conv1x1']


def _factory(name):
    def make(pretrained=False, **kwargs):
        del pretrained  # weights load via util.weight_io converters
        return ResNet(resnet_type=name, **kwargs)
    make.__name__ = name
    make.__doc__ = f'``{name}`` trunk (reference ``ever/module/_resnets.py:241-344``).'
    return make


for _name in RESNET_SPECS:
    globals()[_name] = _factory(_name)


def conv3x3(features, stride=1, dilation=1, **kw):
    """3x3 conv, SAME padding, no bias (parity: ``_resnets.py:20-28``)."""
    import flax.linen as nn
    return nn.Conv(features, (3, 3), strides=(stride, stride),
                   kernel_dilation=(dilation, dilation), padding='SAME',
                   use_bias=False, **kw)


def conv1x1(features, stride=1, **kw):
    """1x1 conv, no bias (parity: ``_resnets.py:31-33``)."""
    import flax.linen as nn
    return nn.Conv(features, (1, 1), strides=(stride, stride),
                   use_bias=False, **kw)
