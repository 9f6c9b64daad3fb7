"""Path-parity shim: ``ever.module._hrnet`` (reference ``ever/module/_hrnet.py:260-659``).

``HighResolutionNet`` is the reference's vendored trunk class name; ours is
:class:`ever_tpu.module.hrnet.HRNet` parameterized by ``hrnet_type``.
"""

from ever_tpu.module.hrnet import HRNET_WIDTHS, HighResolutionModule, HRNet
from ever_tpu.module._resnets import BasicBlock, Bottleneck, conv3x3
from ever_tpu.module.context_block import constant_init, kaiming_init

HighResolutionNet = HRNet

__all__ = ['HighResolutionModule', 'HighResolutionNet', 'HRNet',
           'hrnetv2_w18', 'hrnetv2_w32', 'hrnetv2_w40', 'hrnetv2_w48',
           'BasicBlock', 'Bottleneck', 'conv3x3', 'constant_init', 'kaiming_init']


def _factory(name):
    def make(pretrained=False, **kwargs):
        del pretrained  # weights load via util.weight_io converters
        return HRNet(hrnet_type=name, **kwargs)
    make.__name__ = name
    make.__doc__ = f'``{name}`` trunk (reference ``ever/module/_hrnet.py:610-659``).'
    return make


for _name in HRNET_WIDTHS:
    globals()[_name] = _factory(_name)
