"""Path-parity shim: ``ever.module.dinov3.models.convnext`` (reference
``dinov3/models/convnext.py:17-340``).

``LayerNorm`` in the reference is a channels-first/last-switchable LN; NHWC
is the only layout here so flax's ``nn.LayerNorm`` IS that layer.  ``Block``
is the reference's spelling for the ConvNeXt block.
"""

import flax.linen as nn

from ever_tpu.module.convnext import (CONVNEXT_SPECS, ConvNeXt,
                                      ConvNeXtBlock as Block)
from ever_tpu.module.dinov3 import get_convnext_arch
from ever_tpu.module.vit import drop_path

LayerNorm = nn.LayerNorm


class DropPath(nn.Module):
    """Module spelling of stochastic depth (parity:
    ``models/convnext.py:30-47``; functional form:
    :func:`ever_tpu.module.vit.drop_path`)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        return drop_path(x, self.rate, deterministic,
                         self.make_rng('dropout'))


__all__ = ['drop_path', 'DropPath', 'Block', 'LayerNorm', 'ConvNeXt',
           'get_convnext_arch', 'CONVNEXT_SPECS']
