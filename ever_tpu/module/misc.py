"""Misc module wrappers (reference ``ever/module/misc.py``)."""

from __future__ import annotations

import flax.linen as nn

from ever_tpu.magic.tiled import pad_crop_apply

__all__ = ['PadCropWrapper']


class PadCropWrapper(nn.Module):
    """Pad NHWC input to a ``size_divisor`` multiple, run the submodule, crop
    back (parity: ``ever/module/misc.py:8-24``; functional form:
    :func:`ever_tpu.magic.tiled.pad_crop_apply`).

    Shares the inner module's scope, so a trained model's ``variables`` apply
    to the wrapped module unchanged (the reference's state dict is likewise
    prefix-free after its ``module.`` cleanup).
    """

    inner: nn.Module
    size_divisor: int = 32

    def setup(self):
        nn.share_scope(self, self.inner)

    def __call__(self, x, *args, **kwargs):
        return pad_crop_apply(lambda t: self.inner(t, *args, **kwargs),
                              x, self.size_divisor)
