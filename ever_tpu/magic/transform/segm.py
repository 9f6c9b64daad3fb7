"""Path-parity shim: ``ever.magic.transform.segm`` (reference ``ever/magic/transform/segm.py:8-88``)."""

from ever_tpu.magic._transform_impl import (HorizontalFlip, Identity,
                                            Rotate90k, Scale, Transpose,
                                            VerticalFlip)

__all__ = ['Identity', 'Rotate90k', 'HorizontalFlip', 'VerticalFlip',
           'Transpose', 'Scale']
