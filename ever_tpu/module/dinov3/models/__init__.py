"""Path-parity package: ``ever.module.dinov3.models`` (reference
``ever/module/dinov3/models/__init__.py``)."""

from ever_tpu.module.dinov3.models.convnext import ConvNeXt, get_convnext_arch
from ever_tpu.module.dinov3.models.vision_transformer import (
    DinoVisionTransformer, vit_7b, vit_base, vit_giant2, vit_huge2, vit_large,
    vit_small, vit_so400m, vit7b16_sat493m, vitl16_sat493m)
