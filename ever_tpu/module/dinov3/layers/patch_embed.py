"""Path-parity shim: ``ever.module.dinov3.layers.patch_embed`` (reference
``dinov3/layers/patch_embed.py:14-87``)."""

from ever_tpu.module.vit import PatchEmbed, make_2tuple

__all__ = ['make_2tuple', 'PatchEmbed']
