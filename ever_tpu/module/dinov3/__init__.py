"""DINOv3 compatibility namespace (reference spellings).

The reference vendors Meta's DINOv3 as a ~2,100-LoC subpackage and re-exports
it as ``ever.module.dinov3`` (``ever/module/__init__.py:20``;
``ever/module/dinov3/__init__.py:5-6``).  Our TPU-native rewrite condenses the
trunk into ``ever_tpu/module/vit.py`` (flax, NHWC, RoPE, storage tokens,
flash-attention dispatch) and ``ever_tpu/module/convnext.py``; this module
restores the reference import surface so downstream code written against

    from ever.module.dinov3.models.vision_transformer import vit_large
    from ever.module.dinov3 import get_convnext_arch

ports with an ``ever → ever_tpu`` rename only.  Factory names mirror
``models/vision_transformer.py:343-476`` (__all__ at ``:18-30``).
"""

from __future__ import annotations

from functools import partial

from ever_tpu.module.convnext import CONVNEXT_SPECS, ConvNeXt
from ever_tpu.module.vit import (
    CausalSelfAttention,
    CausalSelfAttentionBlock,
    DINOHead,
    LinearKMaskedBias,
    ListForwardMixin,
    init_weights_vit,
    make_2tuple,
    DinoVisionTransformer,
    LayerScale,
    Mlp,
    PatchEmbed,
    RMSNorm,
    RopePositionEmbedding,
    SAT_CONFIGS,
    SelfAttention,
    SelfAttentionBlock,
    SwiGLUFFN,
    VIT_SPECS,
    cat_keep_shapes,
    uncat_with_shapes,
)

__all__ = [
    'DinoVisionTransformer', 'DINOHead', 'RopePositionEmbedding', 'RMSNorm',
    'LayerScale', 'Mlp', 'SwiGLUFFN', 'SelfAttention', 'SelfAttentionBlock',
    'CausalSelfAttention', 'CausalSelfAttentionBlock', 'LinearKMaskedBias',
    'ListForwardMixin', 'init_weights_vit', 'make_2tuple',
    'PatchEmbed', 'cat_keep_shapes', 'uncat_with_shapes', 'get_convnext_arch',
    'vit_small', 'vit_base', 'vit_large', 'vit_so400m', 'vit_huge2',
    'vit_giant2', 'vit_7b', 'vitl16_sat493m', 'vit7b16_sat493m',
]


def _vit_factory(name):
    def factory(patch_size=16, **kwargs):
        return DinoVisionTransformer(vit_type=name, patch_size=patch_size,
                                     **kwargs)
    factory.__name__ = name
    factory.__doc__ = (f'``{name}`` trunk (parity: '
                       f'``models/vision_transformer.py:343-427``).')
    return factory


vit_small = _vit_factory('vit_small')
vit_base = _vit_factory('vit_base')
vit_large = _vit_factory('vit_large')
vit_so400m = _vit_factory('vit_so400m')
vit_huge2 = _vit_factory('vit_huge2')
vit_giant2 = _vit_factory('vit_giant2')
vit_7b = _vit_factory('vit_7b')


def _sat_factory(name):
    def factory(pretrained=None, **kwargs):
        """Satellite-pretrained trunk config (parity:
        ``models/vision_transformer.py:430-476``).  ``pretrained`` is accepted
        for surface parity; weight loading goes through
        ``ever_tpu.util.weight_io.convert_torch_dinov3``."""
        model = DinoVisionTransformer(**{**SAT_CONFIGS[name], **kwargs})
        if pretrained:
            raise ValueError(
                'load pretrained torch weights via '
                'ever_tpu.util.weight_io.convert_torch_dinov3, then pass the '
                'param pytree to model.apply')
        return model
    factory.__name__ = name
    return factory


vitl16_sat493m = _sat_factory('vitl16_sat493m')
vit7b16_sat493m = _sat_factory('vit7b16_sat493m')


def get_convnext_arch(arch_name: str):
    """``'convnext_<size>' → partial(ConvNeXt, ...)`` (parity:
    ``models/convnext.py:329-340``)."""
    query = 'convnext_' + arch_name.split('_')[1]
    if query not in CONVNEXT_SPECS:
        raise NotImplementedError("didn't recognize vit size string")
    return partial(ConvNeXt, model_name=query)
