"""Path-parity package: ``ever.module.dinov3.layers`` (reference
``ever/module/dinov3/layers/__init__.py``)."""

from ever_tpu.module.dinov3.layers.attention import (CausalSelfAttention,
                                                     LinearKMaskedBias,
                                                     SelfAttention,
                                                     rope_apply,
                                                     rope_rotate_half)
from ever_tpu.module.dinov3.layers.block import (CausalSelfAttentionBlock,
                                                 SelfAttentionBlock)
from ever_tpu.module.dinov3.layers.dino_head import DINOHead
from ever_tpu.module.dinov3.layers.ffn_layers import (ListForwardMixin, Mlp,
                                                      SwiGLUFFN)
from ever_tpu.module.dinov3.layers.fp8_linear import (Fp8Linear,
                                                      convert_linears_to_fp8)
from ever_tpu.module.dinov3.layers.layer_scale import LayerScale
from ever_tpu.module.dinov3.layers.patch_embed import PatchEmbed, make_2tuple
from ever_tpu.module.dinov3.layers.rms_norm import RMSNorm
from ever_tpu.module.dinov3.layers.rope_position_encoding import \
    RopePositionEmbedding
from ever_tpu.module.dinov3.layers.sparse_linear import LinearW24
