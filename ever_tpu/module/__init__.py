from ever_tpu.module import dinov3, loss, ops
from ever_tpu.module.change import ChangeMask, ChangeMixin, ChangeOS, ChangeStar
from ever_tpu.module.context_block import ContextBlock2d
from ever_tpu.module.densenet import DenseNet, DenseNetEncoder
from ever_tpu.module.factseg import FactSeg
from ever_tpu.module.heads import (
    ASPPHead,
    AtrousSpatialPyramidPool,
    Deeplabv3pDecoder,
    Deeplabv3pHead,
    HRNetHead,
    PPMHead,
    PyramidPoolModule,
    SimpleFusion,
)
from ever_tpu.module.hrnet import HRNet, HRNetEncoder
from ever_tpu.module.convnext import ConvNeXt, ConvNeXtEncoder
from ever_tpu.module.efficientnet import EfficientNet, EFNetEncoder
from ever_tpu.module.resnest import ResNeSt, ResNeStEncoder, SplAtConv2d
from ever_tpu.module.vit import DinoSeg, DinoVisionTransformer, RMSNorm, ViTEncoder
from ever_tpu.module.gan import DCGAN, DCGANDiscriminator, DCGANGenerator
from ever_tpu.module.freenet import FreeNet, SpectralAttention
from ever_tpu.module.fpn import (FPN, AssymetricDecoder, BiFPN, FastNormalizedFusionConv3x3, Fusion, LastLevelMaxPool, LastLevelP6P7, NormalizedFusionConv3x3, conv_with_kaiming_uniform)
from ever_tpu.module.fs_relation import FarSeg, FarSegHead, FSRelation, FSRelationV2
from ever_tpu.module.misc import PadCropWrapper
from ever_tpu.module.ops import (
    Bf16compatible,
    ChannelConcat,
    ChannelReduction,
    ConvBlock,
    ConvUpsampling,
    DepthwiseConv2d,
    LayerNorm2d,
    ListIndex,
    PoolBlock,
    ResidualBlock,
    SeparableConv2d,
    SeparableConvBlock,
    Squeeze,
    Sum,
)
from ever_tpu.module.resnet import ResNet, ResNetEncoder
from ever_tpu.module.se_block import SCSEModule, SEBlock
