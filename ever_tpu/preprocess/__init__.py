from ever_tpu.preprocess import albu, device, function, segm, thcomm, thsegm
from ever_tpu.preprocess.albu import ConstantPad, ToTensor
from ever_tpu.preprocess.function import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    divisible_pad,
    mean_std_normalize,
    pad_to_size,
)
from ever_tpu.preprocess.segm import (
    ChannelFirstToLast,
    Compose,
    CustomOp,
    DivisiblePad,
    FixedPad,
    MeanStdNormalize,
    RandomCrop,
    RandomDiscreteScale,
    RandomHorizontalFlip,
    RandomRotate90K,
    RandomScale,
    RandomTranspose,
    RandomVerticalFlip,
    SpaceToDepth,
    ToArray,
    transpose,
)
