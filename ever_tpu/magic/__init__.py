from ever_tpu.magic import transform
from ever_tpu.magic.sliding_window import sliding_window
from ever_tpu.magic.tiled import pad_crop_apply, tiled_inference
from ever_tpu.magic.transform import (
    HorizontalFlip,
    Identity,
    Rotate90k,
    Scale,
    TestTimeAugmentation,
    Transpose,
    VerticalFlip,
    d4_tta,
    tta,
)
