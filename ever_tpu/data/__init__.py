from ever_tpu.data import benchmarks, cross_validation, distributed, geotile, loveda
from ever_tpu.data.cross_validation import CrossValSamplerGenerator, make_CVSamplers
from ever_tpu.data.distributed import (
    DistributedInfiniteSampler,
    DistributedNonOverlapSeqSampler,
    DistributedNonOverlapSubsetSeqSampler,
    RandomSampler,
    SequentialSampler,
    StepDistributedRandomSubsetSampler,
    StepDistributedSampler,
    as_ddp_inference_loader,
)
from ever_tpu.data.loader import DataLoader, default_collate
from ever_tpu.data.geotile import GeoTileDataset, read_raster
from ever_tpu.data.loveda import LoveDA
from ever_tpu.data.benchmarks import ISAID, LEVIRCD, XView2
