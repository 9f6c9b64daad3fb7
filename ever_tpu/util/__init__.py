from ever_tpu.util import param_util, seedlib, weight_io
from ever_tpu.util.seedlib import seed_everything, seed_torch, worker_init_fn
