from ever_tpu.core import builder, config, dist, registry
from ever_tpu.core.config import AttrDict, FrozenConfig, from_dict, import_config

__all__ = ['builder', 'config', 'dist', 'registry', 'AttrDict', 'FrozenConfig',
           'from_dict', 'import_config']
