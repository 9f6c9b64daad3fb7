"""EVer-TPU: a TPU-native Earth-Vision framework (JAX/XLA/Pallas).

Public surface parity with the reference ``ever/__init__.py:23-30``:
``registry, builder, config, data, ERDataLoader, LearningRateBase, ERModule,
Transform, MultiTransform, Callback`` plus the metric / preprocess / inference
namespaces as they land.
"""

__version__ = '0.1.0'

from ever_tpu.core import builder, config, dist, registry
from ever_tpu.core.config import AttrDict, FrozenConfig, from_dict, import_config

# Registration side effects: importing the package registers all built-in
# schedules/optimizers (and, as they land, models/losses) — parity with the
# reference where `import ever` populates the global registries.
from ever_tpu import opt  # noqa: F401
from ever_tpu import data  # noqa: F401

from ever_tpu.interface import (
    Callback,
    ConfigurableMixin,
    ERDataLoader,
    ERDataset,
    ERModule,
    LearningRateBase,
    MultiTransform,
    Transform,
)

__all__ = [
    'builder', 'config', 'dist', 'registry', 'opt', 'data',
    'AttrDict', 'FrozenConfig', 'from_dict', 'import_config',
    'Callback', 'ConfigurableMixin', 'ERDataLoader', 'ERDataset', 'ERModule',
    'LearningRateBase', 'MultiTransform', 'Transform',
]
