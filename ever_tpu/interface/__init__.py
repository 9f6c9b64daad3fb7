from ever_tpu.interface.callback import Callback, EvaluationCallback, SaveCheckpointCallback
from ever_tpu.interface.configurable import ConfigurableMixin
from ever_tpu.interface.dataloader import ERDataLoader, ERDataset
from ever_tpu.interface.learning_rate import LearningRateBase
from ever_tpu.interface.module import ERModule, split_metrics, sum_losses
from ever_tpu.interface.transform_base import MultiTransform, Transform

__all__ = [
    'Callback', 'EvaluationCallback', 'SaveCheckpointCallback',
    'ConfigurableMixin', 'ERDataLoader', 'ERDataset', 'LearningRateBase',
    'ERModule', 'sum_losses', 'split_metrics', 'MultiTransform', 'Transform',
]
