from ever_tpu.opt import learning_rate, optimizer
from ever_tpu.opt.learning_rate import (
    ConstantLearningRate,
    CosineAnnealingLearningRate,
    MultiStepLearningRate,
    PolyLearningRate,
    SearchLearningRate,
)
from ever_tpu.opt.optimizer import DEFAULT_GRAD_CLIP, OptimizerFactory
