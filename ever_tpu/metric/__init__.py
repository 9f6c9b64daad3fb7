from ever_tpu.metric import function
from ever_tpu.metric.confusion_matrix import ConfusionMatrix
from ever_tpu.metric.evaluate_fn import (
    distributed_evaluate_pixel_prediction_task,
    evaluate_change_detection_task,
    evaluate_damage_assessment_task,
    evaluate_pixel_prediction_task,
)
from ever_tpu.metric.function import (
    average_accuracy_score,
    cohen_kappa_score,
    confusion_matrix,
    iou_per_class,
    mean_iou,
    overall_accuracy_score,
)
from ever_tpu.metric.pixel import AccTable, PixelMetric
from ever_tpu.metric.utils import ScoreTracker
