from ccnet_tpu.evaluation.metrics import ConfusionAccumulator, confusion_matrix, iou_from_confusion
from ccnet_tpu.evaluation.sliding import (
    compute_tiles,
    predict_sliding,
    predict_whole,
    predict_multiscale,
)
from ccnet_tpu.evaluation.evaluator import Evaluator

__all__ = [
    "ConfusionAccumulator",
    "confusion_matrix",
    "iou_from_confusion",
    "compute_tiles",
    "predict_sliding",
    "predict_whole",
    "predict_multiscale",
    "Evaluator",
]
