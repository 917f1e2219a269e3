from .dispatch import evaluate
from .instmask import InstSeg, iou_int_uni
from .pap_eval import PapEvaluator

__all__ = ["InstSeg", "iou_int_uni", "PapEvaluator", "evaluate"]
