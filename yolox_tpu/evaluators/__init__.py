from yolox_tpu.evaluators.coco_evaluator import CocoEvaluator
from yolox_tpu.evaluators.voc_eval import voc_eval
from yolox_tpu.evaluators.voc_evaluator import VocEvaluator

__all__ = ["CocoEvaluator", "voc_eval", "VocEvaluator"]
