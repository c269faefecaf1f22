from .coco_eval import CocoMeanAP
from .evaluators import (
    CocoEvaluator,
    Evaluator,
    OodEvaluator,
    OpenImagesEvaluator,
    PascalEvaluator,
    PrecisionAtRecallEvaluator,
    WeightedPascalEvaluator,
    create_evaluator,
)
from .metrics import (
    auroc,
    compute_average_precision,
    compute_cor_loc,
    compute_precision_recall,
    fpr_at_tpr,
)
from .object_detection_evaluation import (
    ObjectDetectionEvaluation,
    PerImageEvaluation,
)
