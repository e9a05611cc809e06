from emr2a_tpu.eval.metrics import (
    compute_accuracy,
    compute_confusion_matrix,
    compute_precision_recall_f1,
    compute_top_k_accuracy,
)
from emr2a_tpu.eval.cv import CVRetrievalEvaluator
from emr2a_tpu.eval.audit_metrics import compute_audit_metrics

__all__ = [
    "compute_accuracy",
    "compute_top_k_accuracy",
    "compute_precision_recall_f1",
    "compute_confusion_matrix",
    "CVRetrievalEvaluator",
    "compute_audit_metrics",
]
