"""Reference-compatible import location for audit metrics
(pipelines/step4_vlm_review/audit_metrics.py in the reference)."""

from emr2a_tpu.eval.audit_metrics import (  # noqa: F401
    AbstainQualityMetrics,
    AuditMetricsAggregator,
    ErrorDetectionMetrics,
    SelectivePredictionMetrics,
    compute_audit_metrics,
)
