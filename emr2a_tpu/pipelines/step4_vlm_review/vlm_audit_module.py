"""Reference-compatible import location for the audit module
(pipelines/step4_vlm_review/vlm_audit_module.py in the reference)."""

from emr2a_tpu.judge.audit import (  # noqa: F401
    VLMAuditModule,
    create_montage,
    select_even_slices,
)
