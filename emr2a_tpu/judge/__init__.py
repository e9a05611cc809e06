from emr2a_tpu.judge.audit import VLMAuditModule
from emr2a_tpu.judge.backends import FakeVLMBackend, VLMBackend
from emr2a_tpu.judge.parsers import (
    extract_json_payload,
    parse_audit_output,
)
from emr2a_tpu.judge.review import VLMReviewModule

__all__ = [
    "VLMAuditModule",
    "VLMReviewModule",
    "VLMBackend",
    "FakeVLMBackend",
    "parse_audit_output",
    "extract_json_payload",
]
