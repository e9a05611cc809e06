"""emr2a_tpu — TPU-native evidence-grounded multimodal retrieval framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``Ali-Xiyao/emr2a-evidence-grounded-multimodal-retrieval``: medical CT
case retrieval with encoder zoo, fused cosine top-k retrieval over a
mesh-sharded embedding database, 5-fold CV evaluation, and a VLM
quality-control audit layer.

Layer map (mirrors reference layering, see SURVEY.md §1):

    pipelines/ baselines/ analysis  (orchestration; CLI entry points)
        eval/  retrieval/  judge/   (CV engine, sharded retrieval, VLM audit)
            encoders/  llms/        (batched jit encode; generation)
                models/  ops/       (Flax towers; Pallas kernels)
                    parallel/       (mesh, sharding, collectives)
                        data/ config/ utils/
"""

__version__ = "0.1.0"

from emr2a_tpu.config import BaseConfig, EncoderConfig, LLMConfig  # noqa: F401

_LAZY = {
    "create_encoder": "emr2a_tpu.encoders",
    "create_llm": "emr2a_tpu.llms",
    "ShardedEmbeddingDatabase": "emr2a_tpu.retrieval",
    "RetrievalEvaluator": "emr2a_tpu.retrieval",
    "CVRetrievalEvaluator": "emr2a_tpu.eval",
    "compute_audit_metrics": "emr2a_tpu.eval",
    "VLMAuditModule": "emr2a_tpu.judge",
    "VLMReviewModule": "emr2a_tpu.judge",
    "load_manifest": "emr2a_tpu.data",
}


def __getattr__(name):
    """Lazy top-level exports (keep `import emr2a_tpu` light)."""
    if name in _LAZY:
        import importlib
        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
