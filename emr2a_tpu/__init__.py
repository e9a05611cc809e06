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
