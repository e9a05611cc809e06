from emr2a_tpu.ops.similarity import (
    cosine_similarity,
    cosine_similarity_matrix,
    euclidean_similarity,
    l2_normalize,
    l2_normalize_rows,
)
from emr2a_tpu.ops.fusion import (
    concat_embeddings,
    early_fusion,
    late_fusion,
    normalize_scores,
)
from emr2a_tpu.ops.stats import PCA, StandardScaler, fit_whiten_transform
from emr2a_tpu.ops.topk import cosine_topk, topk_scores

__all__ = [
    "cosine_similarity",
    "cosine_similarity_matrix",
    "euclidean_similarity",
    "l2_normalize",
    "l2_normalize_rows",
    "concat_embeddings",
    "early_fusion",
    "late_fusion",
    "normalize_scores",
    "PCA",
    "StandardScaler",
    "fit_whiten_transform",
    "cosine_topk",
    "topk_scores",
]
