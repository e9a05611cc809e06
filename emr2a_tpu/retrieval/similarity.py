"""numpy-in/numpy-out similarity wrappers.

Drop-in equivalents of the reference's ``retrieval/similarity.py:4-15``
for callers holding numpy arrays; compute runs through the jitted ops.
"""

from __future__ import annotations

import numpy as np

from emr2a_tpu.ops import similarity as _ops


def compute_cosine_similarity(query: np.ndarray, database: np.ndarray) -> np.ndarray:
    return np.asarray(_ops.cosine_similarity(np.asarray(query), np.asarray(database)))


def compute_euclidean_similarity(query: np.ndarray, database: np.ndarray) -> np.ndarray:
    return np.asarray(_ops.euclidean_similarity(np.asarray(query), np.asarray(database)))
