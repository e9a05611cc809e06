"""Hold-out retrieval evaluator.

Contract parity with the reference ``retrieval/evaluator.py:12-275``:
same constructor, same seeded stratified split (``random.Random(seed)``
shuffle per label — kept on host, bit-identical), same result keys
(``top{k}``, ``text_top{k}``, ``image_top{k}``, ``weighted`` variants,
``all_top_labels_top5``).

TPU-native: every per-query numpy loop in the reference becomes one
batched (q, dim) x (dim, n) MXU matmul + ``lax.top_k``.
"""

from __future__ import annotations

import random
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from emr2a_tpu.eval.voting import weighted_vote
from emr2a_tpu.ops.fusion import early_fusion, late_fusion
from emr2a_tpu.ops.similarity import cosine_similarity_matrix
from emr2a_tpu.ops.stats import fit_whiten_transform, whiten_no_pca
from emr2a_tpu.ops.topk import topk_scores


class RetrievalEvaluator:

    def __init__(self, test_ratio: float = 0.2, seed: int = 42,
                 use_pca: bool = False, pca_dim: int = 128):
        self.test_ratio = test_ratio
        self.seed = seed
        self.use_pca = use_pca
        self.pca_dim = pca_dim
        self.rng = random.Random(seed)

    def stratified_split(self, labels: List[str]) -> Tuple[List[int], List[int]]:
        """Seeded per-label shuffle split.

        Behavior parity with the reference (evaluator.py:26-48): the split
        is *defined* by the order in which ``random.Random(seed)`` shuffles
        each label group — groups visited in first-occurrence order, one
        ``shuffle`` call per group. Any restructuring here must preserve
        that RNG call sequence exactly or the split changes.
        """
        groups: Dict[str, List[int]] = {}
        for idx, label in enumerate(labels):
            groups.setdefault(str(label), []).append(idx)

        per_group = [self._split_group(idxs) for idxs in groups.values()]
        train_idx = [i for tr, _ in per_group for i in tr]
        test_idx = [i for _, te in per_group for i in te]
        return train_idx, test_idx

    def _split_group(self, idxs: List[int]) -> Tuple[List[int], List[int]]:
        """Shuffle one label group in place; carve the leading test slice.

        Groups of size <=1 go wholly to train (reference semantics); the
        test count is clamped to [1, len-1] so both sides stay non-empty.
        """
        self.rng.shuffle(idxs)
        if len(idxs) <= 1:
            return idxs, []
        n_test = max(1, min(int(round(len(idxs) * self.test_ratio)),
                            len(idxs) - 1))
        return idxs[n_test:], idxs[:n_test]

    def process_embeddings(self, train_embeddings: np.ndarray,
                           test_embeddings: np.ndarray
                           ) -> Tuple[np.ndarray, np.ndarray]:
        """Scaler → optional clamped PCA → row-L2, jitted.
        Parity: evaluator.py:50-77."""
        train = jnp.asarray(train_embeddings, jnp.float32)
        test = jnp.asarray(test_embeddings, jnp.float32)
        if self.use_pca:
            n_samples, n_features = train.shape
            n_components = min(self.pca_dim, n_samples - 1, n_features)
            if n_components > 0:
                tr, te = fit_whiten_transform(train, test, n_components)
                return np.asarray(tr), np.asarray(te)
        tr, te = whiten_no_pca(train, test)
        return np.asarray(tr), np.asarray(te)

    def align_dims(self, train_text, test_text, train_image, test_image):
        if train_text is not None and test_text is not None:
            train_text, test_text = self.process_embeddings(train_text, test_text)
        if train_image is not None and test_image is not None:
            train_image, test_image = self.process_embeddings(train_image, test_image)
        return train_text, test_text, train_image, test_image

    # -- batched internals --

    def _scores(self, test_emb, train_emb) -> jnp.ndarray:
        """Cosine score matrix; the reference re-normalizes inside its
        similarity call (similarity.py:4-7), so do the same here."""
        return cosine_similarity_matrix(jnp.asarray(test_emb),
                                        jnp.asarray(train_emb), normalize=True)

    def _matrix_metrics(self, scores, train_labels, test_labels,
                        top_k_list, prefix: str = ""):
        """Every per-matrix metric from ONE device top-k readback:
        lax.top_k sorts descending, so idx[:, :k] IS the top-k slice
        for each k — one dispatch + host sync instead of one per k
        plus one for the weighted vote (each sync costs ~30 ms RTT
        through the relay).  Degrades gracefully for tiny cohorts
        (np.argsort[-k:] semantics)."""
        kmax = min(max(list(top_k_list) + [5]), scores.shape[-1])
        vals, idx = topk_scores(scores, kmax)
        vals, idx = np.asarray(vals), np.asarray(idx)
        out: Dict = {}
        for top_k in top_k_list:
            kk = min(top_k, kmax)
            correct = sum(
                1 for i, t in enumerate(test_labels)
                if t in [train_labels[j] for j in idx[i, :kk]])
            out[f"{prefix}top{top_k}"] = correct / len(test_labels)
        k5 = min(5, kmax)
        correct = 0
        for i, t in enumerate(test_labels):
            labels = [train_labels[j] for j in idx[i, :k5]]
            if weighted_vote(labels, vals[i, :k5]) == t:
                correct += 1
        out[f"{prefix}weighted"] = correct / len(test_labels)
        return out, idx

    def evaluate_retrieval(self, train_text, test_text, train_image, test_image,
                           train_labels: List[str], test_labels: List[str],
                           text_weight: float = 0.4, fusion_type: str = "late",
                           score_mode: str = "none",
                           top_k_list: List[int] = [1, 3, 5]) -> Dict:
        results: Dict = {}

        if fusion_type == "early":
            if (train_text is None or test_text is None
                    or train_image is None or test_image is None):
                raise ValueError("Early fusion requires both text and image embeddings")
            train_fused = early_fusion(jnp.asarray(train_text), jnp.asarray(train_image),
                                       text_weight, 1 - text_weight)
            test_fused = early_fusion(jnp.asarray(test_text), jnp.asarray(test_image),
                                      text_weight, 1 - text_weight)
            scores = self._scores(test_fused, train_fused)
            metrics, _ = self._matrix_metrics(scores, train_labels,
                                              test_labels, top_k_list)
            results.update(metrics)
            return results

        text_scores = image_scores = None
        if test_text is not None and train_text is not None:
            text_scores = self._scores(test_text, train_text)
            metrics, _ = self._matrix_metrics(
                text_scores, train_labels, test_labels, top_k_list,
                prefix="text_")
            results.update(metrics)

        if test_image is not None and train_image is not None:
            image_scores = self._scores(test_image, train_image)
            metrics, _ = self._matrix_metrics(
                image_scores, train_labels, test_labels, top_k_list,
                prefix="image_")
            results.update(metrics)

        if text_scores is not None and image_scores is not None:
            fused_scores = late_fusion(text_scores, image_scores,
                                       text_weight, score_mode)
            metrics, idx = self._matrix_metrics(
                fused_scores, train_labels, test_labels, top_k_list)
            results.update(metrics)
            k5 = min(5, idx.shape[1])
            results["all_top_labels_top5"] = [
                [train_labels[j] for j in row] for row in idx[:, :k5]]

        return results

    def get_all_top_labels(self, scores: np.ndarray, train_labels: List[str],
                           test_labels: List[str], top_k: int = 5
                           ) -> List[List[str]]:
        _, idx = topk_scores(jnp.asarray(scores),
                             min(top_k, scores.shape[-1]))
        idx = np.asarray(idx)
        return [[train_labels[j] for j in row] for row in idx]
