"""Metric-parity gate: identical embeddings → identical CV metrics.

The golden below implements the reference's fold algorithm literally
with sklearn/numpy (StandardScaler → clamped PCA → row-L2 → per-query
np.dot + argsort top-k → Counter votes), as in utils/cv_evaluator.py.
The TPU evaluator must reproduce its metrics exactly (ties aside, which
float embeddings don't produce).  This is the BASELINE.json Top-1/Top-5
parity acceptance gate run on synthetic data.
"""

from collections import Counter

import numpy as np
import pytest
from sklearn.decomposition import PCA
from sklearn.model_selection import StratifiedKFold
from sklearn.preprocessing import StandardScaler

from emr2a_tpu.eval.cv import CVRetrievalEvaluator


def golden_fold_metrics(train_img, train_txt, test_img, test_txt,
                        train_labels, test_labels, pca_dim, top_k):
    def process(train, test):
        sc = StandardScaler()
        tr = sc.fit_transform(train)
        te = sc.transform(test)
        n_comp = min(pca_dim, tr.shape[0] - 1, tr.shape[1])
        if n_comp > 0:
            p = PCA(n_components=n_comp)
            tr = p.fit_transform(tr)
            te = p.transform(te)
        tr = tr / (np.linalg.norm(tr, axis=1, keepdims=True) + 1e-8)
        te = te / (np.linalg.norm(te, axis=1, keepdims=True) + 1e-8)
        return tr, te

    tr_i, te_i = process(train_img, test_img)
    tr_t, te_t = process(train_txt, test_txt)

    def concat(a, b):
        f = np.concatenate([a, b], axis=1)
        return f / (np.linalg.norm(f, axis=1, keepdims=True) + 1e-8)

    db = concat(tr_i, tr_t)
    queries = concat(te_i, te_t)

    top1_hits, vote_correct, weighted_correct = [], 0, 0
    all_top_labels = []
    for i, q in enumerate(queries):
        sims = db @ q
        idx = np.argsort(sims)[-top_k:][::-1]
        labels = [train_labels[j] for j in idx]
        scores = [float(sims[j]) for j in idx]
        all_top_labels.append(labels)
        top1_hits.append(1 if test_labels[i] in labels[:1] else 0)
        if Counter(labels).most_common(1)[0][0] == test_labels[i]:
            vote_correct += 1
        acc = {}
        for l, s in zip(labels, scores):
            acc[l] = acc.get(l, 0.0) + s
        if max(acc.items(), key=lambda x: x[1])[0] == test_labels[i]:
            weighted_correct += 1

    return {
        "top1": float(np.mean(top1_hits)),
        "vote_acc": vote_correct / len(test_labels),
        "weighted_vote_acc": weighted_correct / len(test_labels),
        "all_top_labels": all_top_labels,
    }


@pytest.mark.parametrize("pca_dim", [8, 32, 1000])
def test_cv_fold_parity_with_reference_algorithm(rng, pca_dim):
    n, dim_i, dim_t, k = 80, 48, 24, 5
    labels4 = ["A", "B", "C", "D"]
    labs = [labels4[i % 4] for i in range(n)]
    centers = rng.randn(4, dim_i) * 1.5
    img = np.stack([centers[i % 4] + rng.randn(dim_i) for i in range(n)]).astype(np.float64)
    txt = rng.randn(n, dim_t).astype(np.float64)
    pids = [f"p{i}" for i in range(n)]

    skf = StratifiedKFold(n_splits=5, shuffle=True, random_state=42)
    ev = CVRetrievalEvaluator(cv_folds=5, pca_dim=pca_dim, top_k=k, seed=42)

    for train_idx, test_idx in skf.split(pids, labs):
        train_labels = [labs[i] for i in train_idx]
        test_labels = [labs[i] for i in test_idx]
        golden = golden_fold_metrics(
            img[train_idx], txt[train_idx], img[test_idx], txt[test_idx],
            train_labels, test_labels, pca_dim, k)
        got = ev.evaluate_fold(
            img[train_idx], txt[train_idx], img[test_idx], txt[test_idx],
            train_labels, test_labels,
            [pids[i] for i in test_idx], fusion="concat",
            train_ids=[pids[i] for i in train_idx])
        assert got["top1"] == pytest.approx(golden["top1"])
        assert got["vote_acc"] == pytest.approx(golden["vote_acc"])
        assert got["weighted_vote_acc"] == pytest.approx(golden["weighted_vote_acc"])
        assert got["all_top_labels"] == golden["all_top_labels"]
        break  # one fold per pca_dim keeps runtime sane; all code paths hit


def test_cv_splits_match_sklearn(rng):
    """Fold membership must be bit-identical to StratifiedKFold(seed 42)."""
    n = 40
    pids = [f"p{i}" for i in range(n)]
    labs = [["A", "B"][i % 2] for i in range(n)]
    ev = CVRetrievalEvaluator(seed=42)
    splits = ev.stratified_split(pids, labs)
    skf = StratifiedKFold(n_splits=5, shuffle=True, random_state=42)
    for (train_ids, test_ids), (tr_idx, te_idx) in zip(splits, skf.split(pids, labs)):
        assert train_ids == [pids[i] for i in tr_idx]
        assert test_ids == [pids[i] for i in te_idx]


def test_int8_tower_embeddings_preserve_fold_metrics(rng):
    """The W8A8 claim the BASELINE parity row rests on: embeddings from
    the quantized tower, composed through the full CV evaluator, yield
    the SAME fold metrics (top1/3/5, vote, weighted vote, macro-F1) as
    the float tower.  Cosine >= 0.999 alone (test_quantized_tower)
    doesn't imply this; here it's asserted end-to-end on separable
    synthetic classes (the regime where retrieval metrics are
    meaningful — near-tie data would measure tie-breaking, not
    quantization)."""
    import jax
    import jax.numpy as jnp
    from emr2a_tpu.models.quantize import quantize_tower_params
    from emr2a_tpu.models.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64,
                    num_layers=2, num_heads=4, mlp_dim=128,
                    pooling="cls_ln", use_pre_layernorm=True,
                    fused_mlp=True, fused_attn=True)
    vt = VisionTransformer(cfg)
    params = vt.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 32, 32, 3)))["params"]
    qparams = quantize_tower_params(params)

    n, classes = 40, ["A", "B", "C", "D"]
    labs = [classes[i % 4] for i in range(n)]
    pids = [f"p{i}" for i in range(n)]
    bases = rng.rand(4, 32, 32, 3) * 2 - 1
    images = np.stack([bases[i % 4] + rng.randn(32, 32, 3) * 0.05
                       for i in range(n)]).astype(np.float32)
    txt = np.stack([rng.randn(16) * 0.1 +
                    np.eye(4)[i % 4].repeat(4) for i in range(n)])

    emb_f = np.asarray(vt.apply({"params": params}, jnp.asarray(images)),
                       np.float64)
    emb_q = np.asarray(vt.apply({"params": qparams}, jnp.asarray(images)),
                       np.float64)
    cos = (emb_f * emb_q).sum(1) / (np.linalg.norm(emb_f, axis=1)
                                    * np.linalg.norm(emb_q, axis=1))
    assert cos.min() > 0.999  # precondition, not the claim under test

    ev = CVRetrievalEvaluator(cv_folds=5, pca_dim=16, top_k=5, seed=42)
    results = {}
    for name, emb in (("float", emb_f), ("int8", emb_q)):
        packed = {p: {"image": emb[i], "text": txt[i]}
                  for i, p in enumerate(pids)}
        results[name] = ev.run_cv(pids, labs, packed, fusion="concat")

    for rf, rq in zip(results["float"]["fold_results"],
                      results["int8"]["fold_results"]):
        for metric in ("top1", "top3", "top5", "vote_acc",
                       "weighted_vote_acc", "macro_precision",
                       "macro_recall", "macro_f1"):
            assert rf[metric] == rq[metric], (metric, rf[metric], rq[metric])


def test_run_cv_custom_top_k_list(rng):
    """A custom top_k_list must flow through to the summary: the
    reference hardcodes top1/3/5 in _compute_summary and crashes on
    any other list (cv_evaluator.py:391-394 — reference bug, fixed)."""
    n, dim = 40, 16
    labs = [["A", "B", "C", "D"][i % 4] for i in range(n)]
    pids = [f"p{i}" for i in range(n)]
    img = rng.randn(n, dim).astype(np.float64)
    txt = rng.randn(n, dim).astype(np.float64)
    embs = {p: {"image": img[i], "text": txt[i]}
            for i, p in enumerate(pids)}
    ev = CVRetrievalEvaluator(cv_folds=3, pca_dim=8, top_k=10, seed=42)
    out = ev.run_cv(pids, labs, embs, fusion="image_only",
                    top_k_list=[1, 10])
    assert set(k for k in out["summary"] if k.startswith("top")) == \
        {"top1", "top10"}
    for fold in out["fold_results"]:
        assert "top10" in fold and "top3" not in fold
