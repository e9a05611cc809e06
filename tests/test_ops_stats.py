"""JAX StandardScaler/PCA vs sklearn (the reference's whitening stack)."""

import numpy as np
from sklearn.decomposition import PCA as SkPCA
from sklearn.preprocessing import StandardScaler as SkScaler

from emr2a_tpu.ops.stats import (
    PCA,
    StandardScaler,
    fit_whiten_transform,
    whiten_no_pca,
)


def test_scaler_matches_sklearn(rng):
    x = rng.randn(40, 12).astype(np.float64) * 3 + 1
    y = rng.randn(10, 12).astype(np.float64)
    sk = SkScaler().fit(x)
    ours = StandardScaler().fit(x)
    np.testing.assert_allclose(
        np.asarray(ours.transform(y)), sk.transform(y), rtol=1e-4, atol=1e-5)


def test_scaler_zero_variance_feature(rng):
    x = rng.randn(20, 4).astype(np.float64)
    x[:, 2] = 5.0  # constant feature
    sk = SkScaler().fit(x)
    ours = StandardScaler().fit(x)
    np.testing.assert_allclose(
        np.asarray(ours.transform(x)), sk.transform(x), rtol=1e-4, atol=1e-5)


def test_pca_matches_sklearn_including_sign(rng):
    x = rng.randn(50, 16).astype(np.float64)
    y = rng.randn(12, 16).astype(np.float64)
    sk = SkPCA(n_components=6).fit(x)
    ours = PCA(n_components=6).fit(x)
    np.testing.assert_allclose(
        np.asarray(ours.transform(y)), sk.transform(y), rtol=1e-3, atol=1e-4)


def test_fused_whiten_matches_sklearn_pipeline(rng):
    train = rng.randn(30, 20).astype(np.float64)
    test = rng.randn(8, 20).astype(np.float64)
    # sklearn pipeline exactly as cv_evaluator.py:73-97
    sc = SkScaler()
    tr_s = sc.fit_transform(train)
    te_s = sc.transform(test)
    pca = SkPCA(n_components=10)
    tr_r = pca.fit_transform(tr_s)
    te_r = pca.transform(te_s)
    tr_n = tr_r / (np.linalg.norm(tr_r, axis=1, keepdims=True) + 1e-8)
    te_n = te_r / (np.linalg.norm(te_r, axis=1, keepdims=True) + 1e-8)

    got_tr, got_te = fit_whiten_transform(train, test, 10)
    np.testing.assert_allclose(np.asarray(got_tr), tr_n, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_te), te_n, rtol=1e-3, atol=1e-4)


def test_whiten_no_pca(rng):
    train = rng.randn(10, 6).astype(np.float64)
    test = rng.randn(4, 6).astype(np.float64)
    sc = SkScaler()
    tr = sc.fit_transform(train)
    te = sc.transform(test)
    tr = tr / (np.linalg.norm(tr, axis=1, keepdims=True) + 1e-8)
    te = te / (np.linalg.norm(te, axis=1, keepdims=True) + 1e-8)
    got_tr, got_te = whiten_no_pca(train, test)
    np.testing.assert_allclose(np.asarray(got_tr), tr, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_te), te, rtol=1e-4, atol=1e-5)
