"""JAX-native StandardScaler + PCA (train-fit only, leakage-safe).

The reference whitens each CV fold with sklearn's StandardScaler → PCA →
row-L2 (utils/cv_evaluator.py:73-97).  This module reproduces those
numerics as pure jitted XLA so fold preprocessing runs on-device:

- StandardScaler: biased std (ddof=0); near-constant features (std <
  10*eps) scale to 1 (sklearn's ``_handle_zeros_in_scale`` behavior).
- PCA: center → SVD → sign-fix via sklearn's ``svd_flip`` convention
  (u_based_decision=False: largest-|.| element of each component row
  made positive), so transformed coordinates match sklearn to float
  tolerance, not just up to sign.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class ScalerState(NamedTuple):
    mean: jax.Array   # (dim,)
    scale: jax.Array  # (dim,) std with zeros replaced by 1


class PCAState(NamedTuple):
    mean: jax.Array        # (dim,)
    components: jax.Array  # (n_components, dim)


class StandardScaler:
    """fit/transform API over the functional core, mirroring sklearn's."""

    def __init__(self) -> None:
        self.state: ScalerState | None = None

    def fit(self, x) -> "StandardScaler":
        self.state = scaler_fit(jnp.asarray(x))
        return self

    def transform(self, x) -> jax.Array:
        assert self.state is not None, "fit() first"
        return scaler_transform(self.state, jnp.asarray(x))

    def fit_transform(self, x) -> jax.Array:
        return self.fit(x).transform(x)


class PCA:
    def __init__(self, n_components: int) -> None:
        self.n_components = n_components
        self.state: PCAState | None = None

    def fit(self, x) -> "PCA":
        self.state = pca_fit(jnp.asarray(x), self.n_components)
        return self

    def transform(self, x) -> jax.Array:
        assert self.state is not None, "fit() first"
        return pca_transform(self.state, jnp.asarray(x))

    def fit_transform(self, x) -> jax.Array:
        return self.fit(x).transform(x)


@jax.jit
def scaler_fit(x: jax.Array) -> ScalerState:
    mean = x.mean(axis=0)
    var = x.var(axis=0)  # ddof=0, as sklearn
    std = jnp.sqrt(var)
    # sklearn _handle_zeros_in_scale: near-constant features (std below
    # 10*eps) count as constant, else float-rounding dust explodes the
    # scaled values.
    tiny = 10 * jnp.finfo(std.dtype).eps
    scale = jnp.where(std < tiny, 1.0, std)
    return ScalerState(mean=mean, scale=scale)


@jax.jit
def scaler_transform(state: ScalerState, x: jax.Array) -> jax.Array:
    return (x - state.mean) / state.scale


@partial(jax.jit, static_argnames=("n_components",))
def pca_fit(x: jax.Array, n_components: int) -> PCAState:
    mean = x.mean(axis=0)
    centered = x - mean
    # Full SVD on the (n, dim) train matrix; fold sizes are small so this
    # is cheap.  f32 for numeric fidelity regardless of input dtype.
    u, s, vt = jnp.linalg.svd(centered.astype(jnp.float32), full_matrices=False)
    # sklearn svd_flip with u_based_decision=False (sklearn>=1.5
    # _fit_full): the max-|.| element of each Vt row is made positive.
    max_abs_cols = jnp.argmax(jnp.abs(vt), axis=1)
    signs = jnp.sign(vt[jnp.arange(vt.shape[0]), max_abs_cols])
    vt = vt * signs[:, None]
    return PCAState(mean=mean, components=vt[:n_components])


@jax.jit
def pca_transform(state: PCAState, x: jax.Array) -> jax.Array:
    return (x - state.mean) @ state.components.T


@partial(jax.jit, static_argnames=("pca_dim",))
def fit_whiten_transform(train: jax.Array, test: jax.Array,
                         pca_dim: int) -> Tuple[jax.Array, jax.Array]:
    """The fold-preprocessing pipeline fused into one jitted call:
    StandardScaler(fit on train) → PCA(fit on train) → row-L2 both.

    ``pca_dim`` must already be clamped by the caller to
    min(requested, n_train-1, dim) (cv_evaluator.py:82-87).  A
    non-positive clamp means "skip PCA" — callers take
    ``whiten_no_pca`` below for that branch, keeping shapes static
    here.
    """
    sstate = scaler_fit(train)
    train_s = scaler_transform(sstate, train)
    test_s = scaler_transform(sstate, test)
    pstate = pca_fit(train_s, pca_dim)
    train_r = pca_transform(pstate, train_s)
    test_r = pca_transform(pstate, test_s)
    eps = 1e-8
    train_n = train_r / (jnp.linalg.norm(train_r, axis=1, keepdims=True) + eps)
    test_n = test_r / (jnp.linalg.norm(test_r, axis=1, keepdims=True) + eps)
    return train_n, test_n


@jax.jit
def whiten_no_pca(train: jax.Array, test: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Scaler + row-L2 without PCA (the n_components<=0 branch,
    cv_evaluator.py:86-87)."""
    sstate = scaler_fit(train)
    eps = 1e-8
    tr = scaler_transform(sstate, train)
    te = scaler_transform(sstate, test)
    tr = tr / (jnp.linalg.norm(tr, axis=1, keepdims=True) + eps)
    te = te / (jnp.linalg.norm(te, axis=1, keepdims=True) + eps)
    return tr, te
