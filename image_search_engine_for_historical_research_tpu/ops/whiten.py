"""PCA and supervised descriptor whitening.

TPU-native counterparts of ``/root/reference/src/layers/whiten.py`` (duplicated at
``src/utils/whiten.py``). The reference operates on column-major ``(D, N)``
matrices with numpy; here everything is row-major ``(N, D)`` JAX, jit-friendly,
and uses ``eigh`` on the symmetrized covariance (the reference calls ``eig`` on a
symmetric matrix and relies on real outputs).

Contract: ``*learn`` returns ``(m, P)`` with mean ``m: (D,)`` and projection
``P: (D_out, D)``; ``whitenapply(X, m, P)`` maps ``(N, D) -> (N, D_out)`` with a
final L2 normalization, exactly like the reference's ``whitenapply``
(whiten.py:4-12).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("dimensions",))
def whitenapply(X: jnp.ndarray, m: jnp.ndarray, P: jnp.ndarray, dimensions=None):
    """Project, truncate to ``dimensions``, and L2-normalize rows."""
    if dimensions is None:
        dimensions = P.shape[0]
    Xw = (X - m[None, :]) @ P[:dimensions, :].T
    norm = jnp.linalg.norm(Xw, ord=2, axis=-1, keepdims=True)
    return Xw / (norm + 1e-6)


@jax.jit
def pcawhitenlearn(X: jnp.ndarray):
    """Unsupervised PCA whitening (whiten.py:14-30).

    ``P = diag(eigval^-1/2) @ eigvec.T`` with eigenpairs of the (symmetrized)
    covariance sorted by decreasing eigenvalue.
    """
    N = X.shape[0]
    m = X.mean(axis=0)
    Xc = X - m[None, :]
    cov = (Xc.T @ Xc) / N
    cov = (cov + cov.T) / 2.0
    eigval, eigvec = jnp.linalg.eigh(cov)  # ascending
    eigval = eigval[::-1]
    eigvec = eigvec[:, ::-1]
    P = jnp.diag(1.0 / jnp.sqrt(jnp.clip(eigval, min=1e-12))) @ eigvec.T
    return m, P


def _psd_cholesky(S: jnp.ndarray) -> jnp.ndarray:
    """Cholesky with escalating diagonal jitter (whiten.py:50-65).

    jit-friendly: instead of try/except, retry over a fixed jitter ladder and keep
    the first factor that is finite.
    """
    eye = jnp.eye(S.shape[0], dtype=S.dtype)

    def attempt(alpha):
        L = jnp.linalg.cholesky(S + alpha * eye)
        ok = jnp.all(jnp.isfinite(L))
        return L, ok

    L_best, ok = attempt(0.0)
    for alpha in [1e-10, 1e-9, 1e-8, 1e-7, 1e-6, 1e-5, 1e-4, 1e-3, 1e-2]:
        L_try, ok_try = attempt(alpha)
        take = jnp.logical_and(jnp.logical_not(ok), ok_try)
        L_best = jnp.where(take, L_try, L_best)
        ok = jnp.logical_or(ok, ok_try)
    return L_best


@jax.jit
def whitenlearn(X: jnp.ndarray, qidxs: jnp.ndarray, pidxs: jnp.ndarray):
    """Supervised (linear discriminant) whitening (whiten.py:32-48).

    Learned from matched query/positive index pairs: within-pair covariance is
    Cholesky-inverted, then the projected total covariance is rotated to its
    eigenbasis (decreasing eigenvalue order).
    """
    Xq = X[qidxs]               # (P, D)
    Xp = X[pidxs]
    m = Xq.mean(axis=0)
    df = Xq - Xp
    S = (df.T @ df) / df.shape[0]
    P = jnp.linalg.inv(_psd_cholesky(S))
    dfc = (X - m[None, :]) @ P.T
    D = dfc.T @ dfc
    D = (D + D.T) / 2.0
    eigval, eigvec = jnp.linalg.eigh(D)
    eigvec = eigvec[:, ::-1]
    P = eigvec.T @ P
    return m, P
