import numpy as np
import jax.numpy as jnp

from image_search_engine_for_historical_research_tpu.ops import (
    pcawhitenlearn,
    whitenapply,
    whitenlearn,
)


def test_pcawhiten_decorrelates():
    rng = np.random.default_rng(0)
    # correlated data
    A = rng.standard_normal((8, 8)).astype(np.float32)
    X = rng.standard_normal((500, 8)).astype(np.float32) @ A
    m, P = pcawhitenlearn(jnp.asarray(X))
    m, P = np.asarray(m), np.asarray(P)
    Xw = (X - m) @ P.T
    cov = Xw.T @ Xw / X.shape[0]
    np.testing.assert_allclose(cov, np.eye(8), atol=0.15)


def test_whitenapply_unit_norm_and_dim_reduction():
    rng = np.random.default_rng(1)
    X = rng.standard_normal((100, 16)).astype(np.float32)
    m, P = pcawhitenlearn(jnp.asarray(X))
    out = np.asarray(whitenapply(jnp.asarray(X), m, P, dimensions=4))
    assert out.shape == (100, 4)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-3)


def test_whitenlearn_supervised_runs_and_projects():
    rng = np.random.default_rng(2)
    D, N = 12, 300
    X = rng.standard_normal((N, D)).astype(np.float32)
    # pairs: positive = query + small noise
    qidxs = np.arange(0, 100)
    pidxs = np.arange(100, 200)
    X[pidxs] = X[qidxs] + 0.05 * rng.standard_normal((100, D)).astype(np.float32)
    m, P = whitenlearn(jnp.asarray(X), jnp.asarray(qidxs), jnp.asarray(pidxs))
    assert np.all(np.isfinite(np.asarray(P)))
    out = np.asarray(whitenapply(jnp.asarray(X), m, P))
    assert out.shape == (N, D)
    # whitening should tighten query/positive pairs relative to random pairs
    d_pair = np.linalg.norm(out[qidxs] - out[pidxs], axis=1).mean()
    d_rand = np.linalg.norm(out[qidxs] - out[pidxs[::-1]], axis=1).mean()
    assert d_pair < d_rand
