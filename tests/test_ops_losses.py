import numpy as np
import jax.numpy as jnp

from image_search_engine_for_historical_research_tpu.ops import (
    contrastive_loss,
    sos_loss,
    triplet_loss,
)


def make_tuples(nq=3, n_neg=4, D=8, seed=0):
    """Flat (nq*S, D) batch laid out [q, p, n1..n_neg] per tuple + labels."""
    rng = np.random.default_rng(seed)
    S = 2 + n_neg
    x = rng.standard_normal((nq * S, D)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    label = np.tile([-1, 1] + [0] * n_neg, nq).astype(np.int32)
    return x, label, S


def test_contrastive_matches_naive():
    x, label, S = make_tuples()
    expected = 0.0
    margin, eps = 0.7, 1e-6
    for t in range(len(x) // S):
        q = x[t * S]
        for j in range(1, S):
            o = x[t * S + j]
            y = label[t * S + j]
            d = np.sqrt(np.sum((q - o + eps) ** 2))
            expected += 0.5 * y * d**2 + 0.5 * (1 - y) * max(margin - d, 0) ** 2
    got = float(contrastive_loss(jnp.asarray(x), jnp.asarray(label)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_triplet_matches_naive():
    x, label, S = make_tuples(seed=1)
    margin = 0.1
    nq = len(x) // S
    expected = 0.0
    for t in range(nq):
        a, p = x[t * S], x[t * S + 1]
        for j in range(2, S):
            n = x[t * S + j]
            dp = np.sum((a - p) ** 2)
            dn = np.sum((a - n) ** 2)
            expected += max(dp - dn + margin, 0)
    expected /= nq
    got = float(triplet_loss(jnp.asarray(x), jnp.asarray(label)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_sos_matches_naive():
    x, label, S = make_tuples(seed=2)
    nq = len(x) // S
    acc = 0.0
    for t in range(nq):
        a, p = x[t * S], x[t * S + 1]
        for j in range(2, S):
            n = x[t * S + j]
            dan = np.sum((a - n) ** 2)
            dpn = np.sum((p - n) ** 2)
            acc += (dan - dpn) ** 2
    expected = np.sqrt(acc) / nq
    got = float(sos_loss(jnp.asarray(x), jnp.asarray(label)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_losses_differentiable_and_jittable():
    import jax

    x, label, S = make_tuples()
    xj, lj = jnp.asarray(x), jnp.asarray(label)

    @jax.jit
    def total(v):
        return contrastive_loss(v, lj, S=S) + 0.1 * sos_loss(v, lj, S=S)

    g = jax.grad(total)(xj)
    assert g.shape == xj.shape
    assert bool(jnp.all(jnp.isfinite(g)))
