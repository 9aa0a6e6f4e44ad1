import numpy as np
import jax.numpy as jnp
import pytest

from image_search_engine_for_historical_research_tpu.ops import (
    exact_ranks,
    exact_scores,
    exact_topk,
)


def data(N=1000, Q=7, D=32, seed=0, normalize=True):
    rng = np.random.default_rng(seed)
    db = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((Q, D)).astype(np.float32)
    if normalize:
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q, db


@pytest.mark.parametrize("metric", ["ip", "l2"])
@pytest.mark.parametrize("chunk", [128, 256, 4096])
def test_exact_topk_matches_numpy(metric, chunk):
    q, db = data()
    k = 25
    scores, idx = exact_topk(jnp.asarray(q), jnp.asarray(db), k, metric=metric, chunk=chunk)
    scores, idx = np.asarray(scores), np.asarray(idx)
    if metric == "ip":
        ref = q @ db.T
    else:
        ref = -np.sum((q[:, None, :] - db[None, :, :]) ** 2, axis=-1)
    ref_idx = np.argsort(-ref, axis=1)[:, :k]
    # compare score sets (ordering of exact ties may differ)
    for i in range(q.shape[0]):
        np.testing.assert_allclose(
            np.sort(ref[i, ref_idx[i]]), np.sort(ref[i, idx[i]]), rtol=1e-4, atol=1e-5
        )
    # and the top-1 index must match exactly
    np.testing.assert_array_equal(ref_idx[:, 0], idx[:, 0])


def test_l2_scores_are_shifted_squared_distances():
    q, db = data(N=300, normalize=False)
    scores, idx = exact_topk(jnp.asarray(q), jnp.asarray(db), 5, metric="l2")
    d2 = np.sum((q[:, None, :] - db[None, :, :]) ** 2, axis=-1)
    qn2 = np.sum(q**2, axis=1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(scores), -(np.sort(d2, axis=1)[:, :5] - qn2), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(idx), np.argsort(d2, axis=1)[:, :5])


def test_k_larger_than_n_is_clamped():
    q, db = data(N=50)
    scores, idx = exact_topk(jnp.asarray(q), jnp.asarray(db), 200)
    assert idx.shape == (7, 50)
    # every database row appears exactly once
    assert np.array_equal(np.sort(np.asarray(idx), axis=1), np.tile(np.arange(50), (7, 1)))


def test_unaligned_sizes():
    q, db = data(N=777, D=33)
    scores, idx = exact_topk(jnp.asarray(q), jnp.asarray(db), 10, chunk=256)
    ref = np.argsort(-(q @ db.T), axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(idx), ref)
    assert np.asarray(idx).max() < 777  # padding never leaks


def test_exact_ranks_full_ordering():
    q, db = data(N=200)
    ranks = np.asarray(exact_ranks(jnp.asarray(q), jnp.asarray(db)))
    ref = np.argsort(-(q @ db.T), axis=1)
    np.testing.assert_array_equal(ranks, ref)


def test_exact_scores_l2_ordering_consistent():
    q, db = data(N=123, normalize=False)
    s = np.asarray(exact_scores(jnp.asarray(q), jnp.asarray(db), metric="l2"))
    d2 = np.sum((q[:, None, :] - db[None, :, :]) ** 2, axis=-1)
    np.testing.assert_array_equal(np.argsort(-s, axis=1), np.argsort(d2, axis=1))


def test_bfloat16_matmul_path_top1_agrees():
    q, db = data(N=2048, D=64, seed=3)
    _, idx16 = exact_topk(jnp.asarray(q), jnp.asarray(db), 10, matmul_dtype=jnp.bfloat16)
    ref = np.argsort(-(q @ db.T), axis=1)
    # bf16 scores reorder near-ties, but the top hit should be stable
    assert (np.asarray(idx16)[:, 0] == ref[:, 0]).mean() >= 0.85


def test_query_block_path_matches_oracle(monkeypatch):
    """Gallery-scale query batches (self-kNN at 120k) route through QBLOCK
    blocking; force it small and check against the argsort oracle."""
    import image_search_engine_for_historical_research_tpu.ops.topk as T

    q, db = data(N=900, D=16, seed=7)
    q = q[:850]
    monkeypatch.setattr(T, "QBLOCK", 100)
    monkeypatch.setattr(T, "ONESHOT_SCORE_BYTES", 1 << 14)
    _, idx = T.exact_topk.__wrapped__(
        jnp.asarray(q), jnp.asarray(db), 5, metric="ip", chunk=256,
        matmul_dtype=None, approximate=False, recall_target=0.95,
    )
    ref = np.argsort(-(q @ db.T), axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), ref)


class TestStreamingExactTopk:
    """Beyond-HBM exact path: host-resident gallery streamed in chunks."""

    def test_matches_in_memory_exact(self):
        import numpy as np
        from image_search_engine_for_historical_research_tpu.ops import (
            exact_topk, streaming_exact_topk,
        )

        rng = np.random.default_rng(0)
        db = rng.standard_normal((1000, 32)).astype(np.float32)
        q = rng.standard_normal((7, 32)).astype(np.float32)
        s_ref, i_ref = exact_topk(jnp.asarray(q), jnp.asarray(db), 13)
        for chunk in (64, 128, 999, 4096):
            s, i = streaming_exact_topk(q, db, 13, device_chunk=chunk)
            np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
            np.testing.assert_allclose(
                np.asarray(s), np.asarray(s_ref), rtol=1e-5
            )

    def test_k_exceeds_chunk_tail(self):
        import numpy as np
        from image_search_engine_for_historical_research_tpu.ops import (
            streaming_exact_topk,
        )

        rng = np.random.default_rng(1)
        db = rng.standard_normal((130, 16)).astype(np.float32)
        q = rng.standard_normal((3, 16)).astype(np.float32)
        # last chunk (2 rows) smaller than k=20
        s, i = streaming_exact_topk(q, db, 20, device_chunk=128)
        ref = np.argsort(-(q @ db.T), axis=1)[:, :20]
        np.testing.assert_array_equal(np.asarray(i), ref)
