"""Pallas HNSW beam-search kernel tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from image_search_engine_for_historical_research_tpu.index import (
    build_flat,
    build_hnsw,
)
from image_search_engine_for_historical_research_tpu.ops.graph_search import (
    hnsw_descend_entries,
)
from image_search_engine_for_historical_research_tpu.ops.pallas_graph import (
    pallas_beam_search,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2000, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[rng.integers(0, 2000, 8)] + 0.01 * rng.standard_normal((8, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ix = build_hnsw(x, m=8, ef_construction=64)
    _, exact = build_flat(x).search(q, 10)
    return x, q, ix, np.asarray(exact)


def recall(exact, got, k=10):
    return np.mean([
        len(set(exact[r][:k]) & set(np.asarray(got)[r][:k])) / k
        for r in range(exact.shape[0])
    ])


def test_kernel_recall_matches_xla(setup):
    x, q, ix, exact = setup
    starts = hnsw_descend_entries(ix.vectors, ix.nbru, ix.entry, jnp.asarray(q))
    s, i = pallas_beam_search(
        ix.vectors, ix.nbr0, jnp.asarray(q), starts, ef=64, interpret=True
    )
    r_pal = recall(exact, i)
    _, i_xla = ix.search(q, 10, ef=64)
    r_xla = recall(exact, i_xla)
    assert r_pal >= r_xla - 0.1
    assert r_pal > 0.85

    # scores must be descending and match -||q - x||^2
    s = np.asarray(s)
    assert np.all(np.diff(s, axis=1) <= 1e-5)
    i0 = np.asarray(i)[0, 0]
    d = -np.sum((q[0] - x[i0]) ** 2)
    np.testing.assert_allclose(s[0, 0], d, rtol=1e-3, atol=1e-4)


def test_index_pallas_path(setup):
    x, q, ix, exact = setup
    s, i = ix.search_pallas(jnp.asarray(q), 10, ef=64, interpret=True)
    assert i.shape == (8, 10)
    assert recall(exact, i) > 0.85


def test_ragged_n_tail_nodes_reachable():
    """N % NBR_W != 0: tail nodes' neighbor rows must fetch correctly.

    Regression for the window-offset bug where the last N % 8 nodes read
    all-zero neighbor rows (and N < 8 read out of bounds)."""
    rng = np.random.default_rng(3)
    for n in (11, 203):
        x = rng.standard_normal((n, 64)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        q = x[rng.integers(0, n, 6)] + 0.005 * rng.standard_normal(
            (6, 64)
        ).astype(np.float32)
        ix = build_hnsw(x, m=8, ef_construction=32)
        _, exact = build_flat(x).search(q, 5)
        starts = hnsw_descend_entries(
            ix.vectors, ix.nbru, ix.entry, jnp.asarray(q)
        )
        _, i = pallas_beam_search(
            ix.vectors, ix.nbr0, jnp.asarray(q), starts, ef=32, interpret=True
        )
        assert recall(np.asarray(exact), i, k=5) >= 0.99


def test_no_duplicate_results(setup):
    x, q, ix, exact = setup
    starts = hnsw_descend_entries(ix.vectors, ix.nbru, ix.entry, jnp.asarray(q))
    _, i = pallas_beam_search(
        ix.vectors, ix.nbr0, jnp.asarray(q), starts, ef=32, interpret=True
    )
    for row in np.asarray(i):
        valid = row[row >= 0]
        assert len(set(valid.tolist())) == len(valid)


def test_multi_seed_beams(setup):
    """n_seeds > 1: independent beams merged + deduped; recall never below
    the single-seed path, no duplicate ids, and n_seeds=1 equals the old
    behavior exactly."""
    x, q, ix, exact = setup
    if ix.coarse_ids is None or ix.coarse_ids.shape[0] < 3:
        pytest.skip("graph has no coarse level")
    s1, i1 = ix.search_pallas(jnp.asarray(q), 10, ef=32, interpret=True)
    s1b, i1b = ix.search_pallas(jnp.asarray(q), 10, ef=32, interpret=True,
                                n_seeds=1)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i1b))

    s3, i3 = ix.search_pallas(jnp.asarray(q), 10, ef=32, interpret=True,
                              n_seeds=3)
    i3 = np.asarray(i3)
    for r in range(i3.shape[0]):
        assert len(set(i3[r])) == i3.shape[1], "duplicate ids after merge"
    assert recall(exact, i3) >= recall(exact, np.asarray(i1)) - 1e-9
    # scores are descending
    s3 = np.asarray(s3)
    assert (np.diff(s3, axis=1) <= 1e-6).all()
