import numpy as np
import jax.numpy as jnp
import pytest

from image_search_engine_for_historical_research_tpu import rerank
from image_search_engine_for_historical_research_tpu.index import build_flat
from image_search_engine_for_historical_research_tpu.ops import exact_ranks


def retrieval_problem(n_cls=10, per=20, D=32, noise=0.5, seed=0):
    """Hard-ish clustered retrieval problem where QE should help."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_cls, D)).astype(np.float32)
    gallery = centers.repeat(per, 0) + noise * rng.standard_normal((n_cls * per, D)).astype(np.float32)
    queries = centers + noise * rng.standard_normal((n_cls, D)).astype(np.float32)
    gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    labels = np.arange(n_cls).repeat(per)
    return queries, gallery, labels


def precision_at(ranks, labels, q_labels, k=10):
    hits = labels[np.asarray(ranks)[:, :k]] == q_labels[:, None]
    return hits.mean()


class TestFeatureEnhancement:
    def test_improves_precision(self):
        q, g, labels = retrieval_problem()
        ranks0 = np.asarray(exact_ranks(jnp.asarray(q), jnp.asarray(g)))
        p0 = precision_at(ranks0, labels, np.arange(10))
        qe, ranks1 = rerank.feature_enhancement(
            jnp.asarray(q), jnp.asarray(g), jnp.asarray(ranks0), k=10, iterations=3
        )
        p1 = precision_at(np.asarray(ranks1), labels, np.arange(10))
        assert p1 >= p0
        assert np.allclose(np.linalg.norm(np.asarray(qe), axis=1), 1.0, atol=1e-4)

    def test_weights_match_reference_formula(self):
        # k=3, w=4: weights ((3,2,1)/3)^4; verify a hand-computed enhancement
        q, g, _ = retrieval_problem(n_cls=3, per=4, noise=0.1, seed=1)
        ranks0 = np.asarray(exact_ranks(jnp.asarray(q), jnp.asarray(g)))
        qe, _ = rerank.feature_enhancement(
            jnp.asarray(q), jnp.asarray(g), jnp.asarray(ranks0), k=3, w=4.0, iterations=1
        )
        w = (np.arange(3, 0, -1) / 3.0) ** 4
        manual = (g[ranks0[:, :3]] * w[None, :, None]).sum(axis=1)
        manual /= np.linalg.norm(manual, axis=1, keepdims=True) + 1e-6
        np.testing.assert_allclose(np.asarray(qe), manual, atol=1e-5)

    def test_qge1_is_single_iteration_k3(self):
        q, g, _ = retrieval_problem(seed=2)
        ranks0 = np.asarray(exact_ranks(jnp.asarray(q), jnp.asarray(g)))
        r1 = rerank.qge1(jnp.asarray(ranks0), jnp.asarray(q), jnp.asarray(g))
        _, r2 = rerank.feature_enhancement(
            jnp.asarray(q), jnp.asarray(g), jnp.asarray(ranks0), k=3, iterations=1
        )
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))

    def test_qge1_out_k_matches_full_argsort_head(self):
        """The serving path's top-K tail must agree with the full ranking."""
        q, g, _ = retrieval_problem(seed=3)
        ranks0 = np.asarray(exact_ranks(jnp.asarray(q), jnp.asarray(g)))
        full = np.asarray(
            rerank.qge1(jnp.asarray(ranks0), jnp.asarray(q), jnp.asarray(g))
        )
        topk = np.asarray(
            rerank.qge1(
                jnp.asarray(ranks0), jnp.asarray(q), jnp.asarray(g), out_k=7
            )
        )
        np.testing.assert_array_equal(topk, full[:, :7])


class TestAQEDBA:
    def test_aqe_improves_or_holds(self):
        q, g, labels = retrieval_problem(seed=3)
        ranks0 = np.asarray(exact_ranks(jnp.asarray(q), jnp.asarray(g)))
        p0 = precision_at(ranks0, labels, np.arange(10))
        qa, ga = rerank.average_query_expansion(jnp.asarray(q), jnp.asarray(g))
        ranks1 = np.asarray(exact_ranks(jnp.asarray(qa), jnp.asarray(ga)))
        p1 = precision_at(ranks1, labels, np.arange(10))
        assert p1 >= p0 - 0.02
        assert qa.shape == (10, 64)  # doubled dim

    def test_dba_shapes_and_improvement(self):
        q, g, labels = retrieval_problem(seed=4)
        ranks0 = np.asarray(exact_ranks(jnp.asarray(q), jnp.asarray(g)))
        p0 = precision_at(ranks0, labels, np.arange(10))
        qd, gd = rerank.database_augmentation(jnp.asarray(q), jnp.asarray(g))
        assert qd.shape == q.shape and gd.shape == g.shape
        ranks1 = np.asarray(exact_ranks(jnp.asarray(qd), jnp.asarray(gd)))
        p1 = precision_at(ranks1, labels, np.arange(10))
        assert p1 >= p0 - 0.02


class TestDiffusion:
    def test_offline_scores_structure(self):
        q, g, labels = retrieval_problem(n_cls=6, per=15, noise=0.35, seed=5)
        off = rerank.build_diffusion_offline(jnp.asarray(g), n_trunc=40, kd=10)
        assert off.trunc_ids.shape == (90, 40)
        assert off.scores.shape == (90, 40)
        ids = np.asarray(off.trunc_ids)
        np.testing.assert_array_equal(ids[:, 0], np.arange(90))  # self first
        s = np.asarray(off.scores)
        assert np.all(np.isfinite(s))
        # diffusion mass concentrates on the seed's class: within each support,
        # same-class mean score must beat other-class mean score
        # (argmax need not be the seed itself with alpha=0.99 hubs)
        same = np.array([
            s[i][labels[ids[i]] == labels[i]].mean() for i in range(90)
        ])
        other = np.array([
            s[i][labels[ids[i]] != labels[i]].mean()
            if (labels[ids[i]] != labels[i]).any() else -np.inf
            for i in range(90)
        ])
        assert (same > other).mean() > 0.95

    def test_rerank_beats_or_matches_baseline(self):
        q, g, labels = retrieval_problem(n_cls=6, per=15, noise=0.45, seed=6)
        ranks0 = np.asarray(exact_ranks(jnp.asarray(q), jnp.asarray(g)))
        p0 = precision_at(ranks0, labels, np.arange(6), k=10)
        ranks1, off = rerank.diffusion_rerank(
            jnp.asarray(g), jnp.asarray(q), n_trunc=40, kd=10
        )
        p1 = precision_at(np.asarray(ranks1), labels, np.arange(6), k=10)
        assert p1 >= p0 - 0.05, (p0, p1)

    def test_offline_save_load(self, tmp_path):
        _, g, _ = retrieval_problem(n_cls=4, per=10, seed=7)
        off = rerank.build_diffusion_offline(jnp.asarray(g), n_trunc=20, kd=8)
        p = str(tmp_path / "off.npz")
        off.save(p)
        loaded = rerank.DiffusionOffline.load(p)
        np.testing.assert_array_equal(np.asarray(off.trunc_ids), np.asarray(loaded.trunc_ids))
        np.testing.assert_allclose(np.asarray(off.scores), np.asarray(loaded.scores))


class TestKR:
    def test_kr_improves_or_holds(self):
        q, g, labels = retrieval_problem(n_cls=8, per=12, noise=0.45, seed=8)
        ranks0 = np.asarray(exact_ranks(jnp.asarray(q), jnp.asarray(g)))
        p0 = precision_at(ranks0, labels, np.arange(8), k=10)
        ranks1 = np.asarray(rerank.kr_rerank(jnp.asarray(q), jnp.asarray(g)))
        p1 = precision_at(ranks1, labels, np.arange(8), k=10)
        assert ranks1.shape == ranks0.shape
        assert p1 >= p0 - 0.05, (p0, p1)


def test_kr_rerank_dense_oom_guard():
    """Forced-dense 120k-gallery kr must refuse before allocating (16 GB chip
    would wedge); auto now routes that size to the chunked path instead."""
    import numpy as np
    import pytest

    from image_search_engine_for_historical_research_tpu.rerank.kr import kr_rerank

    q = np.zeros((5, 8), np.float32)
    g = np.lib.stride_tricks.as_strided(  # 120k logical rows, no real memory
        np.zeros((1, 8), np.float32), shape=(120_000, 8), strides=(0, 4)
    )
    with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
        kr_rerank(q, g, method="dense")


def test_kr_chunked_matches_dense():
    """The >=100k-envelope chunked path (VERDICT r3 #5) is rank-identical to
    the dense one-jit path on sizes both can run, across uneven chunk edges."""
    import numpy as np

    from image_search_engine_for_historical_research_tpu.rerank.kr import (
        kr_rerank,
        kr_rerank_chunked,
    )

    rng = np.random.RandomState(3)
    q = rng.randn(9, 48).astype(np.float32)
    g = rng.randn(401, 48).astype(np.float32)
    dense = np.asarray(kr_rerank(q, g, method="dense"))
    chunked = np.asarray(kr_rerank_chunked(q, g, row_chunk=128, set_chunk=53))
    np.testing.assert_array_equal(dense[:, :50], chunked[:, :50])


def test_kr_compaction_overflow_fallback_is_exact():
    """The round-5 V-row compaction must be lossless: a compact_width too
    small for the data raises the overflow flag and the wrapper re-runs at
    full width, so ranks equal the dense path bit-for-bit at ANY budget."""
    import numpy as np

    from image_search_engine_for_historical_research_tpu.rerank.kr import (
        kr_rerank,
        kr_rerank_chunked,
    )

    rng = np.random.RandomState(5)
    # tight clusters make k-reciprocal sets expand aggressively (wide V rows)
    centers = rng.randn(12, 32).astype(np.float32)
    g = (centers[:, None] + 0.05 * rng.randn(12, 30, 32)).reshape(-1, 32)
    g = (g / np.linalg.norm(g, axis=1, keepdims=True)).astype(np.float32)
    q = g[:7]
    dense = np.asarray(kr_rerank(q, g, method="dense"))
    full = np.asarray(
        kr_rerank_chunked(q, g, row_chunk=128, set_chunk=53, compact_width=0)
    )
    # chunked vs dense agree except argsort tie order deep in the ranking
    # (equal final distances on this heavily-duplicated fixture)
    np.testing.assert_array_equal(dense[:, :100], full[:, :100])
    for width in (8, 48, 96):  # 8 overflows on this data; all must agree
        compact = np.asarray(
            kr_rerank_chunked(q, g, row_chunk=128, set_chunk=53,
                              compact_width=width)
        )
        np.testing.assert_array_equal(full, compact, err_msg=f"width={width}")


class TestDiffusionAtScale:
    """Scalable offline build: chunked kNN+solve, host f16 artifact, regime
    guard (Reranking.py:212), memory-budgeted support size."""

    def _vecs(self, n=400, d=32, seed=0):
        import jax.numpy as jnp

        rng = np.random.default_rng(seed)
        centers = rng.standard_normal((8, d))
        x = np.repeat(centers, n // 8, axis=0) + 0.2 * rng.standard_normal((n, d))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        return jnp.asarray(x, jnp.float32)

    def test_hosted_artifact_matches_device(self):
        from image_search_engine_for_historical_research_tpu.rerank.diffusion import (
            build_diffusion_offline,
            diffusion_online_scores,
            diffusion_online_scores_hosted,
        )

        v = self._vecs()
        q = v[:5] + 0.01
        dev = build_diffusion_offline(v, n_trunc=128, kd=16, host_out=False)
        host = build_diffusion_offline(v, n_trunc=128, kd=16, host_out=True)
        assert host.on_host and not dev.on_host
        assert host.scores.dtype == np.float16
        s_dev = np.asarray(
            diffusion_online_scores(dev.trunc_ids, dev.scores, v, q)
        )
        s_host = np.asarray(diffusion_online_scores_hosted(host, v, q))
        # identical supports; scores differ only by the f16 rounding
        np.testing.assert_array_equal(
            np.asarray(dev.trunc_ids), host.trunc_ids
        )
        np.testing.assert_allclose(s_host, s_dev, rtol=3e-3, atol=3e-3)
        # ranking agreement at the top
        top_dev = np.argsort(-s_dev, axis=1)[:, :10]
        top_host = np.argsort(-s_host, axis=1)[:, :10]
        assert (top_dev[:, 0] == top_host[:, 0]).all()

    def test_chunked_knn_graph_matches_onecall(self, monkeypatch):
        """The beyond-HBM self-kNN path (host loop of query slices against a
        bf16 gallery) must agree with the one-call f32 path: same top-1
        (self) everywhere and near-total neighbour overlap (bf16 scoring may
        swap near-ties)."""
        from image_search_engine_for_historical_research_tpu.rerank import diffusion

        v = self._vecs(n=320, d=32)  # 320 % 128 != 0: remainder chunk covered
        k = 10
        s_ref, i_ref = diffusion._knn_graph(v, k)
        monkeypatch.setattr(diffusion, "KNN_GRAPH_ONECALL_BYTES", 0)
        monkeypatch.setattr(diffusion, "KNN_GRAPH_QROWS", 128)
        s_chk, i_chk = diffusion._knn_graph(v, k)
        assert s_chk.shape == (320, k) and i_chk.shape == (320, k)
        np.testing.assert_array_equal(
            np.asarray(i_chk[:, 0]), np.asarray(i_ref[:, 0])
        )
        overlap = np.mean([
            len(np.intersect1d(a, b)) / k
            for a, b in zip(np.asarray(i_ref), np.asarray(i_chk))
        ])
        assert overlap >= 0.95
        np.testing.assert_allclose(
            np.asarray(s_chk), np.asarray(s_ref), rtol=2e-2, atol=2e-2
        )

    def test_recompute_solver_matches_tables(self):
        """The MXU vector-recompute CG (beyond-regime default) must agree
        with the adjacency-table CG: same supports semantics, rankings equal
        at the top."""
        import jax.numpy as jnp

        from image_search_engine_for_historical_research_tpu.rerank.diffusion import (
            build_diffusion_offline, diffusion_online_scores,
        )

        v = self._vecs(n=320, d=32)
        q = v[:6] + 0.01
        tab = build_diffusion_offline(v, n_trunc=64, kd=12, solver="tables")
        rec = build_diffusion_offline(v, n_trunc=64, kd=12, solver="recompute")
        s_tab = np.asarray(diffusion_online_scores(tab.trunc_ids, tab.scores, v, q))
        s_rec = np.asarray(diffusion_online_scores(rec.trunc_ids, rec.scores, v, q))
        top_tab = np.argsort(-s_tab, axis=1)
        top_rec = np.argsort(-s_rec, axis=1)
        assert (top_tab[:, 0] == top_rec[:, 0]).all()
        overlap = np.mean([
            len(np.intersect1d(a[:10], b[:10])) / 10
            for a, b in zip(top_tab, top_rec)
        ])
        assert overlap >= 0.9, overlap

        with pytest.raises(ValueError, match="solver"):
            build_diffusion_offline(v, n_trunc=64, kd=12, solver="bogus")

    def test_regime_guard(self):
        import jax.numpy as jnp

        from image_search_engine_for_historical_research_tpu.rerank.diffusion import (
            build_diffusion_offline,
        )

        fake = jnp.zeros((1, 8), jnp.float32)

        class FakeShape:
            shape = (200_000, 8)

        with pytest.raises(ValueError, match="120000|regime"):
            build_diffusion_offline(FakeShape())

    def test_budget_trunc_size(self):
        from image_search_engine_for_historical_research_tpu.rerank.diffusion import (
            budget_trunc_size,
        )

        # 1M rows, 4 GiB budget, f16 scores -> T = floor(4GiB/6/1M) -> 640
        t = budget_trunc_size(1_000_000, 2000, 4 << 30, score_bytes=2)
        assert t == 640
        assert budget_trunc_size(1000, 2000, 1 << 30) == 2000  # budget not binding -> n_trunc
        assert budget_trunc_size(10_000_000, 2000, 1 << 20) == 128  # floor

    def test_save_load_host(self, tmp_path):
        from image_search_engine_for_historical_research_tpu.rerank.diffusion import (
            DiffusionOffline,
            build_diffusion_offline,
        )

        v = self._vecs(n=160)
        off = build_diffusion_offline(v, n_trunc=64, kd=8, host_out=True)
        p = str(tmp_path / "off.npz")
        off.save(p)
        loaded = DiffusionOffline.load(p, to_device=False)
        assert loaded.on_host and loaded.scores.dtype == np.float16
        np.testing.assert_array_equal(loaded.trunc_ids, off.trunc_ids)
