"""Cross-stack end-to-end parity: run the REFERENCE pipeline code itself.

The strongest parity evidence obtainable without network egress: the
reference's own matchers / re-rankers / evaluators (imported from
``/root/reference/src/utils/`` via ``reference_pipeline.py`` stubs) and this
framework both run on identical synthetic descriptors + ground truth, and

- exact paths (``matching_L2``, ``qge1``, ``compute_map*``) must produce
  IDENTICAL ranks and bit-equal mAP;
- approximate paths (PQ/ADC, HNSW, diffusion) must agree within stated
  recall/mAP bounds.

Descriptors are clustered with well-separated pairwise scores so f32-vs-f64
rounding cannot reorder ranks on the exact paths.
"""

import io
import os
import pickle
import re
import sys
from contextlib import redirect_stdout

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import reference_pipeline as rp

from image_search_engine_for_historical_research_tpu.evaluation import (
    compute_map,
    compute_map_revisited,
)
from image_search_engine_for_historical_research_tpu.index import build_flat


def assert_ranks_equal_modulo_ties(ref, ours, scores, tol=1e-5):
    """Rank matrices must be identical except where the underlying scores tie.

    ``scores (Q, N)``: independent f64 ground-truth scores. numpy-f32 and
    XLA-f32 round sub-epsilon-equal scores differently; a swap between two
    ids whose true scores differ by <= tol is not a ranking error.
    """
    ref, ours = np.asarray(ref), np.asarray(ours)
    qs, ps = np.nonzero(ref != ours)
    for qi, pi in zip(qs, ps):
        a, b = ref[qi, pi], ours[qi, pi]
        gap = abs(scores[qi, a] - scores[qi, b])
        assert gap <= tol, f"query {qi} rank {pi}: ids {a} vs {b}, score gap {gap}"
    # ties must be rare — systematic disagreement is a bug regardless
    assert len(qs) <= max(4, ref.size // 2000), f"{len(qs)} mismatches"


def make_scene(seed=0, n_clusters=30, views=50, D=64, noise=0.15):
    """Clustered gallery + one query per cluster + revisited-style gnd."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, D)).astype(np.float32)
    gal = (
        centers[:, None] + noise * rng.standard_normal((n_clusters, views, D))
    ).reshape(-1, D).astype(np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    labels = np.repeat(np.arange(n_clusters), views)
    q = (centers + noise * rng.standard_normal((n_clusters, D))).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    gnd = []
    for c in range(n_clusters):
        members = np.where(labels == c)[0]
        rng.shuffle(members)
        n_e = len(members) // 2
        n_h = len(members) // 4
        gnd.append(
            {
                "easy": members[:n_e],
                "hard": members[n_e : n_e + n_h],
                "junk": members[n_e + n_h :],
            }
        )
    return gal, q, gnd, labels


# ---------------------------------------------------------------------------
# 1. Exact search: reference matching_L2 vs our flat index
# ---------------------------------------------------------------------------


class TestExactSearchParity:
    def test_matching_l2_identical_ranks(self):
        nn = rp.load_reference_nnsearch()
        gal, q, gnd, _ = make_scene()
        K = 100

        ref_idx, _ = nn.matching_L2(K, gal.copy(), q.copy())
        _, our_idx = build_flat(gal).search(q, K)
        np.testing.assert_array_equal(ref_idx, np.asarray(our_idx))

    def test_full_ranking_map_bitequal(self):
        """Both stacks' full rankings feed both stacks' evaluators: one mAP."""
        nn = rp.load_reference_nnsearch()
        ev, ev2, _ = rp.load_reference_evaluate()
        gal, q, gnd, _ = make_scene(seed=1)
        N = gal.shape[0]

        ref_idx, _ = nn.matching_L2(N, gal.copy(), q.copy())
        _, our_idx = build_flat(gal).search(q, N)
        our_idx = np.asarray(our_idx)
        scores64 = q.astype(np.float64) @ gal.astype(np.float64).T
        assert_ranks_equal_modulo_ties(ref_idx, our_idx, scores64)

        # reference evaluator on reference ranks (column-major) vs our
        # evaluator on our ranks (row-major): medium split
        gnd_m = [
            {"ok": np.concatenate([g["easy"], g["hard"]]), "junk": g["junk"]}
            for g in gnd
        ]
        ref_map, ref_aps, ref_pr, ref_prs = ev.compute_map(
            ref_idx.T, gnd_m, [1, 5, 10]
        )
        ours = compute_map_revisited(our_idx, gnd)
        assert ours.mapM == pytest.approx(ref_map, abs=1e-12)
        np.testing.assert_allclose(ours.apsM, ref_aps, atol=1e-12)
        np.testing.assert_allclose(ours.mprM, ref_pr, atol=1e-12)


# ---------------------------------------------------------------------------
# 2. mAP protocol: randomized bit-exact comparison vs evaluate.py/evaluate2.py
# ---------------------------------------------------------------------------


class TestMapProtocolBitExact:
    def _random_case(self, rng):
        N = int(rng.integers(30, 150))
        nq = int(rng.integers(1, 8))
        ranks = np.stack([rng.permutation(N) for _ in range(nq)])  # (nq, N)
        gnd = []
        for i in range(nq):
            ids = rng.permutation(N)
            n_ok = int(rng.integers(0, 25)) if i > 0 else int(rng.integers(1, 25))
            n_junk = int(rng.integers(0, 60))
            gnd.append(
                {
                    "ok": ids[:n_ok],
                    "junk": ids[n_ok : n_ok + n_junk],  # junk-heavy, disjoint
                }
            )
        return ranks, gnd

    def test_compute_map_bitexact_randomized(self):
        ev, ev2, _ = rp.load_reference_evaluate()
        rng = np.random.default_rng(7)
        for trial in range(40):
            ranks, gnd = self._random_case(rng)
            ref = ev.compute_map(ranks.T, gnd, [1, 5, 10])
            got = compute_map(ranks, gnd, (1, 5, 10))
            assert got[0] == pytest.approx(ref[0], abs=1e-12), f"trial {trial}"
            np.testing.assert_allclose(got[1], ref[1], atol=1e-12)
            np.testing.assert_allclose(got[2], ref[2], atol=1e-12)
            np.testing.assert_allclose(got[3], ref[3], atol=1e-12)

    def test_compute_map2_bitexact_randomized(self):
        """evaluate2.compute_map2 (the re-rankers' copy, no P@k)."""
        ev, ev2, _ = rp.load_reference_evaluate()
        rng = np.random.default_rng(11)
        for trial in range(20):
            ranks, gnd = self._random_case(rng)
            ref = ev2.compute_map2(ranks.T, gnd)
            got = compute_map(ranks, gnd)
            assert got[0] == pytest.approx(ref[0], abs=1e-12), f"trial {trial}"
            np.testing.assert_allclose(got[1], ref[1], atol=1e-12)

    def test_revisited_splits_bitexact(self):
        """Full E/M/H split construction vs compute_map_and_print2's."""
        ev, ev2, _ = rp.load_reference_evaluate()
        rng = np.random.default_rng(13)
        N, nq = 120, 6
        ranks = np.stack([rng.permutation(N) for _ in range(nq)])
        gnd = []
        for _ in range(nq):
            ids = rng.permutation(N)
            gnd.append(
                {"easy": ids[:20], "hard": ids[20:30], "junk": ids[30:80]}
            )
        ours = compute_map_revisited(ranks, gnd)

        buf = io.StringIO()
        with redirect_stdout(buf):
            ev2.compute_map_and_print2("roxford5k", np.asarray(ranks).T, gnd)
        line = [l for l in buf.getvalue().splitlines() if "mAP E" in l][0]
        e, m, h = map(float, re.findall(r"[\d.]+", line.split("mAP")[1]))
        assert round(ours.mapE * 100, 2) == pytest.approx(e)
        assert round(ours.mapM * 100, 2) == pytest.approx(m)
        assert round(ours.mapH * 100, 2) == pytest.approx(h)


# ---------------------------------------------------------------------------
# 3. qge1 (serving-path alphaQE): identical re-ranked permutation
# ---------------------------------------------------------------------------


class TestQge1Parity:
    def test_qge1_identical_ranks(self):
        rr = rp.load_reference_reranking()
        from image_search_engine_for_historical_research_tpu.rerank import qge1

        gal, q, gnd, _ = make_scene(seed=2)
        N = gal.shape[0]
        _, our_idx = build_flat(gal).search(q, N)
        our_idx = np.asarray(our_idx)

        # reference: column-major ranks (N, Q), D x N / D x Q vectors
        ref_ranks_aqe = rr.qge1(our_idx.T, q.T, gal.T, N)
        our_ranks_aqe = np.asarray(qge1(our_idx, q, gal))
        # independent f64 recomputation of the enhanced-query scores for the
        # tie check (k=3, w=4, one iteration — Reranking.py:287-306)
        w = ((np.arange(3, 0, -1) / 3.0) ** 4.0)[None, :, None]
        q_enh = np.sum(gal.astype(np.float64)[our_idx[:, :3]] * w, axis=1)
        q_enh /= np.linalg.norm(q_enh, axis=1, keepdims=True) + 1e-6
        scores64 = q_enh @ gal.astype(np.float64).T
        assert_ranks_equal_modulo_ties(ref_ranks_aqe.T, our_ranks_aqe, scores64)

    def test_qge1_out_k_head_matches(self):
        rr = rp.load_reference_reranking()
        from image_search_engine_for_historical_research_tpu.rerank import qge1

        gal, q, gnd, _ = make_scene(seed=3, n_clusters=20, views=30)
        N = gal.shape[0]
        _, our_idx = build_flat(gal).search(q, N)
        our_idx = np.asarray(our_idx)
        ref_ranks_aqe = rr.qge1(our_idx.T, q.T, gal.T, N)
        head = np.asarray(qge1(our_idx, q, gal, out_k=50))
        np.testing.assert_array_equal(ref_ranks_aqe.T[:, :50], head)


# ---------------------------------------------------------------------------
# 4. PQ / ADC: shared codebook -> identical codes, distances, ranks
# ---------------------------------------------------------------------------


class TestNanoPQParity:
    def test_adc_shared_codebook_identical(self):
        import jax.numpy as jnp

        rp.load_reference_nnsearch()
        import nanopq  # the scipy-kmeans2 stub (real nanopq's backend)

        from image_search_engine_for_historical_research_tpu.ops.pq import (
            PQCodebook,
            pq_dist_table,
            pq_encode,
            pq_search,
        )

        gal, q, gnd, _ = make_scene(seed=4, n_clusters=20, views=40)
        M, Ks = 8, 32
        pq = nanopq.PQ(M=M, Ks=Ks, verbose=False)
        pq.fit(gal, iter=20, seed=42)
        ref_codes = pq.encode(gal)

        cb = PQCodebook(jnp.asarray(pq.codewords))
        our_codes = np.asarray(pq_encode(cb, jnp.asarray(gal)))
        np.testing.assert_array_equal(ref_codes.astype(np.int64), our_codes)

        # asymmetric distances: reference per-query dtable vs our batched LUT
        luts = np.asarray(pq_dist_table(cb, jnp.asarray(q)))  # (Q, M, Ks)
        for row in range(4):
            ref_d = pq.dtable(q[row]).adist(ref_codes)
            our_d = luts[row][np.arange(M)[None, :], our_codes].sum(axis=1)
            np.testing.assert_allclose(our_d, ref_d, rtol=1e-5, atol=1e-5)

        # end-to-end ranks through our ADC top-k
        scores, idx = pq_search(cb, jnp.asarray(our_codes.astype(np.int32)),
                                jnp.asarray(q), 20)
        for row in range(q.shape[0]):
            ref_rank = np.argsort(pq.dtable(q[row]).adist(ref_codes),
                                  kind="stable")[:20]
            got = np.asarray(idx[row])
            # identical candidate SET; order may differ on f32 ADC ties
            assert len(set(ref_rank) & set(got)) >= 19

    def test_matching_nano_pq_recall_bound(self, tmp_path):
        """Reference matching_Nano_PQ end-to-end vs our independently-fit PQ:
        both must hit the exact top-10 at comparable recall."""
        nn = rp.load_reference_nnsearch()
        from image_search_engine_for_historical_research_tpu.index import build_pq

        gal, q, gnd, _ = make_scene(seed=5, n_clusters=20, views=40)
        cwd = os.getcwd()
        os.chdir(tmp_path)  # reference writes outputs/<dataset>/PQ.pkl
        try:
            ref_idx, _ = nn.matching_Nano_PQ(
                10, gal.copy(), q.copy(), "synth", N_books=8, n_bits_perbook=5
            )
        finally:
            os.chdir(cwd)
        ours = build_pq(gal, M=8, Ks=32)
        _, our_idx = ours.search(q, 10)
        _, exact = build_flat(gal).search(q, 10)
        exact = np.asarray(exact)

        def recall(idx):
            idx = np.asarray(idx)
            return np.mean(
                [len(set(exact[r]) & set(idx[r])) / 10 for r in range(len(q))]
            )

        r_ref, r_ours = recall(ref_idx), recall(our_idx)
        assert r_ours >= r_ref - 0.05, (r_ref, r_ours)


# ---------------------------------------------------------------------------
# 5. HNSW: the reference's pure-python graph as a recall oracle
# ---------------------------------------------------------------------------


class _NoneAny:
    """Stand-in for old-numpy ``np.array(None)``: ``.any()`` returns None.

    The reference's ``HNSW.__init__`` tests ``(self.Codewords).any() == None``
    (nnsearch.py:129) — a pattern that selected the raw-vector branch only
    under old numpy semantics (SURVEY.md fidelity note). Modern numpy returns
    ``np.False_`` and mis-routes to the PQ branch; this proxy restores the
    behavior the reference was written against.
    """

    def any(self, *a, **k):  # noqa: D401
        return None


class _NumpyCompat:
    # pre-1.20 scalar aliases the reference still uses (np.int at
    # Reranking.py's truncation_ranks allocation)
    int = int
    float = float
    bool = bool
    object = object

    def __getattr__(self, k):
        return getattr(np, k)

    def array(self, x, *a, **k):
        if x is None:
            return _NoneAny()
        return np.array(x, *a, **k)


class TestHNSWOracle:
    def test_recall_matches_pure_python_hnsw(self, monkeypatch):
        import random as pyrandom

        nn = rp.load_reference_nnsearch()
        monkeypatch.setattr(nn, "np", _NumpyCompat())
        from image_search_engine_for_historical_research_tpu.index import build_hnsw

        gal, q, gnd, _ = make_scene(seed=6, n_clusters=15, views=40, D=32)
        q = q[:10]
        pyrandom.seed(0)  # reference levels use the global `random()`
        hnsw = nn.HNSW("l2", m=8, ef=64)
        for row in gal:
            hnsw.add(row)

        _, exact = build_flat(gal).search(q, 10)
        exact = np.asarray(exact)

        ref_hits = []
        for row in range(len(q)):
            res = np.array(hnsw.search(q[row], 10, ef=64))[:, 0].astype(int)
            ref_hits.append(len(set(exact[row]) & set(res)) / 10)
        r_ref = float(np.mean(ref_hits))

        ix = build_hnsw(gal, m=8, ef_construction=64)
        _, our_idx = ix.search(q, 10, ef=64)
        our_idx = np.asarray(our_idx)
        r_ours = float(np.mean(
            [len(set(exact[r]) & set(our_idx[r])) / 10 for r in range(len(q))]
        ))
        assert r_ours >= r_ref - 0.05, (r_ref, r_ours)


# ---------------------------------------------------------------------------
# 6. AQE cross-stack: reference driver's printed mAP vs our pipeline's
# ---------------------------------------------------------------------------


class TestAqeCrossStack:
    def test_average_query_expansion_map(self):
        rr = rp.load_reference_reranking()
        from image_search_engine_for_historical_research_tpu.rerank import (
            average_query_expansion,
        )

        gal, q, gnd, _ = make_scene(seed=8, n_clusters=20, views=40)
        buf = io.StringIO()
        with redirect_stdout(buf):
            rr.average_query_expansion(q.T, gal.T, gal.shape[0], "roxford5k", gnd)
        line = [l for l in buf.getvalue().splitlines() if "mAP E" in l][0]
        e, m, h = map(float, re.findall(r"[\d.]+", line.split("mAP")[1]))

        q_aug, v_aug = average_query_expansion(q, gal)
        _, idx = build_flat(np.asarray(v_aug)).search(np.asarray(q_aug), gal.shape[0])
        ours = compute_map_revisited(np.asarray(idx), gnd)
        assert round(ours.mapM * 100, 2) == pytest.approx(m, abs=0.15)
        assert round(ours.mapE * 100, 2) == pytest.approx(e, abs=0.15)
        assert round(ours.mapH * 100, 2) == pytest.approx(h, abs=0.15)

    def test_database_augmentation_map(self):
        rr = rp.load_reference_reranking()
        from image_search_engine_for_historical_research_tpu.rerank import (
            database_augmentation,
        )

        gal, q, gnd, _ = make_scene(seed=9, n_clusters=20, views=40)
        buf = io.StringIO()
        with redirect_stdout(buf):
            rr.database_augmentation(q.T, gal.T, gal.shape[0], "roxford5k", gnd)
        line = [l for l in buf.getvalue().splitlines() if "mAP E" in l][0]
        e, m, h = map(float, re.findall(r"[\d.]+", line.split("mAP")[1]))

        q_aug, v_aug = database_augmentation(q, gal)
        _, idx = build_flat(np.asarray(v_aug)).search(np.asarray(q_aug), gal.shape[0])
        ours = compute_map_revisited(np.asarray(idx), gnd)
        assert round(ours.mapM * 100, 2) == pytest.approx(m, abs=0.15)
        assert round(ours.mapE * 100, 2) == pytest.approx(e, abs=0.15)
        assert round(ours.mapH * 100, 2) == pytest.approx(h, abs=0.15)


class TestKrReciprocalCrossStack:
    def test_kr_rerank_against_reference(self, monkeypatch):
        """The reference's torch kr_reranking (CPU-runnable) vs our boolean-
        matmul formulation: approximate path (the reference normalizes
        distances per 6000-column block; we normalize globally), judged by
        rank overlap and mAP parity."""
        import torch

        rr = rp.load_reference_reranking()
        monkeypatch.setattr(rr, "np", _NumpyCompat())
        # kr_reranking hard-codes .cuda() / empty_cache (Reranking.py:548,553);
        # run it on CPU torch by making those no-ops for this test
        monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
        monkeypatch.setattr(torch.cuda, "empty_cache", lambda: None)
        from image_search_engine_for_historical_research_tpu.rerank import kr_rerank

        gal, q, gnd, _ = make_scene(seed=20, n_clusters=15, views=40, D=32)
        q = q[:15]

        buf = io.StringIO()
        with redirect_stdout(buf):
            ref_idx = rr.kr_reranking(q.T, gal.T)       # (Q, N) ascending
        our_idx = np.asarray(kr_rerank(q, gal))

        # approximate agreement: the reference's per-block max normalization
        # and host-loop V construction reorder near-ties; the protocol metric
        # must still match
        overlap = np.mean([
            len(set(ref_idx[i][:10]) & set(our_idx[i][:10])) / 10
            for i in range(len(q))
        ])
        assert overlap >= 0.75, overlap

        ref_map = compute_map_revisited(np.asarray(ref_idx), gnd).mapM
        our_map = compute_map_revisited(our_idx, gnd).mapM
        assert our_map == pytest.approx(ref_map, abs=0.02), (ref_map, our_map)


# ---------------------------------------------------------------------------
# 7. Diffusion random walk: reference Diffusion vs our batched-CG pipeline
# ---------------------------------------------------------------------------


class _SparseLinalgCompat:
    """scipy >= 1.14 removed ``cg(tol=)`` (renamed rtol); the reference
    (diffusion.py:18) predates that. Translate the kwarg, delegate the rest."""

    def __getattr__(self, k):
        import scipy.sparse.linalg as sla

        return getattr(sla, k)

    @staticmethod
    def cg(A, b, tol=None, **kw):
        import scipy.sparse.linalg as sla

        if tol is not None:
            kw.setdefault("rtol", tol)
        return sla.cg(A, b, **kw)


class TestDiffusionCrossStack:
    def test_offline_online_rank_agreement(self, tmp_path, monkeypatch):
        df = rp.load_reference_diffusion()
        monkeypatch.setattr(df, "linalg", _SparseLinalgCompat())
        from image_search_engine_for_historical_research_tpu.rerank import (
            diffusion_rerank,
        )

        gal, q, gnd, _ = make_scene(seed=10, n_clusters=12, views=50, D=32)
        q = q[:12]
        n_trunc, kd, k_query = 300, 50, 3

        diffusion = df.Diffusion(gal, str(tmp_path))
        buf = io.StringIO()
        with redirect_stdout(buf):
            offline = diffusion.get_offline_results(n_trunc, kd)
            sims, idx = diffusion.knn.search(q, k_query)
        sims = sims ** 3  # Reranking.py:242 cubes without clipping
        ref_ranks = np.empty((len(q), n_trunc), np.int64)
        for i in range(len(q)):
            scores = sims[i] @ offline[idx[i]]
            parts = np.argpartition(-scores, n_trunc - 1)[:n_trunc]
            order = np.argsort(-scores[parts])
            ref_ranks[i] = parts[order]

        our_ranks, _ = diffusion_rerank(
            gal, q, n_trunc=n_trunc, kd=kd, k_query=k_query, truncation=n_trunc
        )
        our_ranks = np.asarray(our_ranks)

        # approximate path: CG implementations differ numerically; demand
        # top-10 overlap and matching mAP at the protocol level
        overlap = np.mean(
            [
                len(set(ref_ranks[i][:10]) & set(our_ranks[i][:10])) / 10
                for i in range(len(q))
            ]
        )
        assert overlap >= 0.9, overlap

        gnd_q = gnd[:12]
        ref_map = compute_map_revisited(ref_ranks, gnd_q).mapM
        our_map = compute_map_revisited(our_ranks, gnd_q).mapM
        assert our_map == pytest.approx(ref_map, abs=0.01), (ref_map, our_map)

    def test_qge_full_driver_e2e(self, tmp_path, monkeypatch):
        """The reference's QGE driver itself (small-DB branch: k=10 x3
        enhancement + truncated random walk) vs our full pipeline, judged by
        the metric both stacks print/compute: revisited mAP."""
        rr = rp.load_reference_reranking()
        df = rp.load_reference_diffusion()
        monkeypatch.setattr(df, "linalg", _SparseLinalgCompat())
        monkeypatch.setattr(rr, "np", _NumpyCompat())
        from image_search_engine_for_historical_research_tpu.rerank import (
            diffusion_rerank,
            feature_enhancement,
        )

        # small-DB branch hard-codes truncation 2000: needs N > 2000
        gal, q, gnd, _ = make_scene(seed=12, n_clusters=42, views=50, D=32)
        q = q[:15]
        gnd_q = gnd[:15]
        N = gal.shape[0]

        gnd_path = tmp_path / "gnd_roxford5k.pkl"
        with open(gnd_path, "wb") as f:
            pickle.dump({"gnd": gnd_q}, f)

        _, base_idx = build_flat(gal).search(q, N)
        base_idx = np.asarray(base_idx)

        buf = io.StringIO()
        with redirect_stdout(buf):
            rr.QGE(
                base_idx.T, q.T, gal.T, "roxford5k", gnd_q,
                str(tmp_path), str(gnd_path), AQE=True,
            )
        out = buf.getvalue()
        walk = out.split("Random Walk)")[1]
        line = [l for l in walk.splitlines() if "mAP E" in l][0]
        e, m, h = map(float, re.findall(r"[\d.]+", line.split("mAP")[1]))

        q_enh, _ = feature_enhancement(q, gal, base_idx, k=10, iterations=3)
        our_ranks, _ = diffusion_rerank(
            gal, np.asarray(q_enh), n_trunc=2000, kd=200, k_query=3,
            truncation=2000,
        )
        ours = compute_map_revisited(np.asarray(our_ranks), gnd_q)
        assert ours.mapM * 100 == pytest.approx(m, abs=0.5), (m, ours.mapM)
        assert ours.mapE * 100 == pytest.approx(e, abs=0.5), (e, ours.mapE)
        assert ours.mapH * 100 == pytest.approx(h, abs=1.0), (h, ours.mapH)
