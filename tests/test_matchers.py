import numpy as np
import pytest

from image_search_engine_for_historical_research_tpu.index import matchers as M


def data(N=400, D=32, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((10, D)).astype(np.float32)
    db = centers[rng.integers(0, 10, N)] + 0.1 * rng.standard_normal((N, D)).astype(np.float32)
    q = db[:6] + 0.01 * rng.standard_normal((6, D)).astype(np.float32)
    return db, q


class TestMatcherContract:
    @pytest.mark.parametrize("name", ["L2", "fractional", "LSH"])
    def test_statless_matchers(self, name):
        db, q = data()
        idx, tpq = M.MATCHERS[name](10, db, q)
        assert idx.shape == (6, 10)
        assert idx.dtype == np.int64
        assert tpq >= 0
        if name != "LSH":  # near-duplicate queries must find their source
            assert (idx[:, 0] == np.arange(6)).mean() >= 0.8

    @pytest.mark.parametrize(
        "name,kw",
        [
            ("PQ", {"N_books": 4, "n_bits_perbook": 5}),
            ("ANNOY", {"n_trees": 8, "leaf_size": 64}),
            ("HNSW", {"m": 8, "ef": 64}),
            ("PQ_HNSW", {"N_books": 4, "N_words": 32, "m": 8, "ef": 32}),
            ("IVFPQ", {"nlist": 8, "M": 4, "nbits": 5, "nprobe": 8}),
            # OPQ variants: the learned rotation must persist through the
            # artifact (rotation array inside arrays.npz, same kind name)
            ("PQ", {"N_books": 4, "n_bits_perbook": 5, "opq": True}),
            ("PQ_HNSW",
             {"N_books": 4, "N_words": 32, "m": 8, "ef": 32, "opq": True}),
            ("IVFPQ",
             {"nlist": 8, "M": 4, "nbits": 5, "nprobe": 8, "opq": True}),
        ],
    )
    def test_artifact_matchers_generate_then_load(self, name, kw, tmp_path):
        db, q = data(seed=1)
        idx1, _ = M.MATCHERS[name](
            10, db, q, dataset="t", ifgenerate=True, outputs=str(tmp_path), **kw
        )
        # second call loads the persisted artifact: identical results
        idx2, _ = M.MATCHERS[name](
            10, db, q, dataset="t", ifgenerate=False, outputs=str(tmp_path), **kw
        )
        np.testing.assert_array_equal(idx1, idx2)
        assert idx1.shape == (6, 10)

    def test_l2_results_match_oracle(self):
        db, q = data(seed=2)
        dbn = db / np.linalg.norm(db, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        idx, _ = M.matching_L2(5, db, q)
        ref = np.argsort(-(qn @ dbn.T), axis=1)[:, :5]
        np.testing.assert_array_equal(idx, ref)

    def test_l2_int8_matches_l2(self):
        db, q = data(seed=4)
        idx_l2, _ = M.matching_L2(5, db, q)
        idx_i8, _ = M.matching_L2_int8(5, db, q, shortlist=64)
        # int8+bf16-rerank recall vs the exact matcher on clustered data
        # top-1 (the query's near-duplicate row) must agree exactly; deeper
        # ranks on 0.1-spread clusters sit below bf16 score resolution, so
        # only a loose overlap holds (see tests/test_int8.py for the
        # recall-parity-with-bf16-scan assertion)
        np.testing.assert_array_equal(idx_l2[:, 0], idx_i8[:, 0])
        overlap = np.mean(
            [len(set(idx_l2[i]) & set(idx_i8[i])) / 5 for i in range(len(q))]
        )
        assert overlap >= 0.8
        assert "L2_int8" in M.MATCHERS

    def test_greedyhash(self):
        rng = np.random.default_rng(3)
        codes = rng.integers(0, 2, (100, 64)).astype(np.int8)
        qcodes = codes[:4]
        idx, _ = M.matching_Greedyhash(5, codes, qcodes)
        assert (idx[:, 0] == np.arange(4)).all()

    def test_unknown_method_fails_loud(self):
        from image_search_engine_for_historical_research_tpu.cli.common import (
            dispatch_matcher,
        )

        with pytest.raises(SystemExit, match="unknown matching method"):
            dispatch_matcher("nope", 1, np.zeros((2, 4)), np.zeros((1, 4)))
