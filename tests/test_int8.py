"""Int8-quantized exact search (ops/int8.py, index/flat.py:Int8FlatIndex).

The design claim under test: the int8 scan + bf16 re-rank matches the recall
of the shipped bf16 full scan (both are limited by bf16 input rounding on
near-duplicate data, not by the int8 shortlist), at half the scan bytes.
"""

import numpy as np
import jax.numpy as jnp

from image_search_engine_for_historical_research_tpu.index import (
    Int8FlatIndex,
    build_flat_i8,
    load_index,
    save_index,
)
from image_search_engine_for_historical_research_tpu.ops import (
    exact_topk,
    int8_topk,
    int8_topk_rerank,
    quantize_rows_int8,
)


def clustered(N=2000, D=64, k=25, seed=0, spread=0.3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, D)).astype(np.float32)
    x = centers[rng.integers(0, k, N)] + spread * rng.standard_normal(
        (N, D)
    ).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def recall(a, b):
    k = a.shape[1]
    return np.mean(
        [len(set(np.asarray(a)[q]) & set(np.asarray(b)[q])) / k
         for q in range(a.shape[0])]
    )


class TestQuantize:
    def test_roundtrip_error_bounded(self):
        x = clustered(500)
        codes, scales = quantize_rows_int8(jnp.asarray(x))
        recon = np.asarray(codes, np.float32) * np.asarray(scales)[:, None]
        # symmetric quantization: |err| <= scale/2 = amax/254 per element
        amax = np.abs(x).max(axis=1, keepdims=True)
        assert np.all(np.abs(recon - x) <= amax / 254 + 1e-7)

    def test_zero_row_is_safe(self):
        x = np.zeros((3, 16), np.float32)
        x[0, 0] = 1.0
        codes, scales = quantize_rows_int8(jnp.asarray(x))
        assert np.all(np.isfinite(np.asarray(scales)))
        assert np.all(np.asarray(codes)[1:] == 0)

    def test_extremes_hit_127(self):
        x = np.array([[1.0, -1.0, 0.5]], np.float32)
        codes, scales = quantize_rows_int8(jnp.asarray(x))
        assert np.asarray(codes)[0, 0] == 127
        assert np.asarray(codes)[0, 1] == -127


class TestInt8TopK:
    def test_scores_close_to_exact(self):
        x = clustered(1200)
        q = clustered(9, seed=3)
        s_ex, _ = exact_topk(jnp.asarray(q), jnp.asarray(x), 10)
        codes, scales = quantize_rows_int8(jnp.asarray(x))
        s8, _ = int8_topk(jnp.asarray(q), codes, scales, 10)
        assert np.max(np.abs(np.asarray(s8) - np.asarray(s_ex))) < 0.01

    def test_rerank_matches_bf16_scan_recall(self):
        x = clustered(3000, D=128)
        q = clustered(23, D=128, seed=7)
        _, i_ex = exact_topk(jnp.asarray(q), jnp.asarray(x), 10)
        _, i_bf = exact_topk(
            jnp.asarray(q), jnp.asarray(x), 10, matmul_dtype=jnp.bfloat16
        )
        codes, scales = quantize_rows_int8(jnp.asarray(x))
        _, i_rr = int8_topk_rerank(
            jnp.asarray(q), codes, scales,
            jnp.asarray(x, jnp.float32).astype(jnp.bfloat16), 10,
            shortlist=64, approximate=False,
        )
        assert recall(i_rr, i_ex) >= recall(i_bf, i_ex) - 0.02

    def test_query_block_path_matches_single(self):
        x = clustered(400, D=32)
        q = clustered(5, D=32, seed=1)
        codes, scales = quantize_rows_int8(jnp.asarray(x))
        _, i_small = int8_topk(jnp.asarray(q), codes, scales, 5)
        # force the QBLOCK host loop
        import image_search_engine_for_historical_research_tpu.ops.int8 as m
        old_block = m.QBLOCK
        try:
            m.QBLOCK = 4
            qb = np.tile(q, (3, 1))  # Q=15 > QBLOCK=4
            _, i_big = m.int8_topk(jnp.asarray(qb), codes, scales, 5)
        finally:
            m.QBLOCK = old_block
        assert np.array_equal(np.asarray(i_big)[:5], np.asarray(i_small))

    def test_n_chunked_scan_matches_oneshot(self):
        # shrink the score budget so the N-chunked merge path runs
        import image_search_engine_for_historical_research_tpu.ops.int8 as m
        x = clustered(700, D=32)
        q = clustered(6, D=32, seed=2)
        codes, scales = quantize_rows_int8(jnp.asarray(x))
        _, i_one = int8_topk(jnp.asarray(q), codes, scales, 7)
        old = m.ONESHOT_SCORE_BYTES
        try:
            m.ONESHOT_SCORE_BYTES = 4096  # forces chunk=512 < N=700
            m._int8_scan.clear_cache()
            _, i_chunked = m.int8_topk(jnp.asarray(q), codes, scales, 7)
        finally:
            m.ONESHOT_SCORE_BYTES = old
            m._int8_scan.clear_cache()
        assert np.array_equal(np.asarray(i_chunked), np.asarray(i_one))

    def test_rerank_qblock_matches_single(self):
        import image_search_engine_for_historical_research_tpu.ops.int8 as m
        x = clustered(300, D=32)
        q = clustered(6, D=32, seed=4)
        codes, scales = quantize_rows_int8(jnp.asarray(x))
        rr = jnp.asarray(x).astype(jnp.bfloat16)
        _, i_one = int8_topk_rerank(
            jnp.asarray(q), codes, scales, rr, 5, shortlist=32,
            approximate=False,
        )
        old_block = m.QBLOCK
        try:
            m.QBLOCK = 4
            _, i_blk = m.int8_topk_rerank(
                jnp.asarray(q), codes, scales, rr, 5, shortlist=32,
                approximate=False,
            )
        finally:
            m.QBLOCK = old_block
        assert np.array_equal(np.asarray(i_blk), np.asarray(i_one))

    def test_host_numpy_quantize_matches_device(self):
        x = clustered(500, D=32)
        c_host, s_host = quantize_rows_int8(x, chunk=128)  # numpy in
        c_dev, s_dev = quantize_rows_int8(jnp.asarray(x))
        assert np.array_equal(np.asarray(c_host), np.asarray(c_dev))
        assert np.allclose(np.asarray(s_host), np.asarray(s_dev))


class TestInt8FlatIndex:
    def test_search_and_artifact_roundtrip(self, tmp_path):
        x = clustered(1000)
        q = clustered(7, seed=5)
        ix = build_flat_i8(x, rerank="bfloat16", shortlist=64)
        s, i = ix.search(q, 10)
        assert s.shape == (7, 10) and i.shape == (7, 10)
        assert np.all(np.diff(np.asarray(s), axis=1) <= 1e-6)
        save_index(ix, str(tmp_path / "i8"))
        lx = load_index(str(tmp_path / "i8"))
        assert isinstance(lx, Int8FlatIndex)
        s2, i2 = lx.search(q, 10)
        assert np.array_equal(np.asarray(i), np.asarray(i2))

    def test_rerank_none_roundtrip_and_memory(self, tmp_path):
        x = clustered(800)
        ix = build_flat_i8(x, rerank="none")
        assert ix.rerank_vectors is None
        save_index(ix, str(tmp_path / "i8n"))
        lx = load_index(str(tmp_path / "i8n"))
        assert lx.rerank_vectors is None
        q = clustered(4, seed=2)
        _, i1 = ix.search(q, 8)
        _, i2 = lx.search(q, 8)
        assert np.array_equal(np.asarray(i1), np.asarray(i2))

    def test_matches_exact_on_separated_data(self):
        # well-separated clusters: int8 ranking agrees with exact f32
        x = clustered(1500, D=256, k=12, spread=0.6)
        q = clustered(11, D=256, k=12, seed=9, spread=0.6)
        _, i_ex = exact_topk(
            jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True)),
            jnp.asarray(x), 5,
        )
        ix = build_flat_i8(x, rerank="bfloat16", shortlist=64)
        _, i8 = ix.search(q, 5)
        assert recall(i8, i_ex) >= 0.95
