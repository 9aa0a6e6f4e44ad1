import numpy as np
import jax
import jax.numpy as jnp
import pytest

from image_search_engine_for_historical_research_tpu.index import (
    FlatIndex,
    IVFPQIndex,
    PQIndex,
    build_flat,
    build_ivfpq,
    build_pq,
    load_index,
    save_index,
)
from image_search_engine_for_historical_research_tpu.ops.kmeans import kmeans_fit
from image_search_engine_for_historical_research_tpu.ops import pq as pq_ops


def clustered(N=2000, D=32, k=20, seed=0, spread=0.15):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, D)).astype(np.float32)
    x = centers[rng.integers(0, k, N)] + spread * rng.standard_normal((N, D)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


class TestKMeans:
    def test_recovers_separated_clusters(self):
        rng = np.random.default_rng(0)
        centers = 10 * rng.standard_normal((8, 4)).astype(np.float32)
        x = centers[rng.integers(0, 8, 1000)] + 0.05 * rng.standard_normal((1000, 4)).astype(np.float32)
        c, assign = kmeans_fit(jnp.asarray(x), 8, iters=25)
        # every point within 0.5 of its centroid (clusters are 10 apart)
        d = np.linalg.norm(x - np.asarray(c)[np.asarray(assign)], axis=1)
        assert d.max() < 0.5

    def test_objective_decreases(self):
        x = jnp.asarray(clustered(500, 16, 10))
        def obj(iters):
            c, a = kmeans_fit(x, 16, iters=iters)
            return float(jnp.sum((x - c[a]) ** 2))
        assert obj(20) <= obj(1) + 1e-5


class TestPQ:
    def test_roundtrip_reconstruction_close(self):
        x = clustered(1500, 32)
        cb = pq_ops.pq_train(jnp.asarray(x), M=8, Ks=64)
        codes = pq_ops.pq_encode(cb, jnp.asarray(x))
        recon = np.asarray(pq_ops.pq_decode(cb, codes))
        err = np.linalg.norm(recon - x, axis=1).mean()
        assert err < 0.35  # clustered data quantizes well

    def test_dist_table_matches_naive(self):
        x = clustered(300, 16)
        q = clustered(4, 16, seed=1)
        cb = pq_ops.pq_train(jnp.asarray(x), M=4, Ks=32)
        dt = np.asarray(pq_ops.pq_dist_table(cb, jnp.asarray(q)))
        cw = np.asarray(cb.codewords)  # (4, 32, 4)
        for qi in range(4):
            for m in range(4):
                sub = q[qi].reshape(4, 4)[m]
                naive = np.sum((cw[m] - sub[None, :]) ** 2, axis=1)
                np.testing.assert_allclose(dt[qi, m], naive, rtol=1e-3, atol=1e-4)

    def test_pq_search_matches_adc_oracle(self):
        x = clustered(800, 32)
        q = clustered(5, 32, seed=2)
        idxobj = build_pq(x, M=8, Ks=32)
        scores, idx = idxobj.search(q, k=10, chunk=256)
        # oracle: full ADC with numpy
        dt = np.asarray(pq_ops.pq_dist_table(idxobj.codebook, jnp.asarray(q)))
        codes = np.asarray(idxobj.codes).astype(int)
        d = np.zeros((5, 800))
        for m in range(8):
            d += dt[:, m, codes[:, m]]
        # duplicate codes create exact ties; compare distances-at-rank and that
        # each returned index has exactly the distance claimed by its score
        np.testing.assert_allclose(
            np.asarray(scores), -np.sort(d, axis=1)[:, :10], rtol=1e-4, atol=1e-4
        )
        got_idx = np.asarray(idx)
        got_d = np.take_along_axis(d, got_idx, axis=1)
        np.testing.assert_allclose(np.asarray(scores), -got_d, rtol=1e-4, atol=1e-4)

    def test_flat_bf16_artifact_native_width(self, tmp_path):
        """bf16 storage persists as a uint16 bit-cast (half the bytes of the
        old f32 upcast) and loads back to identical search results."""
        x = clustered(500, 32)
        ix = build_flat(x, storage_dtype="bfloat16")
        save_index(ix, str(tmp_path / "bf"))
        arrays = dict(np.load(tmp_path / "bf" / "arrays.npz"))
        assert "vectors_bf16" in arrays and arrays["vectors_bf16"].dtype == np.uint16
        lx = load_index(str(tmp_path / "bf"))
        q = x[:4]
        _, i1 = ix.search(q, 7)
        _, i2 = lx.search(q, 7)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_pq_recall_on_clustered_data(self):
        x = clustered(2000, 64, k=50)
        q = x[:20] + 0.01 * np.random.default_rng(3).standard_normal((20, 64)).astype(np.float32)
        flat = build_flat(x)
        _, exact = flat.search(q, 10)
        pqi = build_pq(x, M=8, Ks=128)
        _, approx = pqi.search(q, 50)
        exact, approx = np.asarray(exact), np.asarray(approx)
        # exact top-1 must be inside the ADC top-10 for nearly every query, and
        # the exact top-10 inside the ADC top-50 shortlist (the re-rank contract)
        top1_in_10 = np.mean([exact[i, 0] in approx[i, :10] for i in range(20)])
        top10_in_50 = np.mean([
            len(set(exact[i]) & set(approx[i])) / 10 for i in range(20)
        ])
        assert top1_in_10 >= 0.95, top1_in_10
        assert top10_in_50 > 0.8, top10_in_50

    def test_streaming_build_bit_identical_to_in_memory(self):
        # callable chunk source + n= (beyond-RAM build): same explicit
        # train_sample -> bit-identical codewords and codes, incl. OPQ
        x = clustered(900, 32, k=11, seed=5)
        for kw in (dict(M=4, Ks=32, train_sample=256),
                   dict(M=4, Ks=32, train_sample=256, opq=True, opq_iters=2)):
            mem = build_pq(x, **kw)
            st = build_pq(
                lambda: (x[s : s + 300] for s in range(0, 900, 300)),
                n=900, **kw,
            )
            np.testing.assert_array_equal(
                np.asarray(mem.codewords), np.asarray(st.codewords)
            )
            np.testing.assert_array_equal(
                np.asarray(mem.codes), np.asarray(st.codes)
            )
            _, im = mem.search(x[:7], 10)
            _, ist = st.search(x[:7], 10)
            np.testing.assert_array_equal(np.asarray(im), np.asarray(ist))
        with pytest.raises(ValueError, match="n="):
            build_pq(lambda: iter([x]), M=4, Ks=32)

    def test_refine_route_pqr(self, tmp_path):
        """PQ-R (faiss IndexPQR, round 5): refine_M adds residual codes; the
        codes-only adc+refine re-rank beats plain ADC ordering, auto routes
        to it, it persists, and the streaming build is bit-identical."""
        x = clustered(2000, 64, k=50)
        rng = np.random.default_rng(3)
        q = x[:20] + 0.01 * rng.standard_normal((20, 64)).astype(np.float32)
        flat = build_flat(x)
        _, exact = flat.search(q, 10)
        exact = np.asarray(exact)

        ix = build_pq(x, M=8, Ks=64, refine_M=16)
        assert ix.refine_codes is not None
        assert ix.refine_codes.shape == (2000, 16)

        def recall(idx):
            idx = np.asarray(idx)
            return np.mean([
                len(set(exact[i]) & set(idx[i, :10])) / 10 for i in range(20)
            ])

        _, i_adc = ix.search(q, 10, method="adc")
        _, i_ref = ix.search(q, 10, method="adc+refine", expand=8)
        assert recall(i_ref) >= recall(i_adc) + 0.2  # 0.385 -> 0.885 here
        assert recall(i_ref) >= 0.85, recall(i_ref)
        # auto prefers refine when codes exist
        np.testing.assert_array_equal(
            np.asarray(ix.search(q, 10)[1]),
            np.asarray(ix.search(q, 10, method="adc+refine")[1]),
        )
        # persists (refine arrays in arrays.npz) and reloads rank-identically
        save_index(ix, str(tmp_path / "pqr"))
        lx = load_index(str(tmp_path / "pqr"))
        assert lx.refine_codes is not None
        np.testing.assert_array_equal(
            np.asarray(ix.search(q, 10)[1]), np.asarray(lx.search(q, 10)[1])
        )
        # streaming build bit-parity (same explicit train_sample)
        kw = dict(M=8, Ks=64, refine_M=8, train_sample=512)
        mem = build_pq(x, **kw)
        st = build_pq(
            lambda: (x[s : s + 500] for s in range(0, 2000, 500)),
            n=2000, **kw,
        )
        for f in ("codewords", "codes", "refine_codewords", "refine_codes"):
            np.testing.assert_array_equal(
                np.asarray(getattr(mem, f)), np.asarray(getattr(st, f)), f
            )
        # error cases
        ix0 = build_pq(x, M=8, Ks=64)
        with pytest.raises(ValueError, match="refine"):
            ix0.search(q, 10, method="adc+refine")
        with pytest.raises(ValueError, match="exclusive"):
            build_pq(x, M=8, Ks=16, pack4=True, refine_M=8)


class TestPQLargeKs:
    """The reference driver's operating point is Ks=2^13 (offline.py:109,116);
    these cover the >256-codeword regime: uint16 codes, the gather ADC path,
    subsampled bf16 training, and the k-adaptive k-means chunking."""

    def test_encode_dtype_by_ks(self):
        x = clustered(600, 16)
        cb_small = pq_ops.pq_train(jnp.asarray(x), M=4, Ks=16, iters=3)
        assert pq_ops.pq_encode(cb_small, jnp.asarray(x)).dtype == jnp.uint8
        cb_big = pq_ops.pq_train(jnp.asarray(x), M=4, Ks=512, iters=3)
        assert pq_ops.pq_encode(cb_big, jnp.asarray(x)).dtype == jnp.uint16

    def test_gather_matches_onehot(self):
        x = clustered(900, 32, k=40)
        q = clustered(6, 32, seed=5)
        cb = pq_ops.pq_train(jnp.asarray(x), M=8, Ks=512, iters=4)
        codes = pq_ops.pq_encode(cb, jnp.asarray(x))
        s1, i1 = pq_ops.pq_search(cb, codes, jnp.asarray(q), 10, chunk=256,
                                  method="onehot")
        s2, i2 = pq_ops.pq_search(cb, codes, jnp.asarray(q), 10, chunk=256,
                                  method="gather")
        s3, i3 = pq_ops.pq_search(cb, codes, jnp.asarray(q), 10, chunk=256,
                                  method="auto")  # auto -> onehot at Ks=512
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i3))

    def test_subsampled_bf16_training_still_quantizes(self):
        x = clustered(2000, 32, k=50)
        cb = pq_ops.pq_train(
            jnp.asarray(x), M=8, Ks=64, iters=5,
            train_sample=800, matmul_dtype=jnp.bfloat16,
        )
        codes = pq_ops.pq_encode(cb, jnp.asarray(x), matmul_dtype=jnp.bfloat16)
        recon = np.asarray(pq_ops.pq_decode(cb, codes))
        err = np.linalg.norm(recon - x, axis=1).mean()
        assert err < 0.5, err

    def test_kmeans_chunk_shrinks_with_k(self):
        # force the ASSIGN_BUDGET clamp: chunk would be > budget // k otherwise
        from image_search_engine_for_historical_research_tpu.ops import kmeans as km
        x = jnp.asarray(clustered(700, 8, k=12))
        c, a = kmeans_fit(x, 12, iters=8, chunk=km.ASSIGN_BUDGET)
        d = np.linalg.norm(np.asarray(x) - np.asarray(c)[np.asarray(a)], axis=1)
        assert d.mean() < 0.6

    def test_matcher_clamps_ks_to_fixture(self, tmp_path):
        from image_search_engine_for_historical_research_tpu.index.matchers import (
            _clamp_ks, matching_Nano_PQ,
        )
        assert _clamp_ks(2 ** 13, 1_000_000) == 2 ** 13
        assert _clamp_ks(2 ** 13, 300) == 256
        x = clustered(200, 32, k=10)
        idx, _ = matching_Nano_PQ(
            5, x, x[:3], dataset="fixture", outputs=str(tmp_path), warmup=False
        )
        assert idx.shape == (3, 5)


class TestIVFPQ:
    def test_full_probe_matches_pq_quality(self):
        x = clustered(1200, 32, k=30)
        q = x[:10] + 0.01 * np.random.default_rng(4).standard_normal((10, 32)).astype(np.float32)
        ivf = build_ivfpq(x, nlist=16, M=8, Ks=64, nprobe=16)
        flat = build_flat(x)
        _, exact = flat.search(q, 5)
        _, approx = ivf.search(q, 50)
        exact, approx = np.asarray(exact), np.asarray(approx)
        # quantized ranking can reorder near-ties; require the exact top-1 in
        # the shortlist top-10 and exact top-5 inside the top-50 shortlist
        top1_in_10 = np.mean([exact[i, 0] in approx[i, :10] for i in range(10)])
        top5_in_50 = np.mean([
            len(set(exact[i]) & set(approx[i])) / 5 for i in range(10)
        ])
        assert top1_in_10 >= 0.9, top1_in_10
        assert top5_in_50 > 0.8, top5_in_50

    def test_partial_probe_still_finds_near_neighbors(self):
        x = clustered(1200, 32, k=30)
        q = x[:10]
        ivf = build_ivfpq(x, nlist=16, M=8, Ks=64, nprobe=4)
        scores, idx = ivf.search(q, 5)
        # the query point itself lives in the probed (nearest) list
        assert np.mean(np.asarray(idx)[:, 0] == np.arange(10)) > 0.8

    def test_no_padding_ids_leak(self):
        x = clustered(333, 16, k=7)
        ivf = build_ivfpq(x, nlist=8, M=4, Ks=16, nprobe=8)
        _, idx = ivf.search(x[:5], 20)
        assert np.asarray(idx).min() >= 0
        assert np.asarray(idx).max() < 333

    def test_refine_rerank_beats_adc_and_roundtrips(self, tmp_path):
        # coarse first-level codes (M=4, Ks=16 on 64-d) so the refine level
        # has real reconstruction error to recover (IVFADC+R semantics)
        x = clustered(1500, 64, k=25, seed=3)
        rng = np.random.default_rng(7)
        q = x[:16] + 0.01 * rng.standard_normal((16, 64)).astype(np.float32)
        _, exact = build_flat(x).search(q, 10)
        exact = np.asarray(exact)
        kw = dict(nlist=16, M=8, Ks=64, nprobe=16)

        def recall(ivf, **skw):
            _, idx = ivf.search(q, 10, **skw)
            idx = np.asarray(idx)
            return np.mean([
                len(set(exact[i]) & set(idx[i])) / 10 for i in range(len(q))
            ])

        ref = build_ivfpq(x, refine_M=8, **kw)
        r_adc = recall(ref, method="adc")
        r_ref = recall(ref, method="adc+refine", expand=8)
        # the refine level recovers ordering the first-level ADC loses
        # (within-cluster neighbors at 64-d sit inside first-level
        # quantization error on this fixture: 0.39 adc -> 0.66 refined)
        assert r_ref >= r_adc + 0.15, (r_ref, r_adc)
        assert r_ref >= 0.55, r_ref

        # auto picks the refine route when refine codes exist
        _, i_auto = ref.search(q, 10)
        _, i_r = ref.search(q, 10, method="adc+refine")
        np.testing.assert_array_equal(np.asarray(i_auto), np.asarray(i_r))

        # artifact roundtrip preserves the refine arrays and exact results
        save_index(ref, str(tmp_path / "ivfpqr"))
        loaded = load_index(str(tmp_path / "ivfpqr"))
        _, i1 = loaded.search(q, 10)
        np.testing.assert_array_equal(np.asarray(i_auto), np.asarray(i1))

    def test_split_long_lists_recovers_window_truncated_entries(self):
        # one tight cluster -> one giant inverted list; a small forced seg
        # puts most entries beyond the scan window unless the list is split
        # into seg-sized virtual lists sharing the center
        rng = np.random.default_rng(0)
        base = rng.standard_normal((1, 16)).astype(np.float32)
        x = base + 0.05 * rng.standard_normal((600, 16)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        q = x[550:556]  # live near the END of the giant list
        kw = dict(nlist=2, M=4, Ks=64, nprobe=8, seg=128)
        ivf_ns = build_ivfpq(x, split_long=False, **kw)
        ivf_sp = build_ivfpq(x, split_long=True, **kw)
        _, i_ns = ivf_ns.search(q, 10)
        _, i_sp = ivf_sp.search(q, 10)
        qid = np.arange(550, 556)
        hit_ns = np.mean([qid[i] in np.asarray(i_ns)[i] for i in range(6)])
        hit_sp = np.mean([qid[i] in np.asarray(i_sp)[i] for i in range(6)])
        assert hit_sp == 1.0, hit_sp
        assert hit_ns < hit_sp, (hit_ns, hit_sp)
        # split index exposes > nlist virtual lists, same total entries
        assert ivf_sp.coarse_centers.shape[0] > 2
        assert ivf_sp.n == 600

    def test_streaming_build_bit_identical_to_in_memory(self):
        # vecs as a callable chunk source (beyond-HBM build): the sampled
        # training rows are restored to choice order, so the fits — and the
        # whole packed index — match the in-memory path exactly
        x = clustered(900, 32, k=11, seed=5)
        kw = dict(nlist=8, M=4, Ks=32, nprobe=8, refine_M=4)
        mem = build_ivfpq(x, **kw)
        stream = build_ivfpq(
            lambda: (x[s : s + 300] for s in range(0, 900, 300)),
            n=900, **kw,
        )
        for f in ("coarse_centers", "codewords", "flat_codes", "flat_ids",
                  "offsets", "lens", "flat_refine", "flat_list"):
            np.testing.assert_array_equal(
                np.asarray(getattr(mem, f)), np.asarray(getattr(stream, f)), f
            )
        q = x[:7]
        _, i_m = mem.search(q, 10)
        _, i_s = stream.search(q, 10)
        np.testing.assert_array_equal(np.asarray(i_m), np.asarray(i_s))

        # device-resident chunks (on-device gather + scatter order restore)
        # are exact too
        import jax.numpy as jnp

        dev = build_ivfpq(
            lambda: (jnp.asarray(x[s : s + 300]) for s in range(0, 900, 300)),
            n=900, **kw,
        )
        np.testing.assert_array_equal(
            np.asarray(mem.flat_codes), np.asarray(dev.flat_codes)
        )
        np.testing.assert_array_equal(
            np.asarray(mem.flat_refine), np.asarray(dev.flat_refine)
        )

    def test_streaming_build_device_chunks(self):
        # device-resident chunks take the on-device gather branch (only the
        # sampled rows cross to host) and uneven chunk sizes still pack n rows
        import jax.numpy as jnp

        x = clustered(700, 16, k=7, seed=9)
        chunks = [jnp.asarray(x[:256]), jnp.asarray(x[256:512]),
                  jnp.asarray(x[512:])]
        ivf = build_ivfpq(lambda: iter(chunks), n=700, nlist=8, M=4, Ks=16,
                          nprobe=8)
        assert ivf.n == 700
        _, idx = ivf.search(x[:10], 5)
        assert np.mean(np.asarray(idx)[:, 0] == np.arange(10)) > 0.8
        with pytest.raises(ValueError, match="n="):
            build_ivfpq(lambda: iter(chunks), nlist=8, M=4, Ks=16)
        with pytest.raises(ValueError, match="yielded"):
            build_ivfpq(lambda: iter(chunks), n=9999, nlist=8, M=4, Ks=16)

    def test_refine_requires_refine_codes(self):
        x = clustered(300, 16, k=7)
        plain = build_ivfpq(x, nlist=8, M=4, Ks=16, nprobe=8)
        with pytest.raises(ValueError, match="refine"):
            plain.search(x[:2], 5, method="adc+refine")
        # plain auto == adc (unchanged behavior)
        s0, i0 = plain.search(x[:2], 5)
        s1, i1 = plain.search(x[:2], 5, method="adc")
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


class TestArtifacts:
    @pytest.mark.parametrize("builder,kwargs", [
        (build_flat, {}),
        (build_pq, {"M": 4, "Ks": 16}),
        (build_ivfpq, {"nlist": 8, "M": 4, "Ks": 16, "nprobe": 4}),
    ])
    def test_save_load_same_results(self, tmp_path, builder, kwargs):
        x = clustered(400, 16)
        q = x[:3]
        idxobj = builder(x, **kwargs)
        s0, i0 = idxobj.search(q, 5)
        save_index(idxobj, str(tmp_path / "idx"))
        loaded = load_index(str(tmp_path / "idx"))
        s1, i1 = loaded.search(q, 5)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5)

    def test_unknown_kind_rejected(self, tmp_path):
        import json, os
        d = tmp_path / "bad"
        os.makedirs(d)
        (d / "manifest.json").write_text(json.dumps({"format_version": 1, "kind": "nope", "meta": {}}))
        np.savez(d / "arrays.npz", x=np.zeros(1))
        with pytest.raises(ValueError, match="unknown index kind"):
            load_index(str(d))


def test_pq_search_packed4_equals_unpacked():
    """4-bit packed codes (pq_pack4) give identical ADC results at Ks<=16."""
    import jax.numpy as jnp

    from image_search_engine_for_historical_research_tpu.ops.pq import (
        PQCodebook, pq_pack4, pq_search, pq_unpack4,
    )

    rng = np.random.default_rng(0)
    M, Ks, ds, n = 8, 16, 8, 500
    cw = jnp.asarray(rng.standard_normal((M, Ks, ds)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, Ks, (n, M)).astype(np.uint8))
    q = jnp.asarray(rng.standard_normal((5, M * ds)).astype(np.float32))
    cb = PQCodebook(codewords=cw)

    packed = pq_pack4(codes)
    assert packed.shape == (n, M // 2)
    np.testing.assert_array_equal(np.asarray(pq_unpack4(packed)),
                                  np.asarray(codes))

    s1, i1 = pq_search(cb, codes, q, 10)
    s2, i2 = pq_search(cb, packed, q, 10, packed4=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)

    with pytest.raises(ValueError, match="Ks <= 16"):
        big = PQCodebook(codewords=jnp.zeros((2, 32, 4)))
        pq_search(big, jnp.zeros((4, 1), jnp.uint8), jnp.zeros((1, 8)), 2,
                  packed4=True)


def test_build_pq_pack4_roundtrip(tmp_path):
    """build_pq(pack4=True): Quick-ADC geometry index, half-size codes,
    identical results to the unpacked index, save/load preserved."""
    from image_search_engine_for_historical_research_tpu.index import (
        load_index, save_index,
    )
    from image_search_engine_for_historical_research_tpu.index.pq import build_pq

    rng = np.random.default_rng(0)
    db = rng.standard_normal((400, 64)).astype(np.float32)
    q = db[:5] + 0.01 * rng.standard_normal((5, 64)).astype(np.float32)
    ix_u = build_pq(db, M=16, Ks=16, iters=5)
    ix_p = build_pq(db, M=16, Ks=16, iters=5, pack4=True)
    assert ix_p.codes.shape == (400, 8)
    s1, i1 = ix_u.search(q, 10)
    s2, i2 = ix_p.search(q, 10)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    save_index(ix_p, str(tmp_path / "pq4"))
    loaded = load_index(str(tmp_path / "pq4"))
    s3, i3 = loaded.search(q, 10)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i3))

    with pytest.raises(ValueError, match="pack4"):
        build_pq(db, M=16, Ks=32, iters=2, pack4=True)


class TestOPQ:
    """OPQ (learned orthogonal pre-rotation, Ge et al. CVPR'13) — beyond the
    reference's plain-PQ nanopq. The rotation must be orthogonal, transparent
    to every consumer (encode/decode/search/persist), and beat plain PQ on
    anisotropic (correlated-dimension) data where subspace balance matters."""

    def _aniso(self, seed=0, n=4000, d=64):
        rng = np.random.RandomState(seed)
        A = rng.randn(d, d) * (np.linspace(2, 0.1, d)[None, :])
        x = (rng.randn(n, d) @ A).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        q = x[:50] + 0.01 * rng.randn(50, d).astype(np.float32)
        return x, q

    def test_opq_beats_plain_pq_on_anisotropic(self):
        from image_search_engine_for_historical_research_tpu.index import (
            build_flat,
            build_pq,
        )

        x, q = self._aniso()
        _, exact = build_flat(x).search(q, 10)
        exact = np.asarray(exact)

        def recall(ix):
            _, idx = ix.search(q, 10)
            idx = np.asarray(idx)
            return np.mean(
                [len(set(exact[i]) & set(idx[i])) / 10 for i in range(len(q))]
            )

        r_pq = recall(build_pq(x, M=8, Ks=32))
        opq = build_pq(x, M=8, Ks=32, opq=True, opq_iters=6)
        r_opq = recall(opq)
        assert r_opq >= r_pq + 0.03, (r_pq, r_opq)

        R = np.asarray(opq.rotation)
        np.testing.assert_allclose(R @ R.T, np.eye(R.shape[0]), atol=1e-5)

    def test_opq_roundtrip_and_decode_space(self, tmp_path):
        from image_search_engine_for_historical_research_tpu.index import build_pq
        from image_search_engine_for_historical_research_tpu.index.base import (
            load_index,
            save_index,
        )
        from image_search_engine_for_historical_research_tpu.ops.pq import (
            pq_decode,
            pq_encode,
        )

        x, q = self._aniso(seed=3, n=1200)
        opq = build_pq(x, M=8, Ks=32, opq=True, opq_iters=4)
        # decode returns ORIGINAL-space vectors: reconstruction error must be
        # small relative to the data norm (rows are unit)
        codes = pq_encode(opq.codebook, jnp.asarray(x))
        recon = np.asarray(pq_decode(opq.codebook, codes))
        err = np.linalg.norm(recon - x, axis=1).mean()
        assert err < 0.8, err

        d = str(tmp_path / "opq")
        save_index(opq, d)
        loaded = load_index(d)
        s1, i1 = opq.search(q, 10)
        s2, i2 = loaded.search(q, 10)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_opq_ivfpq_beats_plain_and_roundtrips(self, tmp_path):
        """OPQ residual rotation for IVF-PQ (faiss OPQMatrix arrangement):
        recall on anisotropic data must not regress (the rotation balances
        per-subspace residual variance) and the rotated index must persist."""
        from image_search_engine_for_historical_research_tpu.index import (
            build_flat,
            build_ivfpq,
        )
        from image_search_engine_for_historical_research_tpu.index.base import (
            load_index,
            save_index,
        )

        x, q = self._aniso(seed=5)
        _, exact = build_flat(x).search(q, 10)
        exact = np.asarray(exact)

        def recall(ix):
            _, idx = ix.search(q, 10)
            idx = np.asarray(idx)
            return np.mean(
                [len(set(exact[i]) & set(idx[i])) / 10 for i in range(len(q))]
            )

        kw = dict(nlist=16, M=8, Ks=32, nprobe=8)
        r_pq = recall(build_ivfpq(x, **kw))
        opq = build_ivfpq(x, opq=True, opq_iters=6, **kw)
        r_opq = recall(opq)
        assert r_opq >= r_pq + 0.02, (r_pq, r_opq)

        R = np.asarray(opq.rotation)
        np.testing.assert_allclose(R @ R.T, np.eye(R.shape[0]), atol=1e-5)

        d = str(tmp_path / "ivfpq_opq")
        save_index(opq, d)
        loaded = load_index(d)
        assert loaded.rotation is not None
        _, i1 = opq.search(q, 10)
        _, i2 = loaded.search(q, 10)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
