import numpy as np
import pytest

from image_search_engine_for_historical_research_tpu.rerank import geometric as G


def make_scene(seed=0, n=200, size=800):
    """Synthetic keypoints in image 1 and a similarity-transformed copy."""
    rng = np.random.default_rng(seed)
    xy1 = rng.uniform(50, size - 50, (n, 2)).astype(np.float32)
    angle = 0.3
    scale = 1.2
    R = np.array([[np.cos(angle), -np.sin(angle)], [np.sin(angle), np.cos(angle)]],
                 np.float32)
    t = np.array([30.0, -12.0], np.float32)
    xy2 = scale * xy1 @ R.T + t
    desc = rng.standard_normal((n, 128)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)

    def feats(xy, base_angle, base_scale):
        f = G.LocalFeatures(
            xy=np.zeros((G.MAX_KPTS, 2), np.float32),
            scale=np.zeros((G.MAX_KPTS,), np.float32),
            angle=np.zeros((G.MAX_KPTS,), np.float32),
            desc=np.zeros((G.MAX_KPTS, 128), np.float32),
            count=n, shape=(size, size),
        )
        f.xy[:n] = xy
        f.scale[:n] = base_scale
        f.angle[:n] = base_angle
        f.desc[:n] = desc
        return f

    f1 = feats(xy1, 0.0, 2.0)
    f2 = feats(xy2, angle, 2.0 * scale)
    return f1, f2


class TestVerifier:
    def test_true_match_high_inliers(self):
        f1, f2 = make_scene()
        verify = G.make_verifier()
        inliers = verify(f1, f2)
        assert inliers > 100  # nearly all 200 matches are consistent

    def test_random_pair_low_inliers(self):
        f1, _ = make_scene(seed=1)
        _, g2 = make_scene(seed=2)
        # shuffle descriptors so matches are random
        rng = np.random.default_rng(3)
        g2.desc = rng.permutation(g2.desc)
        verify = G.make_verifier()
        inliers = verify(f1, g2)
        assert inliers < 20

    def test_empty_features(self):
        f1, f2 = make_scene()
        empty = G.LocalFeatures(
            xy=np.zeros((G.MAX_KPTS, 2), np.float32),
            scale=np.zeros((G.MAX_KPTS,), np.float32),
            angle=np.zeros((G.MAX_KPTS,), np.float32),
            desc=np.zeros((G.MAX_KPTS, 128), np.float32),
            count=0, shape=(10, 10),
        )
        verify = G.make_verifier()
        assert verify(f1, empty) == 0


class TestRerank:
    def test_rerank_by_inliers_reorders_top_b(self):
        ranks = np.array([[5, 6, 7, 8, 9, 1, 2]])
        counts = np.array([[1, 9, 3]])
        out = G.rerank_by_inliers(ranks, counts, b=3)
        np.testing.assert_array_equal(out[0], [6, 7, 5, 8, 9, 1, 2])

    def test_sift_pipeline_on_real_images(self, tmp_path):
        # real jpgs through cv2 SIFT: a query matches its shifted copy better
        # than a different texture
        import cv2

        rng = np.random.default_rng(0)
        base = (rng.uniform(0, 255, (240, 320)) ).astype(np.uint8)
        base = cv2.GaussianBlur(base, (0, 0), 2.0)
        shifted = np.roll(base, 12, axis=1)
        other = cv2.GaussianBlur(
            rng.uniform(0, 255, (240, 320)).astype(np.uint8), (0, 0), 2.0
        )
        paths = {}
        for name, img in [("q", base), ("same", shifted), ("diff", other)]:
            p = str(tmp_path / f"{name}.jpg")
            cv2.imwrite(p, img)
            paths[name] = p

        ranks = np.array([[1, 0]])  # wrong order: diff first
        out = G.sift_rerank(
            [paths["q"]], [paths["same"], paths["diff"]], ranks, b=2,
            store_dir=str(tmp_path / "sift"), resize=(320, 240),
        )
        assert out[0, 0] == 0  # the true match is promoted to rank 0

    def test_offline_store_roundtrip(self, tmp_path):
        import cv2

        img = cv2.GaussianBlur(
            np.random.default_rng(1).uniform(0, 255, (120, 160)).astype(np.uint8),
            (0, 0), 1.5,
        )
        p = str(tmp_path / "x.jpg")
        cv2.imwrite(p, img)
        stored = G.sift_offline([p], str(tmp_path / "store"), resize=(160, 120))
        f = G.LocalFeatures.load(stored[0])
        assert f.count > 0
        assert np.isfinite(f.desc[: f.count]).all()


def adalam_scene(seed=0, n_in=200, n_out=80, imsize=1000.0):
    """AdaLAM-friendly scene: affine inliers + outliers, NOISY descriptors
    (exact-duplicate descriptors make every ratio score tie at 0 and
    degenerate the seed selection/confidence gate). Padded LocalFeatures."""
    rng = np.random.default_rng(seed)
    n = n_in + n_out
    k1 = rng.uniform(40, imsize - 40, (n, 2)).astype(np.float32)
    theta = 0.2
    A = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]], np.float32) * 1.1
    k2 = np.empty_like(k1)
    k2[:n_in] = k1[:n_in] @ A.T + [25.0, -12.0] + rng.normal(0, 1.0, (n_in, 2))
    k2[n_in:] = rng.uniform(40, imsize - 40, (n_out, 2))

    d = rng.standard_normal((n, 128)).astype(np.float32)
    d1 = d + 0.05 * rng.standard_normal((n, 128)).astype(np.float32)
    d2 = d + 0.05 * rng.standard_normal((n, 128)).astype(np.float32)
    o1 = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    o2 = (o1 + theta + rng.normal(0, 0.05, n)).astype(np.float32)
    s1 = rng.uniform(2, 6, n).astype(np.float32)
    s2 = (s1 * 1.1).astype(np.float32)

    def pack(xy, o, s, dd):
        f = G.LocalFeatures(
            xy=np.zeros((G.MAX_KPTS, 2), np.float32),
            scale=np.ones((G.MAX_KPTS,), np.float32),
            angle=np.zeros((G.MAX_KPTS,), np.float32),
            desc=np.zeros((G.MAX_KPTS, 128), np.float32),
            count=n, shape=(int(imsize), int(imsize)),
        )
        f.xy[:n], f.angle[:n], f.scale[:n], f.desc[:n] = xy, o, s, dd
        return f

    return pack(k1, o1, s1, d1), pack(k2, o2, s2, d2)


class TestBatchedAdalam:
    def test_batched_counts_match_sequential(self):
        """The pair-batched AdaLAM counter must agree with the per-pair
        match_and_filter path (same config, same inputs)."""
        f1, f2 = adalam_scene(seed=4)
        g1, _ = adalam_scene(seed=7)
        rng = np.random.default_rng(8)
        g2 = G.LocalFeatures(
            xy=f2.xy.copy(), scale=f2.scale.copy(), angle=f2.angle.copy(),
            desc=rng.permutation(f2.desc), count=f2.count, shape=f2.shape,
        )
        pairs_q = [f1, f1, g1]
        pairs_c = [f2, g2, f2]

        seq = G.make_adalam_verifier()
        seq_counts = np.array([seq(a, b) for a, b in zip(pairs_q, pairs_c)])
        bat_counts = G.adalam_count_pairs(pairs_q, pairs_c, pair_batch=2)
        np.testing.assert_array_equal(bat_counts, seq_counts)
        assert seq_counts[0] > 50        # the true pair survives
        assert seq_counts[1] < seq_counts[0]

        # the default one-dispatch scan path equals the per-block host loop
        loop_counts = G.adalam_count_pairs(
            pairs_q, pairs_c, pair_batch=2, dispatch="loop"
        )
        np.testing.assert_array_equal(loop_counts, bat_counts)

    def test_sift_rerank_batched_default(self, tmp_path):
        import cv2

        rng = np.random.default_rng(0)
        base = rng.uniform(0, 255, (240, 320)).astype(np.uint8)
        base = cv2.GaussianBlur(base, (0, 0), 2.0)
        shifted = np.roll(base, 12, axis=1)
        other = cv2.GaussianBlur(
            rng.uniform(0, 255, (240, 320)).astype(np.uint8), (0, 0), 2.0
        )
        paths = {}
        for name, img in [("q", base), ("same", shifted), ("diff", other)]:
            p = str(tmp_path / f"{name}.jpg")
            cv2.imwrite(p, img)
            paths[name] = p

        ranks = np.array([[1, 0]])
        out = G.sift_rerank(  # default path = batched AdaLAM
            [paths["q"]], [paths["same"], paths["diff"]], ranks, b=2,
            resize=(320, 240), pair_batch=2,
        )
        assert out[0, 0] == 0


class TestLoFTRRerank:
    def test_loftr_rerank_promotes_matching_image(self, tmp_path):
        import cv2
        import jax
        from image_search_engine_for_historical_research_tpu.models import loftr

        rng = np.random.default_rng(5)
        base = cv2.GaussianBlur(rng.uniform(0, 255, (120, 160)).astype(np.uint8), (0, 0), 2.0)
        shifted = np.roll(base, 6, axis=1)
        other = cv2.GaussianBlur(rng.uniform(0, 255, (120, 160)).astype(np.uint8), (0, 0), 2.0)
        paths = {}
        for name, img in [("q", base), ("same", shifted), ("diff", other)]:
            p = str(tmp_path / f"{name}.jpg")
            cv2.imwrite(p, img)
            paths[name] = p

        small = loftr.LoFTRConfig(
            initial_dim=32, block_dims=(32, 48, 64), d_coarse=64, d_fine=32,
            nhead=4, coarse_layers=("self", "cross"), thr=0.0, max_matches=64,
        )
        m, variables = loftr.init_matcher(
            image_shape=(64, 96), rng=jax.random.PRNGKey(0), config=small,
        )
        match_fn = loftr.make_match_fn(m, variables)
        ranks = np.array([[1, 0]])
        out = G.loftr_rerank(
            [paths["q"]], [paths["same"], paths["diff"]], ranks, match_fn,
            b=2, resolution=(96, 64),
        )
        assert out.shape == (1, 2)
        assert set(out[0]) == {0, 1}

        # the pair-batched counter produces the same re-ranking, and its
        # counts equal the per-pair path's
        count_fn = loftr.make_batched_count_fn(m, variables)
        out_b = G.loftr_rerank(
            [paths["q"]], [paths["same"], paths["diff"]], ranks,
            count_fn=count_fn, b=2, resolution=(96, 64), pair_batch=2,
        )
        np.testing.assert_array_equal(out_b, out)

        # the one-dispatch banked scan path re-ranks identically
        banked_fn = loftr.make_banked_count_fn(m, variables)
        out_k = G.loftr_rerank(
            [paths["q"]], [paths["same"], paths["diff"]], ranks,
            banked_count_fn=banked_fn, b=2, resolution=(96, 64), pair_batch=2,
        )
        np.testing.assert_array_equal(out_k, out)

        import cv2 as _cv2

        def _load(p):
            img = _cv2.resize(
                _cv2.imread(p, _cv2.IMREAD_GRAYSCALE), (96, 64)
            ).astype(np.float32) / 255.0
            return img[:, :, None]

        i0 = np.stack([_load(paths["q"])] * 2)
        i1 = np.stack([_load(paths["same"]), _load(paths["diff"])])
        batched = np.asarray(count_fn(i0, i1))
        per_pair = np.array([
            int(np.asarray(match_fn(_load(paths["q"]), _load(paths[n])).num_matches))
            for n in ("same", "diff")
        ])
        np.testing.assert_array_equal(batched, per_pair)

        with pytest.raises(ValueError, match="exactly one"):
            G.loftr_rerank([paths["q"]], [paths["same"]], ranks,
                           match_fn=match_fn, count_fn=count_fn)


def test_rank_montage(tmp_path):
    import cv2
    from image_search_engine_for_historical_research_tpu.data import save_rank_montage

    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        p = str(tmp_path / f"im{i}.jpg")
        cv2.imwrite(p, rng.uniform(0, 255, (50, 70)).astype(np.uint8))
        paths.append(p)
    out = save_rank_montage(paths[0], paths, np.array([1, 2, 3]),
                            str(tmp_path / "viz" / "m.jpg"), k=3, thumb=32)
    import os
    assert os.path.exists(out)
