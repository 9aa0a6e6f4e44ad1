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
