"""TPU-native SIFT (ops/sift.py): detection, invariance, SAHA integration.

Quality-tested (the module documents deliberate divergences from OpenCV, so
there is no bit-oracle): keypoints localize synthetic blobs at the right
scale, descriptors are shift- and rotation-invariant, and the SAHA re-rank
pipeline (rerank.geometric, backend="tpu") promotes true matches end to end.
Reference counterpart: cv2 SIFT consumed by /root/reference/src/utils/
Reranking.py:37-116, 638-723 (extraction itself is not in the reference).
"""

import numpy as np
import pytest
from scipy import ndimage

from image_search_engine_for_historical_research_tpu.ops import sift


def _texture(seed=1, hw=(256, 256)):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, (hw[0] // 8, hw[1] // 8))
    img = ndimage.zoom(base, 8, order=3).astype(np.float32)
    return (img - img.min()) / np.ptp(img)


class TestDetection:
    def test_blob_positions_and_scales(self):
        H = W = 256
        yy, xx = np.mgrid[:H, :W].astype(np.float32)
        truth = [(64, 64, 3.0), (64, 192, 6.0), (192, 64, 10.0),
                 (192, 192, 4.0), (128, 128, 8.0)]
        img = np.zeros((H, W), np.float32)
        for cy, cx, s in truth:
            img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
        img += np.random.default_rng(0).normal(0, 0.01, (H, W)).astype(np.float32)
        img = np.clip(img, 0, 1)

        f = sift.sift_extract_batch(img[None], max_kpts=256, n_octaves=4)[0]
        assert f["count"] >= len(truth)
        kxy = f["xy"][: f["count"]]
        ksc = f["scale"][: f["count"]]
        found_scales = []
        for cy, cx, s in truth:
            d = np.linalg.norm(kxy - np.array([cx, cy]), axis=1)
            i = int(np.argmin(d))
            assert d[i] < 2.0, (cy, cx, s, d[i])
            found_scales.append(ksc[i])
        # detected scale grows monotonically with blob sigma
        order = np.argsort([t[2] for t in truth])
        assert (np.diff(np.asarray(found_scales)[order]) > 0).all()

    def test_fixed_budget_and_validity(self):
        img = _texture(0)
        f = sift.sift_extract_batch(img[None], max_kpts=128, n_octaves=3)[0]
        assert f["desc"].shape == (128, 128)
        assert 0 < f["count"] <= 128
        # invalid slots zeroed, valid descriptors L2-normalized
        n = f["count"]
        assert np.allclose(np.linalg.norm(f["desc"][:n], axis=1), 1.0, atol=1e-4)
        assert np.all(f["desc"][n:] == 0)

    def test_flat_image_no_keypoints(self):
        img = np.full((128, 128), 0.5, np.float32)
        f = sift.sift_extract_batch(img[None], max_kpts=64, n_octaves=2)[0]
        assert f["count"] == 0

    def test_default_budgets(self):
        assert sum(sift.default_budgets(1024, 4)) == 1024
        assert sum(sift.default_budgets(256, 4)) == 256
        assert all(b >= 0 for b in sift.default_budgets(64, 5))


class TestInvariance:
    def test_shift_matching(self):
        img = _texture(1)
        sh = np.roll(img, 16, axis=1)
        f0, f1 = sift.sift_extract_batch(
            np.stack([img, sh]), max_kpts=512, n_octaves=3
        )
        n0, n1 = f0["count"], f1["count"]
        D = f0["desc"][:n0] @ f1["desc"][:n1].T
        nn = D.argmax(1)
        d = np.linalg.norm(
            f0["xy"][:n0] + np.array([16, 0]) - f1["xy"][:n1][nn], axis=1
        )
        assert (d < 3).mean() > 0.8, (d < 3).mean()

    def test_rotation_invariance(self):
        img = _texture(1)
        ang = 30.0
        rot = ndimage.rotate(
            img, ang, reshape=False, order=3, mode="nearest"
        ).astype(np.float32)
        f0, f1 = sift.sift_extract_batch(
            np.stack([img, rot]), max_kpts=512, n_octaves=3
        )
        n0, n1 = f0["count"], f1["count"]
        c = (img.shape[0] - 1) / 2.0
        th = np.deg2rad(ang)
        R = np.array([[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]])
        pred = (f0["xy"][:n0] - c) @ R.T + c
        geo = np.linalg.norm(
            pred[:, None] - f1["xy"][:n1][None], axis=2
        ).min(1) < 3
        D = f0["desc"][:n0] @ f1["desc"][:n1].T
        nn = D.argmax(1)
        ok = np.linalg.norm(pred - f1["xy"][:n1][nn], axis=1) < 4
        # of the geometrically repeatable keypoints, most match by descriptor
        assert geo.sum() > 100
        assert ok[geo].mean() > 0.6, ok[geo].mean()


class TestSahaIntegration:
    def _write_jpgs(self, tmp_path):
        from PIL import Image

        img = (_texture(3, (240, 320)) * 255).astype(np.uint8)
        shifted = np.roll(img, 12, axis=1)
        other = (_texture(9, (240, 320)) * 255).astype(np.uint8)
        paths = {}
        for name, arr in [("q", img), ("same", shifted), ("diff", other)]:
            p = str(tmp_path / f"{name}.jpg")
            Image.fromarray(arr).save(p)
            paths[name] = p
        return paths

    def test_tpu_backend_rerank(self, tmp_path):
        from image_search_engine_for_historical_research_tpu.rerank import (
            geometric as G,
        )

        paths = self._write_jpgs(tmp_path)
        ranks = np.array([[1, 0]])  # wrong order: diff first
        out = G.sift_rerank(
            [paths["q"]], [paths["same"], paths["diff"]], ranks, b=2,
            store_dir=str(tmp_path / "sift"), resize=(320, 240),
            backend="tpu",
        )
        assert out[0, 0] == 0  # true match promoted

    def test_offline_store_tpu(self, tmp_path):
        from image_search_engine_for_historical_research_tpu.rerank import (
            geometric as G,
        )

        paths = self._write_jpgs(tmp_path)
        stored = G.sift_offline(
            list(paths.values()), str(tmp_path / "store"),
            resize=(320, 240), backend="tpu",
        )
        f = G.LocalFeatures.load(stored[0])
        assert f.count > 0
        assert f.shape == (240, 320)
        assert np.isfinite(f.desc[: f.count]).all()
        # idempotent: second call reuses the files
        again = G.sift_offline(
            list(paths.values()), str(tmp_path / "store"),
            resize=(320, 240), backend="tpu",
        )
        assert again == stored

    def test_cv2_agreement_loose(self, tmp_path):
        """Keypoints overlap with OpenCV's (different algorithmic choices are
        documented; this guards gross divergence, not bit equality)."""
        cv2 = pytest.importorskip("cv2")
        img = (_texture(5) * 255).astype(np.uint8)
        kp_cv = cv2.SIFT_create(nfeatures=512).detect(img, None)
        xy_cv = np.asarray([k.pt for k in kp_cv], np.float32)

        f = sift.sift_extract_batch(
            img[None].astype(np.float32) / 255.0, max_kpts=512, n_octaves=3
        )[0]
        xy = f["xy"][: f["count"]]
        d = np.linalg.norm(xy[:, None] - xy_cv[None], axis=2).min(1)
        assert (d < 3).mean() > 0.5, (d < 3).mean()


class TestAdalamQuality:
    def test_inlier_counts_competitive_with_cv2(self, tmp_path):
        """End-quality check: AdaLAM verified-inlier counts from TPU-SIFT
        features are competitive with cv2-SIFT features on a rotated pair
        (measured 387 vs 348 at the test seed — we assert a conservative
        floor to absorb version drift)."""
        cv2 = pytest.importorskip("cv2")
        from PIL import Image

        from image_search_engine_for_historical_research_tpu.rerank import (
            geometric as G,
        )

        img = (_texture(3, (240, 320)) * 255).astype(np.uint8)
        rot = ndimage.rotate(
            img, 10, reshape=False, order=3, mode="nearest"
        ).astype(np.uint8)
        p0, p1 = str(tmp_path / "a.jpg"), str(tmp_path / "b.jpg")
        Image.fromarray(img).save(p0)
        Image.fromarray(rot).save(p1)

        f_cv = [G.sift_extract(p, (320, 240)) for p in (p0, p1)]
        f_tp = G.sift_extract_tpu([p0, p1], (320, 240))
        c_cv = int(G.adalam_count_pairs([f_cv[0]], [f_cv[1]], pair_batch=1)[0])
        c_tp = int(G.adalam_count_pairs([f_tp[0]], [f_tp[1]], pair_batch=1)[0])
        assert c_tp >= 50
        assert c_tp >= 0.5 * c_cv, (c_tp, c_cv)
