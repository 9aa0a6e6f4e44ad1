import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from image_search_engine_for_historical_research_tpu.models import d2net
from image_search_engine_for_historical_research_tpu.rerank.geometric import (
    make_verifier,
)

sys.path.insert(0, os.path.dirname(__file__))


class TestD2NetOracle:
    """Parity against the vendored torch D2-Net (lib/model_test.py +
    lib/pyramid.py), randomly initialized weights shared via the converter."""

    @pytest.fixture(scope="class")
    def both(self):
        import torch

        os.environ.setdefault("MPLBACKEND", "Agg")
        # scope the lib path to this import: leaving /root/reference/src/utils
        # on sys.path makes its regular-package `src/` (the vendored LoFTR
        # tree) shadow the reference's namespace package `src`, breaking
        # later `import src.utils.src...` in other tests
        lib_path = "/root/reference/src/utils"
        sys.path.append(lib_path)
        try:
            from lib.model_test import D2Net  # noqa: E402
            from lib.pyramid import process_multiscale as torch_pyramid  # noqa
        finally:
            sys.path.remove(lib_path)

        torch.manual_seed(0)
        ref = D2Net(model_file=None, use_relu=True, use_cuda=False).eval()
        module, variables = (
            d2net.DenseFeatureExtraction(use_relu=True),
            d2net.convert_d2net_state_dict(ref.state_dict()),
        )
        return ref, torch_pyramid, module, variables

    def test_dense_features_match(self, both):
        import torch

        ref, _, module, variables = both
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
        ours = np.asarray(module.apply(variables, jnp.asarray(img)[None])[0])
        with torch.no_grad():
            theirs = ref.dense_feature_extraction(
                torch.from_numpy(img.transpose(2, 0, 1)[None])
            )[0].numpy().transpose(1, 2, 0)
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=2e-4)

    def test_detection_and_localization_match(self, both):
        import torch

        ref, _, module, variables = both
        rng = np.random.default_rng(1)
        feats = rng.uniform(0, 1, (14, 18, 512)).astype(np.float32)
        ours_det = np.asarray(d2net.hard_detection(jnp.asarray(feats)))
        ours_disp = np.asarray(d2net.handcrafted_localization(jnp.asarray(feats)))
        t = torch.from_numpy(feats.transpose(2, 0, 1)[None])
        with torch.no_grad():
            ref_det = ref.detection(t)[0].numpy().transpose(1, 2, 0)
            ref_disp = ref.localization(t)[0].numpy()  # (2, C, H, W)
        np.testing.assert_array_equal(ours_det, ref_det)
        ref_disp = np.transpose(ref_disp, (2, 3, 1, 0))  # -> (H, W, C, 2)
        # localization divides by tiny dets -> compare only finite, moderate
        # entries (the pyramid gates |step| < 0.5 anyway)
        both_ok = (
            np.isfinite(ours_disp) & np.isfinite(ref_disp)
            & (np.abs(ref_disp) < 10)
        )
        np.testing.assert_allclose(
            ours_disp[both_ok], ref_disp[both_ok], atol=1e-3
        )

    def test_multiscale_pyramid_matches(self, both):
        """Image chosen so every scale yields keypoints: scales with none
        trigger the reference pyramid's own EmptyTensorError/UnboundLocal
        crash path (pyramid.py:80-84,118 — a latent reference bug)."""
        import cv2
        import torch

        ref, torch_pyramid, module, variables = both
        rng = np.random.default_rng(2)
        img = rng.uniform(0, 1, (96, 128, 3)).astype(np.float32)
        img = cv2.GaussianBlur(img, (0, 0), 2.0)
        kpts, scores, desc = d2net.process_multiscale(img, module, variables)
        with torch.no_grad():
            rk, rs, rd = torch_pyramid(
                torch.from_numpy(img.transpose(2, 0, 1)[None]), ref
            )
        assert kpts.shape == rk.shape, (kpts.shape, rk.shape)
        assert len(kpts) >= 20, "scene produced too few detections"
        np.testing.assert_allclose(kpts, rk, atol=1e-2)
        np.testing.assert_allclose(scores, rs, atol=1e-3)
        np.testing.assert_allclose(desc, rd, atol=1e-3)

    def test_extract_flows_into_verifier(self, both):
        import cv2

        _, _, module, variables = both
        rng = np.random.default_rng(3)
        img = rng.uniform(0, 1, (96, 128, 3)).astype(np.float32)
        img = cv2.GaussianBlur(img, (0, 0), 2.0)
        f = d2net.extract_d2net_features(module, variables, img, max_kpts=256)
        assert f.count > 10
        np.testing.assert_allclose(
            np.linalg.norm(f.desc[: f.count], axis=1), 1.0, atol=1e-3
        )


def test_detection_shapes_and_norms():
    m, variables = d2net.init_dense_net(dim=64, rng=jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (64, 96, 3)), jnp.float32)
    feats = m.apply(variables, img[None])[0]
    xy, scores, desc = d2net.detect_keypoints(feats, max_kpts=100)
    assert xy.shape == (100, 2)
    assert desc.shape == (100, 64)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(desc), axis=1), 1.0, atol=1e-4)
    s = np.asarray(scores)
    assert (np.diff(s) <= 1e-6).all()  # descending


def test_scores_peak_on_distinct_structure():
    m, variables = d2net.init_dense_net(dim=64, rng=jax.random.PRNGKey(1))
    img = np.zeros((64, 64, 3), np.float32)
    img[28:36, 28:36] = 1.0  # a single bright blob
    feats = m.apply(variables, jnp.asarray(img)[None])[0]
    xy, scores, _ = d2net.detect_keypoints(feats, max_kpts=10)
    xy = np.asarray(xy)
    # top detections near the blob (feature map is 1/4 scale)
    center = np.array([32 / 4, 32 / 4])
    assert np.median(np.linalg.norm(xy - center, axis=1)) < 8


def test_localfeatures_flow_into_verifier():
    m, variables = d2net.init_dense_net(dim=128, rng=jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
    f1 = d2net.extract_dense_features(m, variables, jnp.asarray(img), max_kpts=128)
    f2 = d2net.extract_dense_features(m, variables, jnp.asarray(img), max_kpts=128)
    verify = make_verifier(inlier_px=5.0)
    inliers = verify(f1, f2)
    assert inliers > 50  # identical image pairs verify strongly
