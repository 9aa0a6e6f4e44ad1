import numpy as np
import jax
import jax.numpy as jnp

from image_search_engine_for_historical_research_tpu.models import d2net
from image_search_engine_for_historical_research_tpu.rerank.geometric import (
    make_verifier,
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
