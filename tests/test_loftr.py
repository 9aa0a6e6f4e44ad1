import numpy as np
import jax
import jax.numpy as jnp
import pytest

from image_search_engine_for_historical_research_tpu.models import loftr


@pytest.fixture(scope="module")
def matcher():
    # small config for CPU tests
    m, variables = loftr.init_matcher(
        image_shape=(64, 96), rng=jax.random.PRNGKey(0),
        d_model=64, d_fine=32, nhead=4, layers=2, max_matches=64,
        conf_threshold=0.0,
    )
    return loftr.make_match_fn(m, variables)


def test_match_result_shapes(matcher):
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 1, (64, 96, 1)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 1, (64, 96, 1)), jnp.float32)
    res = matcher(img0, img1)
    assert res.kpts0.shape == (64, 2)
    assert res.kpts1.shape == (64, 2)
    assert res.conf.shape == (64,)
    assert np.isfinite(np.asarray(res.kpts1)).all()
    # keypoints inside the images
    k0 = np.asarray(res.kpts0)
    assert (k0[:, 0] <= 96).all() and (k0[:, 1] <= 64).all()


def test_identical_images_match_diagonal(matcher):
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (64, 96, 1)), jnp.float32)
    res = matcher(img, img)
    k0, k1, conf = map(np.asarray, (res.kpts0, res.kpts1, res.conf))
    valid = conf > 0
    assert valid.sum() > 10
    # with identical inputs, matched coarse cells should coincide
    d = np.linalg.norm(k0[valid] - k1[valid], axis=1)
    assert np.median(d) < 8.0  # within one coarse cell


def test_sine_pe_properties():
    pe = loftr.sine_positional_encoding(8, 12, 32)
    assert pe.shape == (8, 12, 32)
    # distinct positions get distinct encodings
    flat = np.asarray(pe).reshape(-1, 32)
    assert len(np.unique(flat.round(4), axis=0)) == 96
