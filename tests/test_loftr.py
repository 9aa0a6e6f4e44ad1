"""LoFTR matcher smoke tests (small config; parity lives in
test_loftr_oracle.py against the vendored torch implementation)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from image_search_engine_for_historical_research_tpu.models import loftr

SMALL = loftr.LoFTRConfig(
    initial_dim=32,
    block_dims=(32, 48, 64),
    d_coarse=64,
    d_fine=32,
    nhead=4,
    coarse_layers=("self", "cross") * 2,
    thr=0.0,
    max_matches=64,
)


@pytest.fixture(scope="module")
def matcher():
    m, variables = loftr.init_matcher(
        image_shape=(64, 96), rng=jax.random.PRNGKey(0), config=SMALL
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
    k0 = np.asarray(res.kpts0)
    valid = np.asarray(res.conf) > 0
    assert valid.sum() > 0
    assert (k0[valid, 0] <= 96).all() and (k0[valid, 1] <= 64).all()


def test_identical_images_symmetric_matches(matcher):
    """With identical inputs the confidence matrix is symmetric, so matches
    must come in mutual pairs: if (i, j) is kept then kpts under swap agree."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (64, 96, 1)), jnp.float32)
    res = matcher(img, img)
    k0, k1, conf = map(np.asarray, (res.kpts0, res.kpts1, res.conf))
    valid = conf > 0
    assert valid.sum() > 0
    # swap-invariance: matching (img, img) again with roles swapped is identity
    res2 = matcher(img, img)
    np.testing.assert_allclose(np.asarray(res2.kpts0), k0)


def test_sine_pe_properties():
    pe = loftr.sine_positional_encoding(8, 12, 32, temp_bug_fix=True)
    assert pe.shape == (8, 12, 32)
    flat = np.asarray(pe).reshape(-1, 32)
    assert len(np.unique(flat.round(4), axis=0)) == 96


def test_config_checkpoint_roundtrip(tmp_path):
    """load_loftr_checkpoint accepts the released {'state_dict': ...} layout."""
    import torch

    from reference_oracle import load_reference_loftr

    LoFTRTorch, default_cfg = load_reference_loftr()
    torch.manual_seed(0)
    tnet = LoFTRTorch(config=default_cfg)
    p = tmp_path / "outdoor_ds.ckpt"
    torch.save({"state_dict": {"matcher." + k: v for k, v in tnet.state_dict().items()}}, p)
    variables = loftr.load_loftr_checkpoint(str(p))
    m, init_vars = loftr.init_matcher((96, 128))
    want = {
        jax.tree_util.keystr(q): v.shape
        for q, v in jax.tree_util.tree_leaves_with_path(init_vars)
    }
    got = {
        jax.tree_util.keystr(q): v.shape
        for q, v in jax.tree_util.tree_leaves_with_path(variables)
    }
    assert want == got
