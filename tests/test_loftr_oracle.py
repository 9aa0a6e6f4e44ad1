"""LoFTR parity against the reference's vendored torch implementation.

Oracle: ``/root/reference/src/utils/src/loftr/`` with random weights (the
released outdoor checkpoint layout), run on CPU torch with stubbed kornia/yacs.
The Flax matcher must reproduce the coarse confidence matrix and the final
coarse+fine matches after ``convert_loftr_state_dict`` conversion — proving
the converter is ready for the real pretrained weights.
"""

import numpy as np
import pytest
import torch

from image_search_engine_for_historical_research_tpu.models.loftr import (
    LoFTRConfig,
    LoFTRMatcher,
    convert_loftr_state_dict,
    init_matcher,
    sine_positional_encoding,
)

from reference_oracle import load_reference_loftr

LoFTRTorch, default_cfg = load_reference_loftr()

H, W = 96, 128  # divisible by 8; small enough for CPU


def _randomize_(net, seed=0):
    """Perturb BN stats so conversion bugs can't hide behind identity BNs."""
    g = torch.Generator().manual_seed(seed)
    sd = net.state_dict()
    for k, t in sd.items():
        if not t.dtype.is_floating_point:
            continue
        if k.endswith("running_var"):
            t.copy_(0.5 + torch.rand(t.shape, generator=g))
        elif k.endswith("running_mean"):
            t.copy_(0.2 * torch.randn(t.shape, generator=g))
        elif ".bn" in k or "outconv2.1" in k or "downsample.1" in k:
            if k.endswith("weight"):
                t.copy_(0.5 + torch.rand(t.shape, generator=g))
            elif k.endswith("bias"):
                t.copy_(0.2 * torch.randn(t.shape, generator=g))


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tnet = LoFTRTorch(config=default_cfg)
    _randomize_(tnet)
    tnet.eval()

    cfg = LoFTRConfig(temp_bug_fix=bool(default_cfg["coarse"]["temp_bug_fix"]))
    module, variables = init_matcher((H, W), config=cfg)
    converted = convert_loftr_state_dict(tnet.state_dict(), cfg)

    import jax

    want = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(variables)
    }
    got = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(converted)
    }
    assert want == got, set(want.items()) ^ set(got.items())
    return tnet, module, converted


def _torch_forward(tnet, img0, img1):
    data = {
        "image0": torch.from_numpy(img0[None, None]),
        "image1": torch.from_numpy(img1[None, None]),
    }
    with torch.no_grad():
        tnet(data)
    return data


def _images(seed=1):
    rng = np.random.default_rng(seed)
    # smooth-ish random images: random low-res upsampled (gives structured
    # heatmaps rather than uniform noise)
    def mk():
        base = rng.standard_normal((H // 8, W // 8)).astype(np.float32)
        img = np.kron(base, np.ones((8, 8), np.float32))
        img += 0.1 * rng.standard_normal((H, W)).astype(np.float32)
        return (img - img.min()) / (np.ptp(img) + 1e-6)

    return mk(), mk()


def test_pe_matches_reference_both_variants():
    from src.utils.src.loftr.utils.position_encoding import PositionEncodingSine

    for bugfix in (False, True):
        tpe = PositionEncodingSine(256, max_shape=(32, 32), temp_bug_fix=bugfix)
        ref = tpe.pe[0, :, : H // 8, : W // 8].numpy().transpose(1, 2, 0)
        got = sine_positional_encoding(H // 8, W // 8, 256, temp_bug_fix=bugfix)
        np.testing.assert_allclose(got, ref, atol=1e-6, rtol=0)


def test_coarse_confidence_matrix_parity(pair):
    tnet, module, variables = pair
    img0, img1 = _images()
    data = _torch_forward(tnet, img0, img1)
    ref_conf = data["conf_matrix"][0].numpy()  # (L, L)

    out, inter = module.apply(
        variables, img0[:, :, None], img1[:, :, None], mutable=["intermediates"]
    )
    got_conf = np.asarray(inter["intermediates"]["conf_matrix"][0])
    assert got_conf.shape == ref_conf.shape
    np.testing.assert_allclose(got_conf, ref_conf, atol=1e-4, rtol=0)


def test_final_matches_parity(pair):
    tnet, module, variables = pair
    img0, img1 = _images(seed=2)
    data = _torch_forward(tnet, img0, img1)
    ref0 = data["mkpts0_f"].numpy()
    ref1 = data["mkpts1_f"].numpy()
    ref_conf = data["mconf"].numpy()

    res = module.apply(variables, img0[:, :, None], img1[:, :, None])
    conf = np.asarray(res.conf)
    m = conf > 0
    got0 = np.asarray(res.kpts0)[m]
    got1 = np.asarray(res.kpts1)[m]

    assert m.sum() == len(ref0), (int(m.sum()), len(ref0))
    # same coarse matches (order may differ): compare as sets keyed by kpts0
    ref_order = np.lexsort((ref0[:, 1], ref0[:, 0]))
    got_order = np.lexsort((got0[:, 1], got0[:, 0]))
    np.testing.assert_array_equal(got0[got_order], ref0[ref_order])
    np.testing.assert_allclose(
        got1[got_order], ref1[ref_order], atol=0.05, rtol=0
    )
    np.testing.assert_allclose(
        np.sort(conf[m])[::-1], np.sort(ref_conf)[::-1], atol=1e-4, rtol=0
    )


def test_identical_images_parity(pair):
    """Identical-pair edge case must also agree with the oracle (with random
    weights the dot-product argmax need not be the diagonal, so the meaningful
    invariant is oracle agreement, not self-matching)."""
    tnet, module, variables = pair
    img0, _ = _images(seed=3)
    data = _torch_forward(tnet, img0, img0)
    res = module.apply(variables, img0[:, :, None], img0[:, :, None])
    conf = np.asarray(res.conf)
    m = conf > 0
    assert int(m.sum()) == len(data["mkpts0_f"])
    ref0 = data["mkpts0_f"].numpy()
    got0 = np.asarray(res.kpts0)[m]
    np.testing.assert_array_equal(
        got0[np.lexsort((got0[:, 1], got0[:, 0]))],
        ref0[np.lexsort((ref0[:, 1], ref0[:, 0]))],
    )
