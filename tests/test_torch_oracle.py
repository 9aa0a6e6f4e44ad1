"""Descriptor parity against the REAL reference torch model.

Round-1 review finding: the weight converter was only tested against its own
inverse. Here the oracle is the reference's own ``SOLAR_Global_Retrieval`` /
``init_network`` (``/root/reference/src/networks/imageretrievalnet.py:156-354``,
``networks.py:149-211``) running under torch with random-but-perturbed weights
(no download needed). Its ``state_dict`` is converted by ``models.weights`` and
the Flax model must produce the same descriptors — covering conv/maxpool padding
semantics, BN eps, GeM clamp order, SOA attention scaling, whitening, and the
multiscale ``F.interpolate(align_corners=False)`` path, at odd AND even sizes.
"""

import numpy as np
import pytest
import torch

from image_search_engine_for_historical_research_tpu import models
from image_search_engine_for_historical_research_tpu.models import weights as W
from image_search_engine_for_historical_research_tpu.models.extract import (
    multiscale_descriptor,
)

from reference_oracle import load_reference_retrieval_module, randomize_solar_

iret = load_reference_retrieval_module()


def _build_pair(config, seed=0):
    """(torch reference net, our RetrievalModel with converted weights)."""
    ref_params = dict(
        architecture=config.get("architecture", "resnet101"),
        pooling=config.get("pooling", "gem"),
        whitening=config.get("whitening", True),
        local_whitening=config.get("local_whitening", False),
        regional=config.get("regional", False),
        soa=True,
        soa_layers=config.get("soa_layers", "45"),
        pretrained=False,  # random torchvision init — no download
        pretrained_type="imagenet",  # skips the custom-weights URL branch
        mode="test",
    )
    torch.manual_seed(seed)
    tnet = iret.init_network(ref_params)
    randomize_solar_(tnet, seed=seed)
    tnet.eval()

    ours = models.init_network(
        {
            "architecture": ref_params["architecture"],
            "pooling": ref_params["pooling"],
            "whitening": ref_params["whitening"],
            "local_whitening": ref_params["local_whitening"],
            "regional": ref_params["regional"],
            "soa": True,
            "soa_layers": ref_params["soa_layers"],
        }
    )
    converted = W.convert_solar_state_dict(tnet.state_dict())
    W.assert_tree_shapes_match(converted, ours.params)
    ours.params = converted
    return tnet, ours


def _torch_descriptor(tnet, x_nhwc):
    with torch.no_grad():
        t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())
        return tnet(t).numpy()


def _our_descriptor(ours, x_nhwc):
    import jax.numpy as jnp

    return np.asarray(ours.apply(jnp.asarray(x_nhwc)))


def _rand_images(shape, seed=1):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape, dtype=np.float32) * 0.5


class TestSolarParity:
    @pytest.fixture(scope="class")
    def pair(self):
        return _build_pair({"soa_layers": "45", "whitening": True})

    # Even sizes stress asymmetric-padding bugs ('SAME' pads (0,1) where torch
    # pads (1,1)); odd sizes stress the off-by-one output-extent arithmetic.
    @pytest.mark.parametrize("size", [(64, 64), (65, 97), (96, 128), (70, 106)])
    def test_descriptor_allclose(self, pair, size):
        tnet, ours = pair
        x = _rand_images((2, *size, 3))
        ref = _torch_descriptor(tnet, x)
        got = _our_descriptor(ours, x)
        assert ref.shape == got.shape == (2, 2048)
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=0)

    def test_multiscale_parity(self, pair):
        """extract_ms (imageretrievalnet.py:464-479) vs multiscale_descriptor."""
        tnet, ours = pair
        x = _rand_images((1, 96, 64, 3), seed=3)
        scales = (1.0, 2**0.5, 0.5**0.5)
        msp = float(tnet.pool.p.item())  # test_rOP1m-style msp = GeM p

        t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
        with torch.no_grad():
            ref = iret.extract_ms(tnet, t, ms=list(scales), msp=msp).numpy()

        import jax.numpy as jnp

        got = np.asarray(
            multiscale_descriptor(
                ours.module, ours.params, jnp.asarray(x), scales=scales, msp=msp
            )
        )[0]
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)


def test_parity_no_soa_no_whiten():
    tnet, ours = _build_pair({"soa_layers": "", "whitening": False}, seed=5)
    x = _rand_images((1, 63, 66, 3), seed=7)
    np.testing.assert_allclose(
        _our_descriptor(ours, x), _torch_descriptor(tnet, x), atol=1e-5, rtol=0
    )


def test_parity_local_whitening():
    tnet, ours = _build_pair(
        {"soa_layers": "45", "whitening": True, "local_whitening": True}, seed=9
    )
    x = _rand_images((1, 64, 96, 3), seed=11)
    np.testing.assert_allclose(
        _our_descriptor(ours, x), _torch_descriptor(tnet, x), atol=1e-5, rtol=0
    )


def test_parity_regional_rpool():
    """The regional path: pool becomes Rpool(GeM, rwhiten Linear) — roipool
    over the R-MAC grid, per-region l2n -> whiten -> l2n, sum-aggregate, l2n
    (imageretrievalnet.py:295-312, layers/pooling.py:77-113)."""
    tnet, ours = _build_pair(
        {"soa_layers": "45", "whitening": True, "regional": True}, seed=17
    )
    assert ours.meta["regional"] is True
    assert "rwhiten" in ours.params["params"]
    # two sizes: square (symmetric grid) and non-square (Wd/Hd overplus branch)
    for size, seed in (((64, 64), 19), ((64, 96), 21)):
        x = _rand_images((1, *size, 3), seed=seed)
        np.testing.assert_allclose(
            _our_descriptor(ours, x), _torch_descriptor(tnet, x),
            atol=2e-5, rtol=0,
        )


def test_parity_resnet50():
    tnet, ours = _build_pair({"architecture": "resnet50"}, seed=13)
    x = _rand_images((1, 64, 64, 3), seed=15)
    np.testing.assert_allclose(
        _our_descriptor(ours, x), _torch_descriptor(tnet, x), atol=1e-5, rtol=0
    )
