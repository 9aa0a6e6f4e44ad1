import numpy as np
import jax
import jax.numpy as jnp
import pytest

from image_search_engine_for_historical_research_tpu import models
from image_search_engine_for_historical_research_tpu.models import weights as W


@pytest.fixture(scope="module")
def small_model():
    return models.init_network({"architecture": "resnet50"}, rng=jax.random.PRNGKey(1))


class TestSolarRetrieval:
    def test_descriptor_shape_and_norm(self, small_model):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 96, 3)), jnp.float32)
        v = small_model.apply(x)
        assert v.shape == (2, 2048)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=1), 1.0, atol=1e-4)

    def test_soa_zero_init_is_identity(self):
        soa = models.SOABlock(mid_ch=8)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4, 4, 16)), jnp.float32)
        variables = soa.init(jax.random.PRNGKey(0), x)
        y = soa.apply(variables, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def test_full_mask_equals_no_mask(self, small_model):
        x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 64, 64, 3)), jnp.float32)
        mask = jnp.ones((1, 64, 64), bool)
        v0 = small_model.apply(x)
        v1 = small_model.apply(x, mask)
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-5)

    def test_mask_suppresses_padding(self, small_model):
        rng = np.random.default_rng(3)
        img = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
        canvas = np.zeros((1, 64, 128, 3), np.float32)
        canvas[:, :, :64] = img
        garbage = canvas.copy()
        garbage[:, :, 64:] = 10 * rng.standard_normal((1, 64, 64, 3))
        mask = np.zeros((1, 64, 128), bool)
        mask[:, :, :64] = True

        v_canvas = np.asarray(small_model.apply(jnp.asarray(canvas), jnp.asarray(mask)))
        v_garbage = np.asarray(small_model.apply(jnp.asarray(garbage), jnp.asarray(mask)))
        v_nomask = np.asarray(small_model.apply(jnp.asarray(garbage)))
        v_unpadded = np.asarray(small_model.apply(jnp.asarray(img)))
        # masked: padding content is zeroed at the input -> identical
        np.testing.assert_allclose(v_canvas, v_garbage, atol=1e-5)
        # masked canvas reproduces the unpadded extraction (valid size % 32 == 0)
        assert np.dot(v_canvas[0], v_unpadded[0]) > 0.9999
        # unmasked: garbage dominates
        assert np.dot(v_canvas[0], v_nomask[0]) < 0.99

    def test_meta_contract(self, small_model):
        m = small_model.meta
        assert m["outputdim"] == 2048
        assert m["pooling"] == "gem"
        assert m["soa_layers"] == "45"

    def test_pooling_variants_build(self):
        for pool in ["mac", "spoc", "gemmp"]:
            net = models.init_network(
                {"architecture": "resnet50", "pooling": pool, "soa": False,
                 "whitening": False},
                rng=jax.random.PRNGKey(0),
            )
            v = net.apply(jnp.zeros((1, 64, 64, 3)))
            assert v.shape == (1, 2048)


class TestExtraction:
    def test_multiscale_matches_manual(self, small_model):
        x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 64, 64, 3)), jnp.float32)
        scales = (1.0, 0.5)
        v = models.multiscale_descriptor(small_model.module, small_model.params, x, scales=scales)
        v1 = small_model.apply(x)
        x2 = jax.image.resize(x, (1, 32, 32, 3), "bilinear")
        v2 = small_model.apply(x2)
        manual = (v1 + v2) / 2
        manual = manual / jnp.linalg.norm(manual, axis=1, keepdims=True)
        np.testing.assert_allclose(np.asarray(v), np.asarray(manual), atol=1e-5)
        assert v.shape == (1, 2048)

    def test_extract_fn_jits(self, small_model):
        fn = models.make_extract_fn(small_model.module, scales=(1.0,))
        x = jnp.zeros((2, 64, 64, 3))
        v = fn(small_model.params, x)
        assert v.shape == (2, 2048)

    def test_bf16_extract_matches_f32(self, small_model):
        """compute_dtype=bfloat16 must agree with f32 to ~1e-3 cosine — the
        threshold at which rOx/rPar mAP is unaffected (ranking shifts only
        among near-ties)."""
        f32 = models.make_extract_fn(small_model.module, scales=(1.0,))
        bf16 = models.make_extract_fn(
            small_model.module, scales=(1.0,), compute_dtype=jnp.bfloat16
        )
        x = jnp.asarray(
            np.random.default_rng(11).standard_normal((3, 64, 96, 3)), jnp.float32
        )
        va, vb = np.asarray(f32(small_model.params, x)), np.asarray(
            bf16(small_model.params, x)
        )
        assert vb.dtype == np.float32
        cos = np.sum(va * vb, axis=1)  # both l2-normalized
        assert np.all(cos > 0.999), cos

    def test_sharded_extract(self, small_model):
        mesh = jax.make_mesh((8,), ("data",))
        fn = models.make_sharded_extract_fn(small_model.module, mesh, scales=(1.0,))
        x = jnp.asarray(np.random.default_rng(5).standard_normal((8, 64, 64, 3)), jnp.float32)
        mask = jnp.ones((8, 64, 64), bool)
        v = fn(small_model.params, x, mask)
        assert v.shape == (8, 2048)
        # parity with unsharded
        v_host = np.asarray(v)
        v0 = np.asarray(small_model.apply(x[:1]))
        np.testing.assert_allclose(v_host[0], v0[0], atol=1e-4)


def _flax_to_torch_sd(variables, soa_layers=("soa4", "soa5")):
    """Inverse of the converter: build a torch-layout state dict from our tree."""
    import torch

    params = variables["params"]["features"]
    stats = variables["batch_stats"]["features"]
    sd = {}

    def put(key, arr, conv=False, linear=False):
        a = np.asarray(arr)
        if conv:
            a = np.transpose(a, (3, 2, 0, 1))
        if linear:
            a = a.T
        sd[key] = torch.from_numpy(np.ascontiguousarray(a))

    put("features.conv1.0.weight", params["conv1"]["kernel"], conv=True)
    sd["features.conv1.1.weight"] = torch.from_numpy(np.asarray(params["bn1"]["scale"]))
    sd["features.conv1.1.bias"] = torch.from_numpy(np.asarray(params["bn1"]["bias"]))
    sd["features.conv1.1.running_mean"] = torch.from_numpy(np.asarray(stats["bn1"]["mean"]))
    sd["features.conv1.1.running_var"] = torch.from_numpy(np.asarray(stats["bn1"]["var"]))

    stage_prefix = {1: "conv2_x.2", 2: "conv3_x", 3: "conv4_x", 4: "conv5_x"}
    for name in params:
        if not name.startswith("layer"):
            continue
        layer = int(name[5])
        block = int(name.split("block")[1])
        tp = f"features.{stage_prefix[layer]}.{block}"
        blk_p, blk_s = params[name], stats[name]
        for i in (1, 2, 3):
            put(f"{tp}.conv{i}.weight", blk_p[f"conv{i}"]["kernel"], conv=True)
            sd[f"{tp}.bn{i}.weight"] = torch.from_numpy(np.asarray(blk_p[f"bn{i}"]["scale"]))
            sd[f"{tp}.bn{i}.bias"] = torch.from_numpy(np.asarray(blk_p[f"bn{i}"]["bias"]))
            sd[f"{tp}.bn{i}.running_mean"] = torch.from_numpy(np.asarray(blk_s[f"bn{i}"]["mean"]))
            sd[f"{tp}.bn{i}.running_var"] = torch.from_numpy(np.asarray(blk_s[f"bn{i}"]["var"]))
        if "downsample_conv" in blk_p:
            put(f"{tp}.downsample.0.weight", blk_p["downsample_conv"]["kernel"], conv=True)
            sd[f"{tp}.downsample.1.weight"] = torch.from_numpy(np.asarray(blk_p["downsample_bn"]["scale"]))
            sd[f"{tp}.downsample.1.bias"] = torch.from_numpy(np.asarray(blk_p["downsample_bn"]["bias"]))
            sd[f"{tp}.downsample.1.running_mean"] = torch.from_numpy(np.asarray(blk_s["downsample_bn"]["mean"]))
            sd[f"{tp}.downsample.1.running_var"] = torch.from_numpy(np.asarray(blk_s["downsample_bn"]["var"]))

    for soa in soa_layers:
        if soa not in params:
            continue
        sp, ss = params[soa], stats[soa]
        for proj in ("f", "g"):
            put(f"features.{soa}.{proj}.0.weight", sp[f"{proj}_conv"]["kernel"], conv=True)
            sd[f"features.{soa}.{proj}.0.bias"] = torch.from_numpy(np.asarray(sp[f"{proj}_conv"]["bias"]))
            sd[f"features.{soa}.{proj}.1.weight"] = torch.from_numpy(np.asarray(sp[f"{proj}_bn"]["scale"]))
            sd[f"features.{soa}.{proj}.1.bias"] = torch.from_numpy(np.asarray(sp[f"{proj}_bn"]["bias"]))
            sd[f"features.{soa}.{proj}.1.running_mean"] = torch.from_numpy(np.asarray(ss[f"{proj}_bn"]["mean"]))
            sd[f"features.{soa}.{proj}.1.running_var"] = torch.from_numpy(np.asarray(ss[f"{proj}_bn"]["var"]))
        for proj in ("h", "v"):
            put(f"features.{soa}.{proj}.weight", sp[f"{proj}_conv"]["kernel"], conv=True)
            sd[f"features.{soa}.{proj}.bias"] = torch.from_numpy(np.asarray(sp[f"{proj}_conv"]["bias"]))

    top = variables["params"]
    if "whiten" in top:
        put("whiten.weight", top["whiten"]["kernel"], linear=True)
        sd["whiten.bias"] = torch.from_numpy(np.asarray(top["whiten"]["bias"]))
    if "gem_p" in top:
        import torch as T
        sd["pool.p"] = T.from_numpy(np.asarray(top["gem_p"]).reshape(1).copy())
    return sd


class TestWeightConversion:
    def test_roundtrip_preserves_forward(self, small_model):
        sd = _flax_to_torch_sd(small_model.params)
        converted = W.convert_solar_state_dict(sd)
        W.assert_tree_shapes_match(converted, small_model.params)
        x = jnp.asarray(np.random.default_rng(6).standard_normal((1, 64, 64, 3)), jnp.float32)
        v0 = small_model.apply(x)
        converted = jax.tree.map(jnp.asarray, converted)
        v1 = small_model.module.apply(converted, x)
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-5)

    def test_mismatch_detected(self, small_model):
        sd = _flax_to_torch_sd(small_model.params)
        sd.pop("whiten.weight")
        converted = W.convert_solar_state_dict(sd)
        with pytest.raises(ValueError, match="missing|mismatch"):
            W.assert_tree_shapes_match(converted, small_model.params)
