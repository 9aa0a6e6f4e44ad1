import numpy as np
import jax.numpy as jnp
import pytest

import image_search_engine_for_historical_research_tpu.ops as ops


def rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


class TestBasicPooling:
    def test_mac(self):
        x = rand(2, 5, 7, 3)
        out = np.asarray(ops.mac(jnp.asarray(x)))
        np.testing.assert_allclose(out, x.max(axis=(1, 2)), rtol=1e-6)

    def test_spoc(self):
        x = rand(2, 5, 7, 3)
        out = np.asarray(ops.spoc(jnp.asarray(x)))
        np.testing.assert_allclose(out, x.mean(axis=(1, 2)), rtol=1e-5)

    def test_gem_scalar_p(self):
        x = np.abs(rand(2, 4, 4, 8)) + 0.1
        p = 3.0
        out = np.asarray(ops.gem(jnp.asarray(x), p))
        expected = (np.clip(x, 1e-6, None) ** p).mean(axis=(1, 2)) ** (1.0 / p)
        np.testing.assert_allclose(out, expected, rtol=1e-4)

    def test_gem_clamps_negatives(self):
        x = -np.abs(rand(1, 3, 3, 2)) - 0.5  # all negative
        out = np.asarray(ops.gem(jnp.asarray(x), 3.0))
        # clamp(eps) of negatives -> eps, so the pooled value is eps
        np.testing.assert_allclose(out, np.full((1, 2), 1e-6), rtol=1e-3)

    def test_gem_per_channel_p(self):
        x = np.abs(rand(2, 4, 4, 3)) + 0.1
        p = np.array([2.0, 3.0, 4.0], np.float32)
        out = np.asarray(ops.gem(jnp.asarray(x), jnp.asarray(p)))
        expected = np.stack(
            [
                (x[..., c] ** p[c]).mean(axis=(1, 2)) ** (1.0 / p[c])
                for c in range(3)
            ],
            axis=-1,
        )
        np.testing.assert_allclose(out, expected, rtol=1e-4)

    def test_gem_p1_is_spoc_positive_input(self):
        x = np.abs(rand(2, 6, 6, 4)) + 0.1
        out = np.asarray(ops.gem(jnp.asarray(x), 1.0))
        np.testing.assert_allclose(out, x.mean(axis=(1, 2)), rtol=1e-5)

    def test_gem_large_p_approaches_mac(self):
        x = np.abs(rand(1, 8, 8, 4)) + 0.1
        out = np.asarray(ops.gem(jnp.asarray(x), 64.0))
        np.testing.assert_allclose(out, x.max(axis=(1, 2)), rtol=0.1)


def _l2n_np(v, eps=1e-6):
    return v / (np.linalg.norm(v, axis=-1, keepdims=True) + eps)


def _rmac_square_expected(x, L=3):
    """Independent oracle for square feature maps (Wd=Hd=0 path).

    For H == W the reference grid (functional.py:49-72) reduces to: level l has
    l x l regions of side floor(2H/(l+1)) whose top-left corners are
    floor(i*(H-wl)/(l-1)) (single centered region when l == 1).
    """
    import math

    N, H, W, C = x.shape
    assert H == W
    v = _l2n_np(x.max(axis=(1, 2)))
    for l in range(1, L + 1):
        wl = math.floor(2 * H / (l + 1))
        if wl == 0:
            continue
        wl2 = math.floor(wl / 2 - 1)
        if l == 1:
            starts = [0]
        else:
            b = (H - wl) / (l - 1)
            starts = [math.floor(wl2 + i * b) - wl2 for i in range(l)]
        for i in starts:
            for j in starts:
                region = x[:, i : i + wl, j : j + wl, :]
                v = v + _l2n_np(region.max(axis=(1, 2)))
    return v


class TestRMAC:
    def test_square_matches_oracle(self):
        x = rand(2, 12, 12, 6)
        out = np.asarray(ops.rmac(jnp.asarray(x)))
        np.testing.assert_allclose(out, _rmac_square_expected(x), rtol=1e-5)

    @pytest.mark.parametrize("H,W", [(8, 14), (14, 8), (10, 10), (7, 23)])
    def test_shapes_and_finiteness(self, H, W):
        x = rand(1, H, W, 4)
        out = np.asarray(ops.rmac(jnp.asarray(x)))
        assert out.shape == (1, 4)
        assert np.all(np.isfinite(out))

    def test_roipool_region_zero_is_global(self):
        x = rand(2, 12, 12, 6)
        pooled = np.asarray(ops.roipool(jnp.asarray(x), lambda a: ops.gem(a, 3.0)))
        assert pooled.ndim == 3 and pooled.shape[0] == 2 and pooled.shape[2] == 6
        np.testing.assert_allclose(
            pooled[:, 0, :], np.asarray(ops.gem(jnp.asarray(x), 3.0)), rtol=1e-5
        )


class TestNormalization:
    def test_l2n_rows(self):
        x = rand(4, 16)
        out = np.asarray(ops.l2n(jnp.asarray(x)))
        np.testing.assert_allclose(
            out, x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-6), rtol=1e-6
        )
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-4)

    def test_powerlaw(self):
        x = rand(4, 8)
        out = np.asarray(ops.powerlaw(jnp.asarray(x)))
        xe = x + 1e-6
        np.testing.assert_allclose(out, np.sign(xe) * np.sqrt(np.abs(xe)), rtol=1e-5)
