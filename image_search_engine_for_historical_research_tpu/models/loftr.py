"""Detector-free local feature matching (LoFTR-class) in Flax.

TPU-native counterpart of the reference's vendored LoFTR
(``/root/reference/src/utils/src/loftr/``, ~1.4k LoC torch): ResNet-FPN
backbone (backbone/resnet_fpn.py), sine positional encoding, a coarse
transformer of alternating self/cross **linear attention** layers
(loftr_module/linear_attention.py:14-40, transformer.py), dual-softmax coarse
matching (utils/coarse_matching.py) and window fine matching with a soft-argmax
(utils/fine_matching.py:9-40). Default hyperparameters follow the reference
config (utils/cvpr_ds_config.py): d_model 256, 8 heads, 4 self/cross layer
pairs, fine window 5, dual-softmax temperature 0.1.

TPU adaptations: everything is static-shape — matches are returned as fixed-size
top-``max_matches`` arrays with a validity mask instead of boolean indexing, and
the match count (what the re-ranker sorts by, Reranking.py:175-176) is the sum
of confidences over threshold.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


# ----------------------------------------------------------------- backbone


class ConvBNRelu(nn.Module):
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=self.strides, use_bias=False)(x)
        x = nn.GroupNorm(num_groups=8)(x)
        return nn.relu(x)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        y = ConvBNRelu(self.features, self.strides)(x)
        y = nn.Conv(self.features, (3, 3), use_bias=False)(y)
        y = nn.GroupNorm(num_groups=8)(y)
        if x.shape[-1] != self.features or self.strides != 1:
            x = nn.Conv(self.features, (1, 1), strides=self.strides, use_bias=False)(x)
        return nn.relu(x + y)


class ResNetFPN(nn.Module):
    """Small ResNet-FPN producing 1/8 coarse and 1/2 fine feature maps
    (backbone/resnet_fpn.py semantics; block counts reduced for TPU tests)."""

    dims: Tuple[int, int, int] = (64, 96, 128)
    d_coarse: int = 256
    d_fine: int = 128

    @nn.compact
    def __call__(self, x):
        c1 = ConvBNRelu(self.dims[0], strides=2)(x)     # 1/2
        c1 = BasicBlock(self.dims[0])(c1)
        c2 = BasicBlock(self.dims[1], strides=2)(c1)    # 1/4
        c2 = BasicBlock(self.dims[1])(c2)
        c3 = BasicBlock(self.dims[2], strides=2)(c2)    # 1/8
        c3 = BasicBlock(self.dims[2])(c3)

        coarse = nn.Conv(self.d_coarse, (1, 1))(c3)     # 1/8
        # FPN top-down for the fine map at 1/2
        up3 = jax.image.resize(c3, c2.shape[:3] + (c3.shape[-1],), "bilinear")
        f2 = ConvBNRelu(self.dims[1])(jnp.concatenate([c2, up3], axis=-1))
        up2 = jax.image.resize(f2, c1.shape[:3] + (f2.shape[-1],), "bilinear")
        f1 = ConvBNRelu(self.dims[0])(jnp.concatenate([c1, up2], axis=-1))
        fine = nn.Conv(self.d_fine, (1, 1))(f1)         # 1/2
        return coarse, fine


def sine_positional_encoding(H: int, W: int, d: int) -> jnp.ndarray:
    """2-D sine PE (loftr position_encoding.py)."""
    d_quarter = d // 4
    y = jnp.arange(H, dtype=jnp.float32)[:, None]
    x = jnp.arange(W, dtype=jnp.float32)[None, :]
    div = jnp.exp(
        jnp.arange(d_quarter, dtype=jnp.float32) * (-jnp.log(10000.0) / d_quarter)
    )
    pe_x = jnp.stack(
        [jnp.sin(x[..., None] * div), jnp.cos(x[..., None] * div)], axis=-1
    ).reshape(1, W, d_quarter * 2)
    pe_y = jnp.stack(
        [jnp.sin(y[..., None] * div), jnp.cos(y[..., None] * div)], axis=-1
    ).reshape(H, 1, d_quarter * 2)
    pe = jnp.concatenate(
        [jnp.broadcast_to(pe_x, (H, W, d_quarter * 2)),
         jnp.broadcast_to(pe_y, (H, W, d_quarter * 2))], axis=-1
    )
    return pe  # (H, W, d)


# -------------------------------------------------------------- transformer


class LinearAttention(nn.Module):
    """elu(.)+1 linear attention (linear_attention.py:14-40): O(N d^2)."""

    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, x, source):
        B, N, _ = x.shape
        M = source.shape[1]
        dh = self.d_model // self.nhead

        def proj(z, name):
            return nn.Dense(self.d_model, name=name)(z).reshape(
                z.shape[0], z.shape[1], self.nhead, dh
            )

        q = jax.nn.elu(proj(x, "q")) + 1.0
        k = jax.nn.elu(proj(source, "k")) + 1.0
        v = proj(source, "v")

        kv = jnp.einsum("bmhd,bmhe->bhde", k, v)          # (B, h, dh, dh)
        z = 1.0 / (jnp.einsum("bnhd,bhd->bnh", q, k.sum(axis=1)) + 1e-6)
        out = jnp.einsum("bnhd,bhde,bnh->bnhe", q, kv, z)
        out = out.reshape(B, N, self.d_model)

        # merge + FFN with pre/post norms (transformer.py LoFTREncoderLayer)
        msg = nn.Dense(self.d_model, name="merge")(out)
        msg = nn.LayerNorm()(msg)
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(self.d_model * 2, name="ffn1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, name="ffn2")(y)
        return x + nn.LayerNorm()(y)


class CoarseTransformer(nn.Module):
    """Alternating self/cross layers over both images' coarse tokens."""

    d_model: int = 256
    nhead: int = 8
    layers: int = 4

    @nn.compact
    def __call__(self, f0, f1):
        for i in range(self.layers):
            sa = LinearAttention(self.d_model, self.nhead, name=f"self{i}")
            f0 = sa(f0, f0)
            f1 = sa(f1, f1)
            ca = LinearAttention(self.d_model, self.nhead, name=f"cross{i}")
            f0n = ca(f0, f1)
            f1n = ca(f1, f0)
            f0, f1 = f0n, f1n
        return f0, f1


# ----------------------------------------------------------------- matching


class MatchResult(NamedTuple):
    kpts0: jnp.ndarray  # (max_matches, 2) image-0 coords (x, y), refined
    kpts1: jnp.ndarray  # (max_matches, 2)
    conf: jnp.ndarray   # (max_matches,) dual-softmax confidence (0 if invalid)

    @property
    def num_matches(self):
        return jnp.sum(self.conf > 0)


class LoFTRMatcher(nn.Module):
    """Coarse-to-fine dense matcher; one image pair per call (vmap for batch)."""

    d_model: int = 256
    d_fine: int = 128
    nhead: int = 8
    layers: int = 4
    temperature: float = 0.1
    conf_threshold: float = 0.2
    max_matches: int = 256
    fine_window: int = 5

    @nn.compact
    def __call__(self, img0, img1):
        """img0/img1: (H, W, 1) grayscale in [0, 1]; H, W divisible by 8."""
        backbone = ResNetFPN(d_coarse=self.d_model, d_fine=self.d_fine)
        c0, fine0 = backbone(img0[None])
        c1, fine1 = backbone(img1[None])
        Hc, Wc = c0.shape[1:3]
        N = Hc * Wc

        pe = sine_positional_encoding(Hc, Wc, self.d_model)[None]
        t0 = (c0 + pe).reshape(1, N, self.d_model)
        t1 = (c1 + pe).reshape(1, N, self.d_model)
        t0, t1 = CoarseTransformer(self.d_model, self.nhead, self.layers)(t0, t1)

        # dual-softmax coarse matching (coarse_matching.py)
        sim = jnp.einsum("bnd,bmd->bnm", t0, t1) / (
            self.d_model ** 0.5 * self.temperature
        )
        p = jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)
        p = p[0]  # (N, N)

        # mutual-max selection
        best1 = jnp.argmax(p, axis=1)           # for each i in img0
        best0 = jnp.argmax(p, axis=0)           # for each j in img1
        mutual = best0[best1] == jnp.arange(N)
        conf = p[jnp.arange(N), best1] * mutual
        conf = jnp.where(conf > self.conf_threshold, conf, 0.0)

        top_conf, top_i = jax.lax.top_k(conf, min(self.max_matches, N))
        top_j = best1[top_i]

        grid_x = (top_i % Wc).astype(jnp.float32)
        grid_y = (top_i // Wc).astype(jnp.float32)
        grid_x1 = (top_j % Wc).astype(jnp.float32)
        grid_y1 = (top_j // Wc).astype(jnp.float32)

        # fine refinement: correlate fine features in a window around the
        # coarse match on image-1 and take a soft-argmax (fine_matching.py)
        scale = 4  # fine map is 1/2, coarse 1/8
        w = self.fine_window
        half = w // 2

        f0 = fine0[0]
        f1 = fine1[0]

        def refine(cx0, cy0, cx1, cy1):
            x0, y0 = (cx0 * scale).astype(jnp.int32), (cy0 * scale).astype(jnp.int32)
            x1, y1 = (cx1 * scale).astype(jnp.int32), (cy1 * scale).astype(jnp.int32)
            center = f0[y0, x0]                               # (d_fine,)
            patch = jax.lax.dynamic_slice(
                jnp.pad(f1, ((half, half), (half, half), (0, 0))),
                (y1, x1, 0), (w, w, f1.shape[-1]),
            )
            heat = jax.nn.softmax(
                (patch @ center).reshape(-1) / (f1.shape[-1] ** 0.5)
            ).reshape(w, w)
            dy = jnp.sum(heat * (jnp.arange(w, dtype=jnp.float32)[:, None] - half))
            dx = jnp.sum(heat * (jnp.arange(w, dtype=jnp.float32)[None, :] - half))
            return dx, dy

        dx, dy = jax.vmap(refine)(grid_x, grid_y, grid_x1, grid_y1)

        # to original image coordinates (coarse stride 8, fine stride 2)
        kpts0 = jnp.stack([grid_x * 8 + 4, grid_y * 8 + 4], axis=1)
        kpts1 = jnp.stack(
            [grid_x1 * 8 + 4 + dx * 2, grid_y1 * 8 + 4 + dy * 2], axis=1
        )
        return MatchResult(kpts0=kpts0, kpts1=kpts1, conf=top_conf)


def init_matcher(
    image_shape: Tuple[int, int] = (480, 640), rng=None, **kwargs
):
    """Build + init a LoFTRMatcher; returns (module, variables)."""
    m = LoFTRMatcher(**kwargs)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    H, W = image_shape
    dummy = jnp.zeros((H, W, 1), jnp.float32)
    variables = m.init(rng, dummy, dummy)
    return m, variables


def make_match_fn(module, variables):
    """Jitted pair matcher: (img0, img1) -> MatchResult."""

    @jax.jit
    def fn(img0, img1):
        return module.apply(variables, img0, img1)

    return fn
