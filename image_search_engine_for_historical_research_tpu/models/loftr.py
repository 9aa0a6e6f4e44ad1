"""Detector-free local feature matching (LoFTR) in Flax, reference-exact.

TPU-native counterpart of the reference's vendored LoFTR
(``/root/reference/src/utils/src/loftr/``): ResNet-FPN_8_2 backbone
(backbone/resnet_fpn.py), 2-D sine positional encoding (including the
``temp_bug_fix=False`` variant the released outdoor checkpoint was trained
with, utils/position_encoding.py:28-31), a coarse transformer of alternating
self/cross **linear attention** layers (loftr_module/linear_attention.py:14-46,
transformer.py), dual-softmax coarse matching with border removal and mutual
maxima (utils/coarse_matching.py:108-196), window fine preprocessing with
coarse-feature concatenation (loftr_module/fine_preprocess.py), a fine
transformer, and soft-argmax fine matching (utils/fine_matching.py:9-75).

The architecture and parameter layout mirror the torch module tree 1:1 so the
released checkpoints convert via ``convert_loftr_state_dict`` (oracle parity
tested in ``tests/test_loftr_oracle.py``). TPU adaptations: matches are
returned as fixed-size top-``max_matches`` arrays with a confidence mask
(static shapes) instead of boolean indexing, and window extraction is a
vmapped ``dynamic_slice`` instead of ``F.unfold``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Mapping, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .resnet import FrozenBatchNorm


@dataclass(frozen=True)
class LoFTRConfig:
    """Mirror of the reference ``default_cfg`` (utils/cvpr_ds_config.py)."""

    initial_dim: int = 128
    block_dims: Tuple[int, int, int] = (128, 196, 256)
    d_coarse: int = 256
    nhead: int = 8
    coarse_layers: Tuple[str, ...] = ("self", "cross") * 4
    temp_bug_fix: bool = False          # outdoor ckpt uses the buggy PE temp
    d_fine: int = 128
    fine_layers: Tuple[str, ...] = ("self", "cross")
    window: int = 5
    fine_concat_coarse: bool = True
    thr: float = 0.2
    border_rm: int = 2
    temperature: float = 0.1            # dual-softmax temperature
    max_matches: int = 256
    # training-throughput knob (VERDICT r4 #6, mirror of ResNetSOAs.remat):
    # rematerialize each encoder layer in the backward pass — the coarse
    # transformer holds 8 layers of (B, L=Hc*Wc, 256) activations at L=4800,
    # the measured activation-pressure limiter of the LoFTR train step.
    # Inference-only paths never differentiate, so the default stays off.
    remat: bool = False


# ----------------------------------------------------------------- backbone


class BasicBlock(nn.Module):
    """resnet_fpn.py:15-40: two 3x3 convs + BN, 1x1 downsample on stride 2."""

    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.features, (3, 3), strides=self.strides, padding=1,
            use_bias=False, name="conv1",
        )(x)
        y = FrozenBatchNorm(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        if self.strides != 1:
            x = nn.Conv(
                self.features, (1, 1), strides=self.strides,
                use_bias=False, name="downsample_conv",
            )(x)
            x = FrozenBatchNorm(self.features, name="downsample_bn")(x)
        return nn.relu(x + y)


def _upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsample with ``align_corners=True`` (resnet_fpn.py:108,112).

    ``jax.image.resize`` only implements half-pixel centers, so do the
    separable gather-lerp directly: out[i] samples src at ``i*(in-1)/(out-1)``.
    """
    B, H, W, C = x.shape

    def upsample_axis(z, n_in, axis):
        n_out = 2 * n_in
        src = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        frac = (src - lo.astype(jnp.float32))
        zl = jnp.take(z, lo, axis=axis)
        zh = jnp.take(z, hi, axis=axis)
        shape = [1] * z.ndim
        shape[axis] = n_out
        f = frac.reshape(shape).astype(z.dtype)  # keep bf16 compute bf16
        return zl * (1 - f) + zh * f

    x = upsample_axis(x, H, 1)
    return upsample_axis(x, W, 2)


class ResNetFPN82(nn.Module):
    """ResNet+FPN at 1/8 (coarse) and 1/2 (fine) (resnet_fpn.py:43-120)."""

    initial_dim: int = 128
    block_dims: Tuple[int, int, int] = (128, 196, 256)

    @nn.compact
    def __call__(self, x):
        d0, d1, d2 = self.block_dims
        y = nn.Conv(
            self.initial_dim, (7, 7), strides=2, padding=3,
            use_bias=False, name="conv1",
        )(x)
        y = FrozenBatchNorm(self.initial_dim, name="bn1")(y)
        x0 = nn.relu(y)

        x1 = BasicBlock(d0, 1, name="layer1_0")(x0)       # 1/2
        x1 = BasicBlock(d0, 1, name="layer1_1")(x1)
        x2 = BasicBlock(d1, 2, name="layer2_0")(x1)       # 1/4
        x2 = BasicBlock(d1, 1, name="layer2_1")(x2)
        x3 = BasicBlock(d2, 2, name="layer3_0")(x2)       # 1/8
        x3 = BasicBlock(d2, 1, name="layer3_1")(x3)

        x3_out = nn.Conv(d2, (1, 1), use_bias=False, name="layer3_outconv")(x3)

        x3_up = _upsample2x_align_corners(x3_out)
        x2_out = nn.Conv(d2, (1, 1), use_bias=False, name="layer2_outconv")(x2)
        y = x2_out + x3_up
        y = nn.Conv(d2, (3, 3), padding=1, use_bias=False, name="layer2_outconv2_0")(y)
        y = FrozenBatchNorm(d2, name="layer2_outconv2_1")(y)
        y = nn.leaky_relu(y, negative_slope=0.01)
        x2_out = nn.Conv(
            d1, (3, 3), padding=1, use_bias=False, name="layer2_outconv2_3"
        )(y)

        x2_up = _upsample2x_align_corners(x2_out)
        x1_out = nn.Conv(d1, (1, 1), use_bias=False, name="layer1_outconv")(x1)
        y = x1_out + x2_up
        y = nn.Conv(d1, (3, 3), padding=1, use_bias=False, name="layer1_outconv2_0")(y)
        y = FrozenBatchNorm(d1, name="layer1_outconv2_1")(y)
        y = nn.leaky_relu(y, negative_slope=0.01)
        x1_out = nn.Conv(
            d0, (3, 3), padding=1, use_bias=False, name="layer1_outconv2_3"
        )(y)

        return x3_out, x1_out  # coarse 1/8 (d2), fine 1/2 (d0)


def sine_positional_encoding(
    H: int, W: int, d: int, temp_bug_fix: bool = False
) -> np.ndarray:
    """2-D sine PE (position_encoding.py:23-39), channel-interleaved
    [sin x, cos x, sin y, cos y] with 1-based positions. ``temp_bug_fix=False``
    reproduces the released checkpoints' buggy temperature
    ``(-log(1e4)/d)//2`` exactly (:28-31)."""
    pe = np.zeros((H, W, d), np.float32)
    y_pos = np.arange(1, H + 1, dtype=np.float32)[:, None]
    x_pos = np.arange(1, W + 1, dtype=np.float32)[None, :]
    if temp_bug_fix:
        div = np.exp(
            np.arange(0, d // 2, 2, dtype=np.float32) * (-np.log(10000.0) / (d // 2))
        )
    else:
        div = np.exp(
            np.arange(0, d // 2, 2, dtype=np.float32) * (-np.log(10000.0) / d // 2)
        )
    pe[:, :, 0::4] = np.sin(x_pos[..., None] * div)
    pe[:, :, 1::4] = np.cos(x_pos[..., None] * div)
    pe[:, :, 2::4] = np.sin(y_pos[..., None] * div)
    pe[:, :, 3::4] = np.cos(y_pos[..., None] * div)
    return pe


# -------------------------------------------------------------- transformer


class LoFTREncoderLayer(nn.Module):
    """transformer.py:7-59: linear attention + concat-FFN residual update."""

    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, x, source):
        B, L, _ = x.shape
        dh = self.d_model // self.nhead

        q = nn.Dense(self.d_model, use_bias=False, name="q_proj")(x)
        k = nn.Dense(self.d_model, use_bias=False, name="k_proj")(source)
        v = nn.Dense(self.d_model, use_bias=False, name="v_proj")(source)
        q = q.reshape(B, L, self.nhead, dh)
        k = k.reshape(B, -1, self.nhead, dh)
        v = v.reshape(B, -1, self.nhead, dh)

        # elu+1 linear attention (linear_attention.py:14-46); the long L-axis
        # reductions accumulate in f32 (bf16 sums over ~4800 terms drift)
        q = jax.nn.elu(q) + 1.0
        k = jax.nn.elu(k) + 1.0
        s = v.shape[1]
        v = v / s
        kv = jnp.einsum(
            "bshd,bshv->bhdv", k, v, preferred_element_type=jnp.float32
        )
        ksum = jnp.sum(k, axis=1, dtype=jnp.float32)
        z = 1.0 / (jnp.einsum(
            "blhd,bhd->blh", q, ksum.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) + 1e-6)
        msg = jnp.einsum(
            "blhd,bhdv,blh->blhv", q.astype(jnp.float32), kv, z
        ) * s
        msg = msg.reshape(B, L, self.d_model).astype(x.dtype)

        msg = nn.Dense(self.d_model, use_bias=False, name="merge")(msg)
        msg = nn.LayerNorm(name="norm1")(msg)
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(self.d_model * 2, use_bias=False, name="mlp1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, use_bias=False, name="mlp2")(y)
        y = nn.LayerNorm(name="norm2")(y)
        return x + y


class LocalFeatureTransformer(nn.Module):
    """transformer.py:62-103: sequential self/cross updates (feat1's cross
    step consumes the already-updated feat0)."""

    d_model: int
    nhead: int
    layer_names: Tuple[str, ...]
    remat: bool = False

    @nn.compact
    def __call__(self, f0, f1):
        Layer = nn.remat(LoFTREncoderLayer) if self.remat else LoFTREncoderLayer
        for i, kind in enumerate(self.layer_names):
            layer = Layer(self.d_model, self.nhead, name=f"layer{i}")
            if kind == "self":
                f0 = layer(f0, f0)
                f1 = layer(f1, f1)
            else:
                f0 = layer(f0, f1)
                f1 = layer(f1, f0)
        return f0, f1


# ----------------------------------------------------------------- matching


class MatchResult(NamedTuple):
    kpts0: jnp.ndarray  # (max_matches, 2) image-0 coords (x, y)
    kpts1: jnp.ndarray  # (max_matches, 2) refined image-1 coords
    conf: jnp.ndarray   # (max_matches,) dual-softmax confidence (0 if invalid)

    @property
    def num_matches(self):
        return jnp.sum(self.conf > 0)


class LoFTRMatcher(nn.Module):
    """Coarse-to-fine matcher; one image pair per call (loftr.py:12-93)."""

    config: LoFTRConfig = field(default_factory=LoFTRConfig)

    @nn.compact
    def __call__(self, img0, img1):
        """img0/img1: (H, W, 1) grayscale in [0, 1]; H, W divisible by 8."""
        cfg = self.config
        backbone = ResNetFPN82(
            cfg.initial_dim, cfg.block_dims, name="backbone"
        )
        # batch the two images like the reference's same-shape fast path
        feats_c, feats_f = backbone(jnp.stack([img0, img1], axis=0))
        c0, c1 = feats_c[:1], feats_c[1:]
        f0, f1 = feats_f[:1], feats_f[1:]
        Hc, Wc = c0.shape[1:3]
        Hf, Wf = f0.shape[1:3]
        L = Hc * Wc
        d = cfg.d_coarse

        pe = jnp.asarray(
            sine_positional_encoding(Hc, Wc, d, cfg.temp_bug_fix)
        )[None].astype(c0.dtype)  # keep bf16 compute bf16 (f32 would promote)
        t0 = (c0 + pe).reshape(1, L, d)
        t1 = (c1 + pe).reshape(1, L, d)
        t0, t1 = LocalFeatureTransformer(
            d, cfg.nhead, tuple(cfg.coarse_layers), remat=cfg.remat,
            name="loftr_coarse",
        )(t0, t1)

        # dual-softmax coarse matching (coarse_matching.py:108-118); the
        # similarity matmul accumulates in f32 (preferred_element_type) so a
        # bf16 fast path keeps full softmax/threshold precision
        n0 = t0 / d**0.5
        n1 = t1 / d**0.5
        sim = jnp.einsum(
            "blc,bsc->bls", n0, n1, preferred_element_type=jnp.float32
        ) / cfg.temperature
        conf_mat = jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)
        conf_mat = conf_mat[0]  # (L, L)
        self.sow("intermediates", "conf_matrix", conf_mat)

        # threshold + border removal + mutual maxima (:150-196)
        keep = conf_mat > cfg.thr
        b = cfg.border_rm
        if b > 0:
            row_ok = jnp.zeros((Hc, Wc), bool).at[b:-b, b:-b].set(True).reshape(L)
            keep = keep & row_ok[:, None] & row_ok[None, :]
        keep = (
            keep
            & (conf_mat == jnp.max(conf_mat, axis=1, keepdims=True))
            & (conf_mat == jnp.max(conf_mat, axis=0, keepdims=True))
        )
        j_ids = jnp.argmax(jnp.where(keep, conf_mat, -1.0), axis=1)   # (L,)
        row_valid = jnp.any(keep, axis=1)
        conf = jnp.where(row_valid, conf_mat[jnp.arange(L), j_ids], 0.0)

        top_conf, top_i = jax.lax.top_k(conf, min(cfg.max_matches, L))
        top_j = j_ids[top_i]

        # coarse keypoints in image coords (get_coarse_match: idx * scale)
        scale_c = img0.shape[0] // Hc
        x0 = (top_i % Wc).astype(jnp.float32) * scale_c
        y0 = (top_i // Wc).astype(jnp.float32) * scale_c
        x1 = (top_j % Wc).astype(jnp.float32) * scale_c
        y1 = (top_j // Wc).astype(jnp.float32) * scale_c
        kpts0 = jnp.stack([x0, y0], axis=1)
        kpts1_c = jnp.stack([x1, y1], axis=1)

        # --- fine preprocess (fine_preprocess.py): window crops + coarse cat
        W = cfg.window
        half = W // 2
        stride = Hf // Hc
        f0p = jnp.pad(f0[0], ((half, half), (half, half), (0, 0)))
        f1p = jnp.pad(f1[0], ((half, half), (half, half), (0, 0)))

        def crop(fm, i):
            yy = (i // Wc) * stride
            xx = (i % Wc) * stride
            return jax.lax.dynamic_slice(
                fm, (yy, xx, 0), (W, W, fm.shape[-1])
            ).reshape(W * W, fm.shape[-1])

        w0 = jax.vmap(lambda i: crop(f0p, i))(top_i)      # (M, WW, d_fine)
        w1 = jax.vmap(lambda i: crop(f1p, i))(top_j)

        if cfg.fine_concat_coarse:
            c_cat = jnp.concatenate(
                [t0[0][top_i], t1[0][top_j]], axis=0
            )                                              # (2M, d)
            c_win = nn.Dense(cfg.d_fine, name="down_proj")(c_cat)
            merged = nn.Dense(cfg.d_fine, name="merge_feat")(
                jnp.concatenate(
                    [
                        jnp.concatenate([w0, w1], axis=0),
                        jnp.broadcast_to(
                            c_win[:, None, :], (c_win.shape[0], W * W, cfg.d_fine)
                        ),
                    ],
                    axis=-1,
                )
            )
            M = top_i.shape[0]
            w0, w1 = merged[:M], merged[M:]

        w0, w1 = LocalFeatureTransformer(
            cfg.d_fine, cfg.nhead, tuple(cfg.fine_layers), remat=cfg.remat,
            name="loftr_fine",
        )(w0, w1)

        # --- fine matching (fine_matching.py:40-75): center-vs-window softargmax
        center = w0[:, (W * W) // 2, :]                    # (M, d_fine)
        sim_f = jnp.einsum(
            "mc,mrc->mr", center, w1, preferred_element_type=jnp.float32
        ) / cfg.d_fine**0.5
        heat = jax.nn.softmax(sim_f, axis=1)               # (M, WW)
        gx = jnp.linspace(-1.0, 1.0, W)
        grid = jnp.stack(
            [jnp.tile(gx, W), jnp.repeat(gx, W)], axis=1
        )                                                  # (WW, 2) x,y
        coords_norm = heat @ grid                          # (M, 2) in [-1, 1]
        scale_f = img0.shape[0] // Hf
        kpts1 = kpts1_c + coords_norm * half * scale_f

        return MatchResult(kpts0=kpts0, kpts1=kpts1, conf=top_conf)


# -------------------------------------------------------------- conversion


def convert_loftr_state_dict(
    sd: Mapping[str, Any], config: LoFTRConfig = LoFTRConfig()
) -> Dict[str, Any]:
    """Convert a torch LoFTR ``state_dict`` (the released outdoor/indoor ckpt
    layout, possibly with a ``matcher.`` prefix) into our Flax variables."""

    def np_of(t):
        try:
            return t.detach().cpu().numpy()
        except AttributeError:
            return np.asarray(t)

    sd = {
        (k[len("matcher."):] if k.startswith("matcher.") else k): v
        for k, v in sd.items()
    }
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def set_in(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    def conv(src, dst):
        set_in(params, dst + ("kernel",), np.transpose(np_of(sd[src + ".weight"]), (2, 3, 1, 0)))

    def bn(src, dst):
        set_in(params, dst + ("scale",), np_of(sd[src + ".weight"]))
        set_in(params, dst + ("bias",), np_of(sd[src + ".bias"]))
        set_in(stats, dst + ("mean",), np_of(sd[src + ".running_mean"]))
        set_in(stats, dst + ("var",), np_of(sd[src + ".running_var"]))

    def dense(src, dst, bias=True):
        set_in(params, dst + ("kernel",), np_of(sd[src + ".weight"]).T)
        if bias:
            set_in(params, dst + ("bias",), np_of(sd[src + ".bias"]))

    def ln(src, dst):
        set_in(params, dst + ("scale",), np_of(sd[src + ".weight"]))
        set_in(params, dst + ("bias",), np_of(sd[src + ".bias"]))

    B = ("backbone",)
    conv("backbone.conv1", B + ("conv1",))
    bn("backbone.bn1", B + ("bn1",))
    for stage in (1, 2, 3):
        for blk in (0, 1):
            src = f"backbone.layer{stage}.{blk}"
            dst = B + (f"layer{stage}_{blk}",)
            conv(f"{src}.conv1", dst + ("conv1",))
            bn(f"{src}.bn1", dst + ("bn1",))
            conv(f"{src}.conv2", dst + ("conv2",))
            bn(f"{src}.bn2", dst + ("bn2",))
            if f"{src}.downsample.0.weight" in sd:
                conv(f"{src}.downsample.0", dst + ("downsample_conv",))
                bn(f"{src}.downsample.1", dst + ("downsample_bn",))
    for lvl in (3, 2, 1):
        conv(f"backbone.layer{lvl}_outconv", B + (f"layer{lvl}_outconv",))
        if lvl < 3:
            conv(f"backbone.layer{lvl}_outconv2.0", B + (f"layer{lvl}_outconv2_0",))
            bn(f"backbone.layer{lvl}_outconv2.1", B + (f"layer{lvl}_outconv2_1",))
            conv(f"backbone.layer{lvl}_outconv2.3", B + (f"layer{lvl}_outconv2_3",))

    def encoder(src_mod, dst_mod, n_layers):
        for i in range(n_layers):
            src = f"{src_mod}.layers.{i}"
            dst = (dst_mod, f"layer{i}")
            for p in ("q_proj", "k_proj", "v_proj", "merge"):
                dense(f"{src}.{p}", dst + (p,), bias=False)
            dense(f"{src}.mlp.0", dst + ("mlp1",), bias=False)
            dense(f"{src}.mlp.2", dst + ("mlp2",), bias=False)
            ln(f"{src}.norm1", dst + ("norm1",))
            ln(f"{src}.norm2", dst + ("norm2",))

    encoder("loftr_coarse", "loftr_coarse", len(config.coarse_layers))
    encoder("loftr_fine", "loftr_fine", len(config.fine_layers))

    if config.fine_concat_coarse:
        dense("fine_preprocess.down_proj", ("down_proj",))
        dense("fine_preprocess.merge_feat", ("merge_feat",))

    return {"params": params, "batch_stats": stats}


def load_loftr_checkpoint(path: str, config: LoFTRConfig = LoFTRConfig()):
    """Load a released LoFTR ckpt file (``{"state_dict": ...}``) and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return convert_loftr_state_dict(sd, config)


# ------------------------------------------------------------------ drivers


def init_matcher(
    image_shape: Tuple[int, int] = (480, 640),
    rng=None,
    config: LoFTRConfig = None,
    **overrides,
):
    """Build + init a LoFTRMatcher; returns (module, variables)."""
    cfg = config or LoFTRConfig(**overrides)
    m = LoFTRMatcher(config=cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    H, W = image_shape
    dummy = jnp.zeros((H, W, 1), jnp.float32)
    variables = m.init(rng, dummy, dummy)
    return m, variables


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        tree,
    )


def make_match_fn(module, variables, compute_dtype=None):
    """Jitted pair matcher: (img0, img1) -> MatchResult.

    Weights travel as a bound argument (functools.partial over a jitted
    function), not a closure capture: captured arrays are serialized into the
    remote-compile payload (CLAUDE.md gotcha; the LoFTR checkpoint is
    ~45 MB). ``compute_dtype=jnp.bfloat16`` runs the conv/attention stack on
    the MXU bf16 fast path (params/images cast at the jit boundary; the
    dual-softmax similarity, attention reductions and match coordinates stay
    f32-accumulated)."""

    @jax.jit
    def fn(vars_, img0, img1):
        if compute_dtype is not None:
            vars_ = _cast_floats(vars_, compute_dtype)
            img0 = img0.astype(compute_dtype)
            img1 = img1.astype(compute_dtype)
        return module.apply(vars_, img0, img1)

    return partial(fn, variables)


def make_batched_count_fn(module, variables, compute_dtype=None):
    """Jitted pair-BATCHED match counter: (imgs0 (B,H,W,1), imgs1) -> (B,).

    The re-rank driver previously dispatched one device call per (query,
    candidate) pair (Q x b x ~33 ms tunnel round-trips alone at the
    reference's b=60; VERDICT r2 weak #6); whole pair batches vmap into one
    program. Returns only the per-pair surviving-match count — the quantity
    the re-rank sorts by (Reranking.py:126-185). ``compute_dtype`` as in
    ``make_match_fn``."""

    @jax.jit
    def fn(vars_, imgs0, imgs1):
        if compute_dtype is not None:
            vars_ = _cast_floats(vars_, compute_dtype)
            imgs0 = imgs0.astype(compute_dtype)
            imgs1 = imgs1.astype(compute_dtype)

        def one(i0, i1):
            return module.apply(vars_, i0, i1).num_matches

        return jax.vmap(one)(imgs0, imgs1)

    return partial(fn, variables)


def make_banked_count_fn(module, variables, compute_dtype=None):
    """One-dispatch match counter over a device-resident IMAGE BANK.

    ``fn(bank (U,H,W,1), iq (nb,B), ic (nb,B)) -> (nb,B)``: unique images
    upload once, then every pair block of the re-rank runs inside a single
    jitted ``lax.scan`` (pairs gathered from the bank by index) — no per-block
    dispatch round-trips (VERDICT r3 #4, same pattern as the AdaLAM banked
    scan counter). The driver is ``rerank.loftr_rerank(banked=True)``."""

    @jax.jit
    def fn(vars_, bank, iq, ic):
        if compute_dtype is not None:
            vars_ = _cast_floats(vars_, compute_dtype)
            bank = bank.astype(compute_dtype)

        def one(i0, i1):
            return module.apply(vars_, i0, i1).num_matches

        def body(carry, idx):
            bq, bc = idx
            return carry, jax.vmap(one)(bank[bq], bank[bc])

        _, outs = jax.lax.scan(body, 0, (iq, ic))
        return outs

    return partial(fn, variables)
