"""D2-Net dense local features: faithful VGG16 backbone + detection pyramid.

Counterpart of the reference's vendored D2-Net (``/root/reference/src/utils/lib/``,
dead code in its main flow but part of the component inventory):

- ``DenseFeatureExtraction``: the truncated VGG16 of ``model_test.py:6-46``
  (conv1_1..conv3_3 with two 2x2 maxpools, AvgPool2d(2, stride=1),
  dilated conv4_1..conv4_3, optional final ReLU; overall stride 4);
- ``hard_detection``: ``model_test.py:81-130`` — depthwise max AND 3x3 local
  max AND Hessian edge test;
- ``handcrafted_localization``: ``model_test.py:133-187`` — inverse-Hessian
  subpixel step per channel;
- ``process_multiscale``: ``pyramid.py:9-126`` — scales [.5, 1, 2], summed
  upsampled feature maps, banned-mask propagation, displacement gating,
  bilinear descriptor interpolation (``utils.py:74-151``), position upscaling;
- ``convert_d2net_state_dict``: released-checkpoint (torch ``{'model': ...}``)
  converter.

All dense compute (backbone, stencils) is jitted NHWC jax; the pyramid's
data-dependent selection (``torch.nonzero``) runs host-side like the
reference's. A compact stand-in (``DenseFeatureNet`` + soft ``detect_keypoints``)
is kept for cheap tests/pipelines.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------- backbone


class DenseFeatureExtraction(nn.Module):
    """Truncated VGG16 (conv4_3, dilated), NHWC (model_test.py:6-46)."""

    use_relu: bool = True

    @nn.compact
    def __call__(self, x):
        def conv(x, feats, name, dilation=1):
            pad = dilation  # torch padding=1 (or 2 with dilation 2) == SAME
            return nn.Conv(
                feats, (3, 3), padding=[(pad, pad), (pad, pad)],
                kernel_dilation=(dilation, dilation), name=name,
            )(x)

        x = nn.relu(conv(x, 64, "conv1_1"))
        x = nn.relu(conv(x, 64, "conv1_2"))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(x, 128, "conv2_1"))
        x = nn.relu(conv(x, 128, "conv2_2"))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(x, 256, "conv3_1"))
        x = nn.relu(conv(x, 256, "conv3_2"))
        x = nn.relu(conv(x, 256, "conv3_3"))
        # AvgPool2d(2, stride=1): VALID window — shrinks H, W by 1
        x = nn.avg_pool(x, (2, 2), strides=(1, 1))
        x = nn.relu(conv(x, 512, "conv4_1", dilation=2))
        x = nn.relu(conv(x, 512, "conv4_2", dilation=2))
        x = conv(x, 512, "conv4_3", dilation=2)
        if self.use_relu:
            x = nn.relu(x)
        return x


# ------------------------------------------------- stencils (zero-padded 3x3)


def _shift(x, di, dj):
    """Zero-padded shift of (H, W, C): out[i, j] = x[i+di, j+dj]."""
    H, W = x.shape[0], x.shape[1]
    p = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    return jax.lax.dynamic_slice(p, (1 + di, 1 + dj, 0), x.shape)


def _hessian(x):
    """(dii, dij, djj) per channel — the fixed conv filters of
    model_test.py:88-96 (cross-correlation with zero padding)."""
    dii = _shift(x, -1, 0) - 2.0 * x + _shift(x, 1, 0)
    djj = _shift(x, 0, -1) - 2.0 * x + _shift(x, 0, 1)
    dij = 0.25 * (
        _shift(x, -1, -1) - _shift(x, -1, 1) - _shift(x, 1, -1) + _shift(x, 1, 1)
    )
    return dii, dij, djj


@partial(jax.jit, static_argnames=("edge_threshold",))
def hard_detection(feats: jnp.ndarray, edge_threshold: float = 5.0):
    """Boolean (H, W, C) detections (model_test.py:81-130)."""
    is_depth_max = feats == jnp.max(feats, axis=-1, keepdims=True)
    local_max = jax.lax.reduce_window(
        feats, -jnp.inf, jax.lax.max, (3, 3, 1), (1, 1, 1), "SAME"
    )
    is_local_max = feats == local_max

    dii, dij, djj = _hessian(feats)
    det = dii * djj - dij * dij
    tr = dii + djj
    threshold = (edge_threshold + 1) ** 2 / edge_threshold
    is_not_edge = (tr * tr / det <= threshold) & (det > 0)
    return is_depth_max & is_local_max & is_not_edge


@jax.jit
def handcrafted_localization(feats: jnp.ndarray):
    """Subpixel steps (H, W, C, 2) as (step_i, step_j) (model_test.py:133-187)."""
    dii, dij, djj = _hessian(feats)
    det = dii * djj - dij * dij
    inv00 = djj / det
    inv01 = -dij / det
    inv11 = dii / det
    di = 0.5 * (_shift(feats, 1, 0) - _shift(feats, -1, 0))
    dj = 0.5 * (_shift(feats, 0, 1) - _shift(feats, 0, -1))
    step_i = -(inv00 * di + inv01 * dj)
    step_j = -(inv01 * di + inv11 * dj)
    return jnp.stack([step_i, step_j], axis=-1)


# ----------------------------------------------------- resize (torch-exact)


def _resize_bilinear_ac(x: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bilinear align_corners=True resize of (H, W, C) — torch F.interpolate
    semantics (NOT jax.image.resize's half-pixel convention)."""
    H, W = x.shape[:2]
    h, w = size
    yi = np.linspace(0, H - 1, h) if h > 1 else np.zeros(1)
    xi = np.linspace(0, W - 1, w) if w > 1 else np.zeros(1)
    y0 = np.floor(yi).astype(int)
    x0 = np.floor(xi).astype(int)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    wy = (yi - y0)[:, None, None]
    wx = (xi - x0)[None, :, None]
    a = x[np.ix_(y0, x0)]
    b = x[np.ix_(y0, x1)]
    c = x[np.ix_(y1, x0)]
    d = x[np.ix_(y1, x1)]
    return (
        a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
        + c * wy * (1 - wx) + d * wy * wx
    ).astype(x.dtype)


def _resize_nearest(x: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Nearest resize (torch F.interpolate default mode) of (H, W[, C])."""
    H, W = x.shape[:2]
    h, w = size
    yi = np.minimum((np.arange(h) * H / h).astype(int), H - 1)
    xi = np.minimum((np.arange(w) * W / w).astype(int), W - 1)
    return x[np.ix_(yi, xi)]


# ----------------------------------------------------------- the pyramid


def process_multiscale(
    image: np.ndarray,
    module: DenseFeatureExtraction,
    variables,
    scales: Sequence[float] = (0.5, 1.0, 2.0),
    edge_threshold: float = 5.0,
):
    """Multiscale detection (pyramid.py:9-126).

    ``image``: (H, W, 3) float32 (already preprocessed). Returns
    ``(keypoints (N, 3) [i, j, 1/scale] in image coords, scores (N,),
    descriptors (N, 512) L2-normalized)`` — the reference's exact output
    contract (row layout transposed to row-major).
    """
    h_init, w_init = image.shape[:2]
    apply = jax.jit(module.apply)

    all_kpts, all_desc, all_scores = [], [], []
    prev_dense: Optional[np.ndarray] = None
    banned: Optional[np.ndarray] = None

    for idx, scale in enumerate(scales):
        h_level = int(h_init * scale)
        w_level = int(w_init * scale)
        cur = _resize_bilinear_ac(image, (h_level, w_level))

        dense = np.asarray(apply(variables, jnp.asarray(cur)[None])[0])
        h, w = dense.shape[:2]
        if prev_dense is not None:
            dense = dense + _resize_bilinear_ac(prev_dense, (h, w))

        det = np.asarray(
            hard_detection(jnp.asarray(dense), edge_threshold=edge_threshold)
        )
        if banned is not None:
            banned = _resize_nearest(banned.astype(np.float32), (h, w)) > 0
            det = det & ~banned[:, :, None]
            banned = det.any(axis=-1) | banned
        else:
            banned = det.any(axis=-1)

        # torch order: nonzero over (C, H, W)
        cc, ii, jj = np.nonzero(np.transpose(det, (2, 0, 1)))

        disp = np.asarray(handcrafted_localization(jnp.asarray(dense)))
        di = disp[ii, jj, cc, 0]
        dj = disp[ii, jj, cc, 1]
        mask = (np.abs(di) < 0.5) & (np.abs(dj) < 0.5)
        cc, ii, jj = cc[mask], ii[mask], jj[mask]
        fi = ii.astype(np.float32) + di[mask]
        fj = jj.astype(np.float32) + dj[mask]

        # bilinear descriptor interpolation w/ corner validity (utils.py:74+)
        i0, j0 = np.floor(fi).astype(int), np.floor(fj).astype(int)
        i1, j1 = np.ceil(fi).astype(int), np.ceil(fj).astype(int)
        valid = (i0 >= 0) & (j0 >= 0) & (i1 < h) & (j1 < w)
        if not valid.any():
            # reference-faithful: the EmptyTensorError `continue`
            # (pyramid.py:80-84) skips the previous_dense_features update, so
            # feature summation only carries across scales that produced
            # keypoints — NOT an oversight here
            continue
        cc, ii, jj = cc[valid], ii[valid], jj[valid]
        fi, fj = fi[valid], fj[valid]
        i0, j0, i1, j1 = i0[valid], j0[valid], i1[valid], j1[valid]
        wi = fi - i0
        wj = fj - j0
        desc = (
            dense[i0, j0] * ((1 - wi) * (1 - wj))[:, None]
            + dense[i0, j1] * ((1 - wi) * wj)[:, None]
            + dense[i1, j0] * (wi * (1 - wj))[:, None]
            + dense[i1, j1] * (wi * wj)[:, None]
        )
        desc = desc / (np.linalg.norm(desc, axis=1, keepdims=True) + 1e-32)

        # feature-map -> image coords: two x2 upscale steps (stride 4)
        ki = (fi * 2 + 0.5) * 2 + 0.5
        kj = (fj * 2 + 0.5) * 2 + 0.5
        ki = ki * (h_init / h_level)
        kj = kj * (w_init / w_level)
        kpts = np.stack([ki, kj, np.full_like(ki, 1.0 / scale)], axis=1)

        scores = dense[ii, jj, cc] / (idx + 1)

        all_kpts.append(kpts)
        all_desc.append(desc)
        all_scores.append(scores)
        prev_dense = dense

    if not all_kpts:
        return (
            np.zeros((0, 3), np.float32),
            np.zeros((0,), np.float32),
            np.zeros((0, 512), np.float32),
        )
    return (
        np.concatenate(all_kpts).astype(np.float32),
        np.concatenate(all_scores).astype(np.float32),
        np.concatenate(all_desc).astype(np.float32),
    )


# --------------------------------------------------------------- converter

_VGG_LAYERS = [
    (0, "conv1_1"), (2, "conv1_2"),
    (5, "conv2_1"), (7, "conv2_2"),
    (10, "conv3_1"), (12, "conv3_2"), (14, "conv3_3"),
    (17, "conv4_1"), (19, "conv4_2"), (21, "conv4_3"),
]


def convert_d2net_state_dict(sd) -> dict:
    """Torch ``D2Net.state_dict()`` (or the released ckpt's ``['model']``) ->
    flax variables for ``DenseFeatureExtraction`` (OIHW -> HWIO)."""
    params = {}
    for idx, name in _VGG_LAYERS:
        k = f"dense_feature_extraction.model.{idx}"
        w = sd[f"{k}.weight"]
        b = sd[f"{k}.bias"]
        w = np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)
        b = np.asarray(b.detach().cpu().numpy() if hasattr(b, "detach") else b)
        params[name] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(b),
        }
    return {"params": params}


def load_d2net_checkpoint(path: str, use_relu: bool = True):
    """Load a released d2_tf/d2_ots ``.pth`` and return (module, variables)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return DenseFeatureExtraction(use_relu=use_relu), convert_d2net_state_dict(sd)


def init_d2net(use_relu: bool = True, rng=None):
    m = DenseFeatureExtraction(use_relu=use_relu)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = m.init(rng, jnp.zeros((1, 64, 64, 3), jnp.float32))
    return m, variables


def extract_d2net_features(
    module: DenseFeatureExtraction,
    variables,
    image: np.ndarray,
    max_kpts: int = 1024,
    scales: Sequence[float] = (0.5, 1.0, 2.0),
):
    """Image -> padded ``LocalFeatures`` (top-``max_kpts`` by score) for the
    geometric verifier, through the faithful multiscale pipeline."""
    from ..rerank.geometric import MAX_KPTS, LocalFeatures

    kpts, scores, desc = process_multiscale(image, module, variables, scales)
    order = np.argsort(-scores)[: min(max_kpts, MAX_KPTS)]
    n = len(order)
    out = LocalFeatures(
        xy=np.zeros((MAX_KPTS, 2), np.float32),
        scale=np.zeros((MAX_KPTS,), np.float32),
        angle=np.zeros((MAX_KPTS,), np.float32),
        desc=np.zeros((MAX_KPTS, 128), np.float32),
        count=n,
        shape=tuple(image.shape[:2]),
    )
    out.xy[:n] = kpts[order][:, [1, 0]]  # (x, y) convention
    out.scale[:n] = kpts[order][:, 2]
    d = desc[order]
    w = min(d.shape[1], 128)
    out.desc[:n, :w] = d[:, :w]
    norms = np.linalg.norm(out.desc[:n], axis=1, keepdims=True)
    out.desc[:n] /= np.maximum(norms, 1e-12)
    return out


# ------------------------------------------- compact stand-in (soft rule)


class DenseFeatureNet(nn.Module):
    """Small conv stack -> (H/4, W/4, dim) dense descriptor map."""

    dim: int = 128

    @nn.compact
    def __call__(self, x):
        for feats, stride in [(32, 1), (32, 2), (64, 1), (64, 2), (self.dim, 1)]:
            x = nn.Conv(feats, (3, 3), strides=stride)(x)
            x = nn.relu(x)
        return x


@partial(jax.jit, static_argnames=("max_kpts", "window"))
def detect_keypoints(features: jnp.ndarray, max_kpts: int = 512, window: int = 3):
    """Soft D2-Net detection score (model.py:63-87 training-time rule).

    score(i, j) = max_c [ alpha_c(i, j) * beta_c(i, j) ] where alpha is the
    soft local-max of channel c in a ``window`` neighbourhood and beta the
    channel ratio D_c / max_k D_k. Returns (xy (max_kpts, 2) in feature-map
    coords, scores, descriptors (max_kpts, dim) L2-normalized).
    """
    H, W, C = features.shape
    d = features

    # alpha: exp(D) / local-sum(exp(D)) (soft local-max)
    e = jnp.exp(d - jnp.max(d))
    local_sum = jax.lax.reduce_window(
        e, 0.0, jax.lax.add,
        (window, window, 1), (1, 1, 1), "SAME",
    )
    alpha = e / (local_sum + 1e-12)
    beta = d / (jnp.max(d, axis=-1, keepdims=True) + 1e-12)
    score = jnp.max(alpha * beta, axis=-1)  # (H, W)

    flat = score.reshape(-1)
    top_s, top_i = jax.lax.top_k(flat, min(max_kpts, flat.shape[0]))
    ys = (top_i // W).astype(jnp.float32)
    xs = (top_i % W).astype(jnp.float32)
    desc = d.reshape(-1, C)[top_i]
    desc = desc / (jnp.linalg.norm(desc, axis=1, keepdims=True) + 1e-12)
    return jnp.stack([xs, ys], axis=1), top_s, desc


def extract_dense_features(
    module: DenseFeatureNet,
    variables,
    image: jnp.ndarray,
    max_kpts: int = 512,
    stride: int = 4,
):
    """Image (H, W, C) -> LocalFeatures (image coordinates at the net stride)."""
    from ..rerank.geometric import MAX_KPTS, LocalFeatures

    feats = module.apply(variables, image[None])[0]
    xy, scores, desc = detect_keypoints(feats, max_kpts=max_kpts)
    xy = np.asarray(xy) * stride
    desc = np.asarray(desc)
    n = min(max_kpts, MAX_KPTS, desc.shape[0])

    out = LocalFeatures(
        xy=np.zeros((MAX_KPTS, 2), np.float32),
        scale=np.zeros((MAX_KPTS,), np.float32),
        angle=np.zeros((MAX_KPTS,), np.float32),
        desc=np.zeros((MAX_KPTS, 128), np.float32),
        count=n,
        shape=tuple(image.shape[:2]),
    )
    out.xy[:n] = xy[:n]
    out.scale[:n] = float(stride)
    dd = desc[:n]
    if dd.shape[1] != 128:  # pad/truncate to the verifier's width
        w = min(dd.shape[1], 128)
        out.desc[:n, :w] = dd[:, :w]
    else:
        out.desc[:n] = dd
    return out


def init_dense_net(dim: int = 128, rng=None):
    m = DenseFeatureNet(dim=dim)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = m.init(rng, jnp.zeros((1, 64, 64, 3), jnp.float32))
    return m, variables
