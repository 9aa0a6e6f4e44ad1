"""Dense CNN local features with soft keypoint detection (D2-Net-class).

Counterpart of the reference's vendored D2-Net (``/root/reference/src/utils/lib/``:
``model.py:8-60`` dense VGG16 conv4_3 features, ``model_test.py`` soft local-max
detection, ``pyramid.py`` multiscale) — dead code in the reference's main flow
but part of its component inventory. Here: a compact conv backbone plus the
D2-Net detection rule — soft local-max over a spatial window times a
per-channel ratio score — implemented as pure array ops, emitting the same
``LocalFeatures`` structure the geometric verifier consumes.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


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
    """D2-Net soft detection (lib/model_test.py semantics).

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
    import numpy as np

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
