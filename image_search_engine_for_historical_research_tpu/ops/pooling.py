"""Global-descriptor pooling ops over CNN feature maps.

TPU-native counterparts of the reference pooling functions
(``/root/reference/src/layers/functional.py:10-122``): MAC, SPoC, GeM (scalar and
per-channel ``p``), R-MAC, and regional ``roipool``.

Conventions: feature maps are **NHWC** ``(batch, H, W, C)`` (the TPU-friendly
layout; the reference uses torch NCHW). All functions reduce the spatial axes and
return ``(batch, C)`` (or ``(batch, R, C)`` for ``roipool``). Everything is pure
and differentiable; GeM's ``p`` may be a traced scalar or a ``(C,)`` vector, so it
can be a learnable parameter exactly like the reference's ``GeM``/``GeMmp`` modules
(``/root/reference/src/layers/pooling.py``).

R-MAC's region grid depends only on the (static-under-jit) spatial shape, so it is
computed in Python at trace time and compiles to a fixed set of slices — no dynamic
shapes reach XLA.
"""

from __future__ import annotations

import math
from typing import Callable, List, Tuple

import jax.numpy as jnp

from .normalization import l2n

EPS = 1e-6


def _expand_mask(mask, x):
    """(B, H, W) -> (B, H, W, 1) float mask in x.dtype."""
    return mask.astype(x.dtype)[..., None]


def mac(x: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Maximum-activation-of-convolutions pooling (functional.py:10-12).

    ``mask`` (B, H, W) boolean restricts the max to valid (non-padded) positions;
    the reference has no mask because it extracts one variable-sized image at a
    time — masked batched pooling is the TPU-native equivalent.
    """
    if mask is None:
        return jnp.max(x, axis=(1, 2))
    neg = jnp.asarray(-jnp.inf, x.dtype)
    return jnp.max(jnp.where(mask[..., None], x, neg), axis=(1, 2))


def spoc(x: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Sum(mean)-pooling of convolutions (functional.py:15-17)."""
    if mask is None:
        return jnp.mean(x, axis=(1, 2))
    m = _expand_mask(mask, x)
    return jnp.sum(x * m, axis=(1, 2)) / jnp.clip(
        jnp.sum(m, axis=(1, 2)), min=1.0
    )


def gem(x: jnp.ndarray, p=3.0, eps: float = EPS, mask=None) -> jnp.ndarray:
    """Generalized-mean pooling (functional.py:20-22).

    ``avg(clip(x, eps)^p)^(1/p)``. ``p`` may be a python/traced scalar (GeM) or a
    ``(C,)`` array for per-channel multi-p (GeMmp, pooling.py:55-66). ``mask``
    (B, H, W) averages over valid positions only.
    """
    p = jnp.asarray(p, dtype=x.dtype)
    clipped = jnp.clip(x, min=eps)
    powered = jnp.power(clipped, p)
    if mask is None:
        pooled = jnp.mean(powered, axis=(1, 2))
    else:
        m = _expand_mask(mask, x)
        pooled = jnp.sum(powered * m, axis=(1, 2)) / jnp.clip(
            jnp.sum(m, axis=(1, 2)), min=1.0
        )
        # fully-masked rows would give 0^(1/p) (NaN grad); floor at the clamp
        # value eps^p so they match the unmasked all-zero-channel result of eps
        pooled = jnp.clip(pooled, min=jnp.power(jnp.asarray(eps, x.dtype), p))
    return jnp.power(pooled, 1.0 / p)


def _rmac_grid(H: int, W: int, L: int) -> List[Tuple[int, int, int]]:
    """Static R-MAC region grid: list of (row, col, side) square regions.

    Mirrors the region-layout math of the reference ``rmac``
    (functional.py:25-62): squares of side ``floor(2*min(H,W)/(l+1))`` for levels
    ``l = 1..L``, spread uniformly with ~40% target overlap; the long image
    dimension receives ``idx+1`` extra regions, where ``idx`` picks the candidate
    region count in [2..7] whose overlap is closest to 0.4.
    """
    # pure host math on the STATIC H/W: jnp here would turn the grid into a
    # traced value and break any caller under jit (e.g. the regional
    # training step), where H/W are Python ints anyway
    ovr = 0.4
    steps = [2, 3, 4, 5, 6, 7]

    w = min(W, H)
    idx = min(
        range(len(steps)),
        key=lambda i: abs(
            (w**2 - w * ((max(H, W) - w) / (steps[i] - 1))) / w**2 - ovr
        ),
    )

    Wd = idx + 1 if H < W else 0
    Hd = idx + 1 if H > W else 0

    regions: List[Tuple[int, int, int]] = []
    for l in range(1, L + 1):
        wl = math.floor(2 * w / (l + 1))
        if wl == 0:
            continue
        wl2 = math.floor(wl / 2 - 1)

        b = 0 if l + Wd == 1 else (W - wl) / (l + Wd - 1)
        cenW = [math.floor(wl2 + i * b) - wl2 for i in range(l - 1 + Wd + 1)]
        b = 0 if l + Hd == 1 else (H - wl) / (l + Hd - 1)
        cenH = [math.floor(wl2 + i * b) - wl2 for i in range(l - 1 + Hd + 1)]

        for i_ in cenH:
            for j_ in cenW:
                regions.append((int(i_), int(j_), wl))
    return regions


def rmac(x: jnp.ndarray, L: int = 3, eps: float = EPS) -> jnp.ndarray:
    """Regional-MAC pooling (functional.py:25-74).

    Full-image MAC plus the sum of L2-normalized per-region MACs over the static
    region grid. Returns ``(batch, C)``.
    """
    H, W = x.shape[1], x.shape[2]
    v = l2n(mac(x), eps)
    for (i, j, wl) in _rmac_grid(H, W, L):
        region = x[:, i : i + wl, j : j + wl, :]
        v = v + l2n(mac(region), eps)
    return v


def roipool(
    x: jnp.ndarray,
    rpool: Callable[[jnp.ndarray], jnp.ndarray],
    L: int = 3,
    eps: float = EPS,
) -> jnp.ndarray:
    """Regional pooling over the R-MAC grid (functional.py:77-122).

    Applies ``rpool`` (any of the poolers above, e.g. a bound ``gem``) to the whole
    map and to every region; returns the stacked ``(batch, R, C)`` tensor, region 0
    being the full image — the input of the reference's ``Rpool`` regional
    whitening (pooling.py:69-113).
    """
    H, W = x.shape[1], x.shape[2]
    vecs = [rpool(x)]
    for (i, j, wl) in _rmac_grid(H, W, L):
        vecs.append(rpool(x[:, i : i + wl, j : j + wl, :]))
    return jnp.stack(vecs, axis=1)
