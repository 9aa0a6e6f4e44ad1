"""TPU-native SIFT: batched DoG keypoints + descriptors as one jitted program.

The reference's SAHA re-ranking consumes OpenCV SIFT features — extracted on
the host, one image at a time (``/root/reference/src/utils/Reranking.py:
657-667`` resizes to 1000x1000 and runs ``cv2.SIFT_create``; the offline
extraction half is not even in the reference repo, only its hard-coded .npy
paths at ``Reranking.py:87-88``). At ~50 ms/image single-threaded that is
days of host time for a 1M gallery. This module computes SIFT (Lowe, IJCV
2004) on TPU instead: a whole image batch runs the Gaussian/DoG pyramid,
extrema detection, orientation assignment and descriptor pooling as ONE
jitted program of convolutions, top-k and dense matmuls.

TPU-first formulation (no data-dependent shapes anywhere):
- the scale-space pyramid is separable depthwise convolutions; extrema tests
  are shifted-window comparisons (VPU elementwise), not per-pixel loops;
- keypoint selection is ``lax.top_k`` over masked refined-contrast scores
  with a FIXED per-octave budget (invalid slots carry score -inf);
- per-keypoint windows are vmapped ``dynamic_slice`` patches (the level index
  is a dynamic slice start into the stacked pyramid — no branching);
- orientation histograms and the (4, 4, 8) descriptor are built with one-hot
  / hat-weight MATMULS (``einsum`` outer products), never scatter-adds — the
  TPU's scalar unit is the bottleneck for scatters (CLAUDE.md), the MXU is
  free;
- per-image keypoint counts vary only through validity masks, so shapes are
  identical across images and the program is trivially vmappable/shardable.

Deliberate divergences from OpenCV (documented, quality-tested in
``tests/test_sift.py`` rather than bit-compared):
- no initial 2x upsampled octave (OpenCV's ``firstOctave=-1``) — halves the
  FLOP budget; fine-scale keypoints below sigma 1.6 are dropped;
- one Newton step of subpixel refinement with clamped offsets instead of
  OpenCV's up-to-5-step re-localization loop;
- secondary-orientation duplicates (histogram peaks >= 0.8 * max, like
  OpenCV) compete with weaker detections for the same fixed budget instead
  of growing the keypoint list;
- Gaussian blurs use edge-replicate padding, OpenCV reflects.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# --- Lowe's constants (values as in the paper / OpenCV defaults) ------------
SIGMA0 = 1.6          # base scale of each octave
S = 3                 # intervals per octave (=> 6 gaussian / 5 DoG levels)
CONTRAST_THR = 0.04   # refined-contrast threshold (image range [0, 1])
EDGE_R = 10.0         # edge-response (Hessian ratio) threshold
N_ORI_BINS = 36
ORI_SIGMA_FACTOR = 1.5        # orientation window sigma = 1.5 * sigma_oct
ORI_RADIUS_FACTOR = 4.5       # orientation window radius = 3 * 1.5 * sigma
DESC_D = 4                    # descriptor spatial bins per side
DESC_B = 8                    # orientation bins
DESC_HIST_WIDTH = 3.0         # cell width = 3 * sigma_oct
DESC_SAMPLES = 16             # sample lattice per side (4 per cell)
PATCH = 72                    # per-keypoint window (covers max descriptor radius)
HALF = PATCH // 2


def _gauss_kernel1d(sigma: float) -> np.ndarray:
    r = max(1, int(math.ceil(4.0 * sigma)))
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Separable Gaussian blur, edge-replicate padding. img: (B, H, W)."""
    k = jnp.asarray(kernel)
    r = (k.shape[0] - 1) // 2
    x = img[:, None]                                      # (B, 1, H, W)
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    x = jnp.pad(x, ((0, 0), (0, 0), (r, r), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (r, r)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    return x[:, 0]


def gaussian_octave(base: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) at sigma = SIGMA0 -> (B, L=S+3, H, W) gaussian levels."""
    levels = [base]
    for l in range(1, S + 3):
        s_prev = SIGMA0 * (2.0 ** ((l - 1) / S))
        s_cur = SIGMA0 * (2.0 ** (l / S))
        levels.append(_blur(levels[-1], _gauss_kernel1d(
            math.sqrt(s_cur * s_cur - s_prev * s_prev))))
    return jnp.stack(levels, axis=1)


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift (..., H, W) by (dy, dx), edge-replicated."""
    return jnp.roll(jnp.roll(x, dy, axis=-2), dx, axis=-1)


def dog_keypoint_scores(gauss: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Masked refined-contrast scores for one octave.

    gauss: (B, L, H, W). Returns (score (B, 3, H, W) with -inf at rejected
    positions, offsets (B, 3, H, W, 3) the clamped subpixel offset
    (dl, dy, dx)).
    """
    dog = gauss[:, 1:] - gauss[:, :-1]                     # (B, 5, H, W)
    c = dog[:, 1:4]                                        # centers (B, 3, H, W)

    # 26-neighborhood max/min via shifted windows across the 3 adjacent levels
    neigh = []
    for dl in (-1, 0, 1):
        lvl = dog[:, 1 + dl : 4 + dl]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dl == 0 and dy == 0 and dx == 0:
                    continue
                neigh.append(_shift2d(lvl, dy, dx))
    nmax = jnp.max(jnp.stack(neigh), axis=0)
    nmin = jnp.min(jnp.stack(neigh), axis=0)
    is_ext = ((c > nmax) | (c < nmin)) & (jnp.abs(c) > 0.5 * CONTRAST_THR / S)

    # finite-difference 3D gradient / Hessian at every position
    d_dx = (_shift2d(c, 0, -1) - _shift2d(c, 0, 1)) * 0.5
    d_dy = (_shift2d(c, -1, 0) - _shift2d(c, 1, 0)) * 0.5
    d_dl = (dog[:, 2:5] - dog[:, 0:3]) * 0.5
    dxx = _shift2d(c, 0, -1) + _shift2d(c, 0, 1) - 2 * c
    dyy = _shift2d(c, -1, 0) + _shift2d(c, 1, 0) - 2 * c
    dll = dog[:, 2:5] + dog[:, 0:3] - 2 * c
    dxy = (_shift2d(c, -1, -1) + _shift2d(c, 1, 1)
           - _shift2d(c, -1, 1) - _shift2d(c, 1, -1)) * 0.25
    dxl = ((_shift2d(dog[:, 2:5], 0, -1) - _shift2d(dog[:, 2:5], 0, 1))
           - (_shift2d(dog[:, 0:3], 0, -1) - _shift2d(dog[:, 0:3], 0, 1))) * 0.25
    dyl = ((_shift2d(dog[:, 2:5], -1, 0) - _shift2d(dog[:, 2:5], 1, 0))
           - (_shift2d(dog[:, 0:3], -1, 0) - _shift2d(dog[:, 0:3], 1, 0))) * 0.25

    # edge rejection: 2D spatial Hessian ratio (Lowe sec. 4.1)
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    edge_ok = (det > 0) & (tr * tr * EDGE_R < (EDGE_R + 1) ** 2 * det)

    # one Newton step: offset = -H^-1 g (3x3 solve via adjugate), clamped
    a, b_, cc = dxx, dxy, dxl
    d, e = dyy, dyl
    f = dll
    # symmetric H = [[a, b, c], [b, d, e], [c, e, f]]
    A11 = d * f - e * e
    A12 = cc * e - b_ * f
    A13 = b_ * e - cc * d
    A22 = a * f - cc * cc
    A23 = b_ * cc - a * e
    A33 = a * d - b_ * b_
    detH = a * A11 + b_ * A12 + cc * A13
    safe = jnp.where(jnp.abs(detH) > 1e-12, detH, 1.0)
    gx, gy, gl = d_dx, d_dy, d_dl
    ox = -(A11 * gx + A12 * gy + A13 * gl) / safe
    oy = -(A12 * gx + A22 * gy + A23 * gl) / safe
    ol = -(A13 * gx + A23 * gy + A33 * gl) / safe
    ox = jnp.clip(ox, -0.5, 0.5)
    oy = jnp.clip(oy, -0.5, 0.5)
    ol = jnp.clip(ol, -0.5, 0.5)
    d_hat = c + 0.5 * (gx * ox + gy * oy + gl * ol)

    ok = is_ext & edge_ok & (jnp.abs(d_hat) * S >= CONTRAST_THR)
    # keep a margin so orientation/descriptor windows stay informative
    B_, _, H, W = c.shape
    yy = jnp.arange(H)
    xx = jnp.arange(W)
    border = 5
    inb = ((yy >= border) & (yy < H - border))[:, None] & (
        (xx >= border) & (xx < W - border)
    )[None, :]
    ok = ok & inb[None, None]
    score = jnp.where(ok, jnp.abs(d_hat), -jnp.inf)
    offsets = jnp.stack([ol, oy, ox], axis=-1)
    return score, offsets


def _extract_patches(gauss_pad: jnp.ndarray, lvl: jnp.ndarray,
                     yc: jnp.ndarray, xc: jnp.ndarray) -> jnp.ndarray:
    """Per-keypoint (PATCH, PATCH) windows. gauss_pad: (L, H+2*HALF, W+2*HALF);
    lvl/yc/xc: (K,) integer level / center coordinates (unpadded frame)."""

    def one(l, y, x):
        return jax.lax.dynamic_slice(
            gauss_pad, (l, y, x), (1, PATCH, PATCH)
        )[0]

    return jax.vmap(one)(lvl, yc, xc)


def _orientation(patches: jnp.ndarray, sigma_oct: jnp.ndarray) -> jnp.ndarray:
    """Dominant gradient orientation per patch (K, PATCH, PATCH) -> (K,)."""
    dx = (patches[:, 1:-1, 2:] - patches[:, 1:-1, :-2]) * 0.5
    dy = (patches[:, 2:, 1:-1] - patches[:, :-2, 1:-1]) * 0.5
    mag = jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.arctan2(dy, dx) % (2 * jnp.pi)

    n = PATCH - 2
    rr = jnp.arange(n, dtype=jnp.float32) - (HALF - 1)
    r2 = rr[:, None] ** 2 + rr[None, :] ** 2
    sig = (ORI_SIGMA_FACTOR * sigma_oct)[:, None, None]
    w = jnp.exp(-r2[None] / (2 * sig * sig))
    w = jnp.where(r2[None] <= (ORI_RADIUS_FACTOR * sigma_oct[:, None, None]) ** 2,
                  w, 0.0)
    wm = (w * mag).reshape(patches.shape[0], -1)

    # 36-bin histogram with per-bin fused hat reductions (no scatter, and no
    # materialized (K, pixels, 36) tensor — 720 MB at K=1024): each pixel
    # votes for its two adjacent bins with linear interpolation weights
    binf = ang.reshape(patches.shape[0], -1) * (N_ORI_BINS / (2 * jnp.pi))
    cols = []
    for b in range(N_ORI_BINS):
        dist = jnp.abs(binf - b)
        dist = jnp.minimum(dist, N_ORI_BINS - dist)      # circular
        cols.append(jnp.sum(wm * jnp.maximum(0.0, 1.0 - dist), axis=1))
    hist = jnp.stack(cols, axis=1)                       # (K, 36)

    # 5-tap circular smoothing [1,4,6,4,1]/16
    sm = (jnp.roll(hist, 2, -1) + 4 * jnp.roll(hist, 1, -1) + 6 * hist
          + 4 * jnp.roll(hist, -1, -1) + jnp.roll(hist, -2, -1)) / 16.0

    def refine(peak):
        hl = jnp.take_along_axis(sm, (peak[:, None] - 1) % N_ORI_BINS, 1)[:, 0]
        hc = jnp.take_along_axis(sm, peak[:, None], 1)[:, 0]
        hr = jnp.take_along_axis(sm, (peak[:, None] + 1) % N_ORI_BINS, 1)[:, 0]
        denom = hl - 2 * hc + hr
        interp = jnp.where(
            jnp.abs(denom) > 1e-12,
            0.5 * (hl - hr) / jnp.where(denom == 0, 1.0, denom), 0.0)
        ang = ((peak + interp) * (2 * jnp.pi / N_ORI_BINS)) % (2 * jnp.pi)
        return ang, hc

    peak = jnp.argmax(sm, axis=-1)
    theta1, v1 = refine(peak)

    # secondary orientation: best LOCAL maximum away from the main peak;
    # OpenCV duplicates the keypoint when it reaches >= 0.8 * max
    # (sift.cpp orientation-histogram peaks; ~15% of keypoints)
    is_local = (sm > jnp.roll(sm, 1, -1)) & (sm >= jnp.roll(sm, -1, -1))
    bins = jnp.arange(N_ORI_BINS)
    d_to_peak = jnp.abs(bins[None, :] - peak[:, None])
    d_to_peak = jnp.minimum(d_to_peak, N_ORI_BINS - d_to_peak)
    cand = jnp.where(is_local & (d_to_peak > 1), sm, -jnp.inf)
    peak2 = jnp.argmax(cand, axis=-1)
    v2 = jnp.take_along_axis(cand, peak2[:, None], 1)[:, 0]
    theta2, _ = refine(peak2)
    ok2 = jnp.isfinite(v2) & (v2 >= 0.8 * v1)
    return theta1, theta2, ok2


def _descriptor(patches: jnp.ndarray, theta: jnp.ndarray,
                sigma_oct: jnp.ndarray) -> jnp.ndarray:
    """(K, PATCH, PATCH) patches + orientations -> (K, 128) descriptors.

    16x16 sample lattice in the rotated keypoint frame; gradients are
    bilinearly sampled from the patch; trilinear (row, col, orientation)
    soft-assignment is an einsum of hat weights — dense MXU work end to end.
    """
    K = patches.shape[0]
    dxp = (patches[:, 1:-1, 2:] - patches[:, 1:-1, :-2]) * 0.5
    dyp = (patches[:, 2:, 1:-1] - patches[:, :-2, 1:-1]) * 0.5
    n = PATCH - 2
    ctr = HALF - 1.0

    # rotated sample lattice: 16x16, spacing = hist_width/4 (window 12 sigma)
    u = (jnp.arange(DESC_SAMPLES, dtype=jnp.float32) - (DESC_SAMPLES - 1) / 2)
    uu, vv = jnp.meshgrid(u, u, indexing="ij")            # rows, cols
    uu = uu.reshape(-1)
    vv = vv.reshape(-1)                                   # (P=256,)
    spacing = (DESC_HIST_WIDTH * sigma_oct / 4.0)[:, None]    # (K, 1)
    cos_t = jnp.cos(theta)[:, None]
    sin_t = jnp.sin(theta)[:, None]
    # image-frame offsets of each sample: rotate the (row=uu, col=vv) lattice
    # by theta with the same sense as arctan2(dy, dx) angles, so that an
    # image rotation phi maps s(theta) -> s(theta + phi) = R(phi) s(theta)
    dx_s = spacing * (vv[None] * cos_t - uu[None] * sin_t)
    dy_s = spacing * (vv[None] * sin_t + uu[None] * cos_t)
    ys = ctr + dy_s                                       # (K, P)
    xs = ctr + dx_s

    # bilinear gradient sampling from the (n, n) interior grids
    y0 = jnp.clip(jnp.floor(ys), 0, n - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, n - 2).astype(jnp.int32)
    fy = jnp.clip(ys - y0, 0.0, 1.0)
    fx = jnp.clip(xs - x0, 0.0, 1.0)
    flat_dx = dxp.reshape(K, -1)
    flat_dy = dyp.reshape(K, -1)

    def corner(flat, yi, xi):
        return jnp.take_along_axis(flat, yi * n + xi, axis=1)

    def bsample(flat):
        v00 = corner(flat, y0, x0)
        v01 = corner(flat, y0, x0 + 1)
        v10 = corner(flat, y0 + 1, x0)
        v11 = corner(flat, y0 + 1, x0 + 1)
        return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
                + v10 * fy * (1 - fx) + v11 * fy * fx)

    gx = bsample(flat_dx)
    gy = bsample(flat_dy)                                 # (K, P)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = (jnp.arctan2(gy, gx) - theta[:, None]) % (2 * jnp.pi)

    # Gaussian spatial weight over normalized bin coords (Lowe: sigma = d/2)
    rbin = uu[None] / 4.0 + (DESC_D - 1) / 2.0            # (1, P) in [0, 3]
    cbin = vv[None] / 4.0 + (DESC_D - 1) / 2.0
    wspat = jnp.exp(-((rbin - 1.5) ** 2 + (cbin - 1.5) ** 2)
                    / (0.5 * DESC_D * DESC_D))
    m = mag * wspat                                       # (K, P)

    bins = jnp.arange(DESC_D, dtype=jnp.float32)
    wr = jnp.maximum(0.0, 1.0 - jnp.abs(rbin[..., None] - bins))  # (1, P, 4)
    wc = jnp.maximum(0.0, 1.0 - jnp.abs(cbin[..., None] - bins))
    obinf = ang * (DESC_B / (2 * jnp.pi))
    ob = jnp.arange(DESC_B, dtype=jnp.float32)
    od = jnp.abs(obinf[..., None] - ob)
    od = jnp.minimum(od, DESC_B - od)
    wo = jnp.maximum(0.0, 1.0 - od)                       # (K, P, 8)

    mw = m[..., None] * wo                                # (K, P, 8)
    desc = jnp.einsum("kpo,pr,pc->krco",
                      mw, wr[0], wc[0]).reshape(K, DESC_D * DESC_D * DESC_B)
    # normalize -> clip 0.2 -> renormalize (illumination robustness)
    desc = desc / (jnp.linalg.norm(desc, axis=1, keepdims=True) + 1e-12)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / (jnp.linalg.norm(desc, axis=1, keepdims=True) + 1e-12)
    return desc


def _octave_keypoints(gauss: jnp.ndarray, budget: int):
    """One octave, one image: gauss (L, H, W) -> padded keypoint fields."""
    score, offsets = dog_keypoint_scores(gauss[None])
    score = score[0]                                      # (3, H, W)
    offsets = offsets[0]
    _, H, W = score.shape
    # deep octaves of small images can have fewer grid cells than the
    # budget: clamp the top_k and pad the outputs back to `budget` below
    kb = min(budget, 3 * H * W)
    vals, flat = jax.lax.top_k(score.reshape(-1), kb)
    valid = jnp.isfinite(vals)
    lvl = flat // (H * W)
    rem = flat % (H * W)
    yi = rem // W
    xi = rem % W
    off = offsets[lvl, yi, xi]                            # (budget, 3)

    sigma_oct = SIGMA0 * jnp.exp2((lvl.astype(jnp.float32) + 1 + off[:, 0]) / S)
    y = yi.astype(jnp.float32) + off[:, 1]
    x = xi.astype(jnp.float32) + off[:, 2]

    gauss_pad = jnp.pad(
        gauss, ((0, 0), (HALF, HALF), (HALF, HALF)), mode="edge"
    )
    # window center in the padded frame: integer keypoint position
    patches = _extract_patches(gauss_pad, lvl + 1, yi, xi)
    theta1, theta2, ok2 = _orientation(patches, sigma_oct)

    # secondary-orientation duplicates (OpenCV emits an extra keypoint per
    # histogram peak >= 0.8 * max): both orientations compete with weaker
    # detections for the SAME fixed budget, ranked by DoG score with the
    # duplicate epsilon-demoted so primaries win ties
    desc1 = _descriptor(patches, theta1, sigma_oct)
    desc2 = _descriptor(patches, theta2, sigma_oct)
    score1 = jnp.where(valid, vals, -jnp.inf)
    score2 = jnp.where(valid & ok2, vals * (1.0 - 1e-6) - 1e-12, -jnp.inf)

    xy = jnp.stack([x, y], axis=1)
    cat = lambda a, b: jnp.concatenate([a, b], axis=0)    # noqa: E731
    score_all = cat(score1, score2)
    kf = min(budget, score_all.shape[0])
    sel_vals, sel = jax.lax.top_k(score_all, kf)

    out = {
        "xy": cat(xy, xy)[sel],
        "sigma": cat(sigma_oct, sigma_oct)[sel],
        "theta": cat(theta1, theta2)[sel],
        "desc": cat(desc1, desc2)[sel],
        "score": sel_vals,
        "valid": jnp.isfinite(sel_vals),
    }
    if kf < budget:  # pad invalid slots to the static per-octave budget
        pad = budget - kf
        padf = lambda a: jnp.concatenate(                  # noqa: E731
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
        )
        out = {k: padf(v) for k, v in out.items()}
        out["score"] = out["score"].at[kf:].set(-jnp.inf)
        out["valid"] = out["valid"].at[kf:].set(False)
    return out


def default_budgets(max_kpts: int, n_octaves: int) -> Tuple[int, ...]:
    """Geometric split of the keypoint budget across octaves (finest gets
    half — matching the typical DoG keypoint distribution)."""
    budgets = []
    rem = max_kpts
    for o in range(n_octaves):
        b = max(16, rem // 2) if o < n_octaves - 1 else rem
        b = min(b, rem)
        budgets.append(b)
        rem -= b
        if rem <= 0:
            budgets += [0] * (n_octaves - len(budgets))
            break
    return tuple(budgets)


@partial(jax.jit, static_argnames=("n_octaves", "budgets"))
def sift_program(images: jnp.ndarray, n_octaves: int, budgets: Tuple[int, ...]):
    """(B, H, W) float32 grayscale in [0, 1] -> dict of padded SIFT fields.

    Output coordinates/scales are in INPUT-image pixels. Fields: xy
    (B, K, 2), scale (B, K) (= OpenCV's ``kp.size`` / 2, i.e. sigma), angle
    (B, K) radians, desc (B, K, 128), valid (B, K), score (B, K); K = sum of
    per-octave budgets, invalid slots zeroed.
    """
    base = _blur(images, _gauss_kernel1d(math.sqrt(
        max(SIGMA0 ** 2 - 0.25, 0.01))))
    outs = []
    for o in range(n_octaves):
        if budgets[o] > 0:
            gauss = gaussian_octave(base)                 # (B, L, Ho, Wo)
            per_img = jax.vmap(partial(_octave_keypoints, budget=budgets[o]))(
                gauss
            )
            scale_fac = float(2 ** o)
            outs.append({
                "xy": per_img["xy"] * scale_fac,
                "scale": per_img["sigma"] * scale_fac,
                "angle": per_img["theta"],
                "desc": per_img["desc"],
                "score": per_img["score"],
                "valid": per_img["valid"],
            })
        else:
            gauss = gaussian_octave(base)
        if o < n_octaves - 1:
            base = gauss[:, S, ::2, ::2]                  # sigma doubles, res halves

    cat = {k: jnp.concatenate([u[k] for u in outs], axis=1) for k in outs[0]}
    v = cat["valid"]
    cat["xy"] = jnp.where(v[..., None], cat["xy"], 0.0)
    cat["scale"] = jnp.where(v, cat["scale"], 0.0)
    cat["angle"] = jnp.where(v, cat["angle"], 0.0)
    cat["desc"] = jnp.where(v[..., None], cat["desc"], 0.0)
    return cat


def sift_extract_batch(
    images: np.ndarray,
    max_kpts: int = 1024,
    n_octaves: int = 4,
):
    """Host entry: (B, H, W) [0, 1] grayscale -> list of per-image dicts
    compatible with ``rerank.geometric.LocalFeatures`` fields."""
    images = jnp.asarray(images, jnp.float32)
    budgets = default_budgets(max_kpts, n_octaves)
    out = sift_program(images, n_octaves, budgets)
    out = {k: np.asarray(v) for k, v in out.items()}
    feats = []
    for b in range(images.shape[0]):
        valid = out["valid"][b]
        n = int(valid.sum())
        order = np.argsort(~valid, kind="stable")         # valid slots first
        feats.append({
            "xy": out["xy"][b][order],
            "scale": out["scale"][b][order],
            "angle": out["angle"][b][order],
            "desc": out["desc"][b][order],
            "count": n,
        })
    return feats


def make_sharded_sift_fn(
    mesh,
    hw: Optional[Tuple[int, int]] = None,
    max_kpts: int = 1024,
    n_octaves: int = 4,
    axis: str = "data",
):
    """Batch-sharded SIFT over a device mesh: each chip runs the full pyramid
    + keypoint program on its shard of the image batch (per-image work is
    independent — no collectives at all). Mirrors
    ``models.extract.make_sharded_extract_fn``; batch must be divisible by
    the mesh axis size. Returns a jitted ``(B, H, W) -> field dict`` fn.

    ``hw``, when given, is validated against the incoming batch (the jit
    re-specializes per image shape either way)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    budgets = default_budgets(max_kpts, n_octaves)
    batch_sharded = NamedSharding(mesh, P(axis))

    @partial(jax.jit, in_shardings=(batch_sharded,),
             out_shardings=batch_sharded)
    def jitted(images):
        return sift_program(images, n_octaves, budgets)

    def fn(images):
        if hw is not None and tuple(images.shape[1:3]) != tuple(hw):
            raise ValueError(
                f"sharded SIFT fn built for hw={tuple(hw)}, got batch "
                f"{tuple(images.shape)}"
            )
        return jitted(images)

    return fn
