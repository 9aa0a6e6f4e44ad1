"""Local-feature geometric verification re-ranking (the SAHA/AdaLAM path).

TPU-native counterpart of the reference's local-feature re-rankers
(``/root/reference/src/utils/Reranking.py``): ``sift_online`` (SAHA, :37-116,
precomputed SIFT + AdaLAM filtering), ``ransac_sift`` (:638-723, on-the-fly
SIFT + AdaLAM), and the vendored AdaLAM package (``src/utils/adalam/``).

Decomposition:
- SIFT keypoints/descriptors come from OpenCV on the host (as in the reference;
  the offline half mirrors the missing "SAHAoffline" script by persisting npz
  per image);
- matching + verification run on TPU as one jitted program per pair batch:
  mutual-NN ratio-test matching is two matmuls, and verification is AdaLAM's
  core idea — every match hypothesizes a similarity transform from its
  keypoints' position/orientation/scale, and hypotheses vote over all matches —
  expressed as a dense (M, M) residual matrix instead of the reference's
  CUDA loops (adalam/ransac.py).

The re-rank driver re-sorts the top-``b`` candidates by inlier count exactly
like the reference's bubble-sorted ``a`` array (:47-53 — we just sort).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache, partial
from typing import List, Optional, Sequence, Tuple

import numpy as np

MAX_KPTS = 1024  # fixed keypoint budget per image (static shapes)


# ---------------------------------------------------------------- SIFT (host)


@dataclass
class LocalFeatures:
    """Padded per-image local features: positions, scale, angle, descriptors."""

    xy: np.ndarray      # (MAX_KPTS, 2) float32
    scale: np.ndarray   # (MAX_KPTS,) float32
    angle: np.ndarray   # (MAX_KPTS,) float32 radians
    desc: np.ndarray    # (MAX_KPTS, 128) float32, L2-normalized rows
    count: int
    shape: Tuple[int, int]

    def save(self, path: str):
        np.savez(
            path, xy=self.xy, scale=self.scale, angle=self.angle,
            desc=self.desc, count=self.count, shape=np.asarray(self.shape),
        )

    @classmethod
    def load(cls, path: str) -> "LocalFeatures":
        z = np.load(path)
        return cls(
            xy=z["xy"], scale=z["scale"], angle=z["angle"], desc=z["desc"],
            count=int(z["count"]), shape=tuple(int(x) for x in z["shape"]),
        )


def sift_extract(
    image_path: str,
    resize: Optional[Tuple[int, int]] = (1000, 1000),
    max_kpts: int = MAX_KPTS,
) -> LocalFeatures:
    """OpenCV SIFT with fixed keypoint budget (Reranking.py:657-667 resizes to
    1000x1000 and runs cv2 SIFT)."""
    import cv2

    img = cv2.imread(image_path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(image_path)
    if resize is not None:
        img = cv2.resize(img, resize)
    sift = cv2.SIFT_create(nfeatures=max_kpts)
    kpts, desc = sift.detectAndCompute(img, None)

    out = LocalFeatures(
        xy=np.zeros((max_kpts, 2), np.float32),
        scale=np.zeros((max_kpts,), np.float32),
        angle=np.zeros((max_kpts,), np.float32),
        desc=np.zeros((max_kpts, 128), np.float32),
        count=0,
        shape=img.shape[:2],
    )
    if not kpts:
        return out
    n = min(len(kpts), max_kpts)
    out.count = n
    out.xy[:n] = np.asarray([k.pt for k in kpts[:n]], np.float32)
    out.scale[:n] = np.asarray([k.size for k in kpts[:n]], np.float32)
    out.angle[:n] = np.deg2rad(
        np.asarray([k.angle for k in kpts[:n]], np.float32)
    )
    d = np.asarray(desc[:n], np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
    out.desc[:n] = d
    return out


def sift_extract_tpu(
    paths: Sequence[str],
    resize: Optional[Tuple[int, int]] = (1000, 1000),
    max_kpts: int = MAX_KPTS,
    batch_size: int = 8,
    n_octaves: int = 4,
) -> List[LocalFeatures]:
    """TPU SIFT for a batch of images (``ops.sift``, one jitted program per
    batch) — the device-side replacement for per-image host OpenCV
    (cv2 ~50 ms/image single-threaded = days at a 1M gallery). Keypoint
    ``scale`` is stored as 2*sigma; AdaLAM consumes only scale RATIOS, so any
    consistent convention works — do not mix cv2- and tpu-extracted stores."""
    from PIL import Image

    from ..ops import sift as sift_ops

    feats: List[LocalFeatures] = []
    for start in range(0, len(paths), batch_size):
        chunk = paths[start : start + batch_size]
        imgs = []
        for p in chunk:
            im = Image.open(p).convert("L")
            if resize is not None:
                im = im.resize(resize)  # (W, H) — same convention as cv2.resize
            imgs.append(np.asarray(im, np.float32) / 255.0)
        arr = np.stack(imgs)
        for f in sift_ops.sift_extract_batch(arr, max_kpts, n_octaves):
            lf = LocalFeatures(
                xy=f["xy"].astype(np.float32),
                scale=(2.0 * f["scale"]).astype(np.float32),
                angle=f["angle"].astype(np.float32),
                desc=f["desc"].astype(np.float32),
                count=int(f["count"]),
                shape=arr.shape[1:3],
            )
            feats.append(lf)
    return feats


def sift_offline(
    paths: Sequence[str],
    store_dir: str,
    resize=(1000, 1000),
    max_kpts: int = MAX_KPTS,
    backend: str = "cv2",
    batch_size: int = 8,
) -> List[str]:
    """Persist SIFT features per image (the SAHA offline half the reference
    loads from .npy files, Reranking.py:63-77). ``backend="tpu"`` extracts
    whole batches on device via ``ops.sift`` instead of host OpenCV."""
    os.makedirs(store_dir, exist_ok=True)
    out = []
    missing = []
    for p in paths:
        name = os.path.splitext(os.path.basename(p))[0]
        dst = os.path.join(store_dir, name + ".npz")
        if not os.path.exists(dst):
            missing.append((p, dst))
        out.append(dst)
    if missing:
        if backend == "tpu":
            feats = sift_extract_tpu(
                [p for p, _ in missing], resize, max_kpts, batch_size
            )
            for (_, dst), lf in zip(missing, feats):
                lf.save(dst)
        else:
            for p, dst in missing:
                sift_extract(p, resize, max_kpts).save(dst)
    return out


# ------------------------------------------------------- matching + RANSAC


def _match_and_verify_impl(
    xy1, sc1, an1, d1, n1,
    xy2, sc2, an2, d2, n2,
    ratio: float,
    inlier_px: float,
    min_confidence: float,
):
    """Jit core: mutual-NN ratio matches + 1-match similarity-hypothesis votes.

    Returns the verified inlier count (scalar) — the quantity SAHA sorts by.
    """
    import jax
    import jax.numpy as jnp

    K = xy1.shape[0]
    valid1 = jnp.arange(K) < n1
    valid2 = jnp.arange(K) < n2

    sims = d1 @ d2.T  # (K, K); descriptors are L2 normalized
    sims = jnp.where(valid1[:, None] & valid2[None, :], sims, -1.0)

    # ratio test via top-2 (distance ratio on unit sphere: d^2 = 2 - 2 s)
    top2, idx2 = jax.lax.top_k(sims, 2)
    best2 = idx2[:, 0]
    dist_sq = jnp.maximum(2.0 - 2.0 * top2, 1e-12)
    ratio_ok = dist_sq[:, 0] < (ratio ** 2) * dist_sq[:, 1]

    # mutual nearest neighbors
    back = jnp.argmax(sims, axis=0)  # best row for each column
    mutual = back[best2] == jnp.arange(K)

    match_ok = ratio_ok & mutual & valid1
    m2 = best2  # column matched to each row

    # hypotheses: each match proposes a similarity transform from kp attributes
    # (AdaLAM's seed affinities, adalam/core.py): scale ratio + angle delta +
    # translation mapping kp1 -> kp2.
    s_ratio = jnp.where(sc1 > 0, sc2[m2] / jnp.clip(sc1, min=1e-6), 1.0)
    d_angle = an2[m2] - an1
    cos, sin = jnp.cos(d_angle), jnp.sin(d_angle)

    def apply_hypo(h):  # transform all kp1 under hypothesis h
        R = jnp.stack(
            [jnp.stack([cos[h], -sin[h]]), jnp.stack([sin[h], cos[h]])]
        )  # (2, 2)
        t = xy2[m2[h]] - s_ratio[h] * (R @ xy1[h])
        pred = s_ratio[h] * (xy1 @ R.T) + t[None, :]
        resid = jnp.linalg.norm(pred - xy2[m2], axis=1)
        inl = (resid < inlier_px) & match_ok
        return jnp.sum(inl)

    votes = jax.vmap(apply_hypo)(jnp.arange(K))
    votes = jnp.where(match_ok, votes, 0)
    best = jnp.max(votes)
    n_matches = jnp.sum(match_ok)
    # require the consensus to be non-trivial (AdaLAM confidence-style gate)
    return jnp.where(best >= min_confidence, best, 0).astype(jnp.int32), n_matches


@lru_cache(maxsize=None)
def _verifier_core(ratio: float, inlier_px: float, min_confidence: int):
    """Cached per parameter set: jax.jit keys on function identity, so a
    fresh closure per make_verifier() call would recompile every time."""
    import jax

    return jax.jit(
        partial(
            _match_and_verify_impl,
            ratio=ratio, inlier_px=inlier_px, min_confidence=min_confidence,
        )
    )


def make_verifier(ratio: float = 0.9, inlier_px: float = 15.0, min_confidence: int = 6):
    """Jitted pair verifier: (LocalFeatures, LocalFeatures) -> inlier count."""
    core = _verifier_core(ratio, inlier_px, min_confidence)

    def verify(f1: LocalFeatures, f2: LocalFeatures) -> int:
        import jax.numpy as jnp

        inliers, _ = core(
            jnp.asarray(f1.xy), jnp.asarray(f1.scale), jnp.asarray(f1.angle),
            jnp.asarray(f1.desc), f1.count,
            jnp.asarray(f2.xy), jnp.asarray(f2.scale), jnp.asarray(f2.angle),
            jnp.asarray(f2.desc), f2.count,
        )
        return int(inliers)

    return verify


def make_adalam_verifier(custom_config: Optional[dict] = None):
    """Pair verifier running the full AdaLAM filter (``rerank.adalam``).

    This is the faithful counterpart of the reference's verification
    (``src/utils/adalam/adalam.py:91-148``): NN matching + ratio scores + MNN,
    then seed-based local affine RANSAC; the returned count is the number of
    surviving matches (what SAHA sorts candidates by). One jitted program per
    keypoint budget; all pairs reuse it.
    """
    from .adalam import AdalamFilter

    filt = AdalamFilter(custom_config)

    def verify(f1: LocalFeatures, f2: LocalFeatures) -> int:
        if f1.count < 2 or f2.count < 2:
            return 0
        K = f1.xy.shape[0]
        keep, _ = filt.match_and_filter(
            f1.xy, f2.xy, f1.desc, f2.desc,
            im1shape=f1.shape, im2shape=f2.shape,
            o1=np.degrees(f1.angle), o2=np.degrees(f2.angle),
            s1=f1.scale, s2=f2.scale,
            valid1=np.arange(K) < f1.count,
            valid2=np.arange(f2.xy.shape[0]) < f2.count,
        )
        return int(keep.sum())

    return verify


# ------------------------------------------------------------ rerank drivers


def rerank_by_inliers(ranks: np.ndarray, counts: np.ndarray, b: int) -> np.ndarray:
    """Stable re-sort of the top-b candidates by descending inlier count
    (the reference's bubble sort, Reranking.py:47-53, is exactly this)."""
    ranks = np.asarray(ranks).copy()
    order = np.argsort(-counts, axis=1, kind="stable")
    for qi in range(ranks.shape[0]):
        ranks[qi, :b] = ranks[qi, order[qi]]
    return ranks


def adalam_count_pairs(
    feats_q: Sequence[LocalFeatures],
    feats_c: Sequence[LocalFeatures],
    custom_config: Optional[dict] = None,
    pair_batch: int = 8,
    dispatch: str = "scan",
) -> np.ndarray:
    """Surviving-AdaLAM-match counts for a list of feature pairs.

    Unique ``LocalFeatures`` objects are deduplicated into a device-resident
    bank uploaded ONCE (a query's features repeat across all its b candidate
    pairs); pairs are then gathered from the bank by index inside jit.
    ``dispatch="scan"`` (default, VERDICT r3 #4) runs ALL pair blocks as one
    jitted ``lax.scan`` program — a single device dispatch for the whole
    re-rank instead of one per ``pair_batch`` block (each block dispatch paid
    a ~33 ms tunnel round-trip + sync: 1.19 s/pair production vs 13.6 ms/pair
    device compute, BASELINE.md). ``dispatch="loop"`` keeps the per-block
    host loop (useful when pair counts vary per call and retraces of the
    scan length would dominate). Returns (len(pairs),).
    """
    import jax.numpy as jnp

    from .adalam import AdalamFilter

    filt = AdalamFilter(custom_config)
    P = len(feats_q)
    if P == 0:
        return np.zeros((0,), np.int64)
    K = feats_q[0].xy.shape[0]
    counts = np.zeros((P,), np.int64)

    # identity-deduplicated feature bank
    bank: list = []
    slot: dict = {}

    def bid(f):
        k = id(f)
        if k not in slot:
            slot[k] = len(bank)
            bank.append(f)
        return slot[k]

    iq = np.array([bid(f) for f in feats_q], np.int32)
    ic = np.array([bid(f) for f in feats_c], np.int32)

    xy = jnp.asarray(np.stack([f.xy for f in bank]))
    desc = jnp.asarray(np.stack([f.desc for f in bank]))
    odeg = jnp.asarray(np.degrees(np.stack([f.angle for f in bank])))
    sc = jnp.asarray(np.stack([f.scale for f in bank]))
    valid = jnp.asarray(np.stack([np.arange(K) < f.count for f in bank]))
    R = jnp.asarray([filt.radius(f.shape) for f in bank], jnp.float32)

    if dispatch == "scan":
        counter = filt.make_banked_scan_counter()
        nb = -(-P // pair_batch)
        pad = nb * pair_batch - P
        iq_p = np.concatenate([iq, np.full(pad, iq[-1], np.int32)])
        ic_p = np.concatenate([ic, np.full(pad, ic[-1], np.int32)])
        out = counter(
            xy, desc, odeg, sc, valid, R,
            jnp.asarray(iq_p.reshape(nb, pair_batch)),
            jnp.asarray(ic_p.reshape(nb, pair_batch)),
        )
        counts[:] = np.asarray(out).reshape(-1)[:P]
        return counts

    counter = filt.make_banked_counter()
    for s in range(0, P, pair_batch):
        iq_b = iq[s : s + pair_batch]
        ic_b = ic[s : s + pair_batch]
        n = len(iq_b)
        if n < pair_batch:  # pad to the compiled batch shape
            iq_b = np.concatenate([iq_b, np.full(pair_batch - n, iq_b[-1], np.int32)])
            ic_b = np.concatenate([ic_b, np.full(pair_batch - n, ic_b[-1], np.int32)])
        out = counter(
            xy, desc, odeg, sc, valid, R,
            jnp.asarray(iq_b), jnp.asarray(ic_b),
        )
        counts[s : s + n] = np.asarray(out)[:n]
    return counts


def sift_rerank(
    query_paths: Sequence[str],
    db_paths: Sequence[str],
    ranks: np.ndarray,
    b: int = 30,
    store_dir: Optional[str] = None,
    resize=(1000, 1000),
    verifier=None,
    pair_batch: int = 8,
    backend: str = "cv2",
):
    """SAHA-style re-rank: verify each query against its top-b candidates
    (Reranking.py:37-116 online / :638-723 on-the-fly). ``ranks`` is row-major
    (Q, >= b). With ``store_dir``, features are persisted/reused (offline half).

    Default path: the full AdaLAM filter (oracle-tested against the
    reference's vendored torch AdaLAM) with pairs stacked into batched jitted
    calls of ``pair_batch`` (Q x b single-pair dispatches through the ~33 ms
    tunnel round-trip dominated the round-2 cost). Pass a ``verifier``
    (e.g. ``make_verifier()``) to use the sequential per-pair path instead.
    Per-image features are extracted once and cached.
    """
    ranks = np.asarray(ranks)
    Q = len(query_paths)
    b = min(b, ranks.shape[1]) if ranks.size else 0
    if Q == 0 or b == 0:
        return ranks

    cache: dict = {}

    if backend == "tpu":
        # batch the device extraction up front: per-path B=1 dispatches pay a
        # compile + a ~33 ms round-trip each; one pass over the unique needed
        # paths (queries + their top-b candidates) runs in full batches
        needed, seen = [], set()
        for p in list(query_paths) + [
            db_paths[int(ranks[qi, j])] for qi in range(Q) for j in range(b)
        ]:
            if p not in seen:
                seen.add(p)
                if store_dir is None or not os.path.exists(os.path.join(
                        store_dir,
                        os.path.splitext(os.path.basename(p))[0] + ".npz")):
                    needed.append(p)
        if needed and store_dir is None:
            cache.update(zip(needed, sift_extract_tpu(needed, resize)))
        elif needed:
            os.makedirs(store_dir, exist_ok=True)
            for p, lf in zip(needed, sift_extract_tpu(needed, resize)):
                lf.save(os.path.join(
                    store_dir,
                    os.path.splitext(os.path.basename(p))[0] + ".npz"))

    def extract_one(path):
        if backend == "tpu":
            return sift_extract_tpu([path], resize)[0]
        return sift_extract(path, resize)

    def features(path):
        if path in cache:
            return cache[path]
        if store_dir is None:
            f = extract_one(path)
        else:
            name = os.path.splitext(os.path.basename(path))[0]
            dst = os.path.join(store_dir, name + ".npz")
            if not os.path.exists(dst):
                os.makedirs(store_dir, exist_ok=True)
                extract_one(path).save(dst)
            f = LocalFeatures.load(dst)
        cache[path] = f
        return f

    if verifier is not None:
        counts = np.zeros((Q, b), np.int64)
        for qi in range(Q):
            fq = features(query_paths[qi])
            for j in range(b):
                fi = features(db_paths[int(ranks[qi, j])])
                counts[qi, j] = verifier(fq, fi)
        return rerank_by_inliers(ranks, counts, b)

    feats_q, feats_c = [], []
    for qi in range(Q):
        fq = features(query_paths[qi])
        for j in range(b):
            feats_q.append(fq)
            feats_c.append(features(db_paths[int(ranks[qi, j])]))
    counts = adalam_count_pairs(
        feats_q, feats_c, pair_batch=pair_batch
    ).reshape(Q, b)
    return rerank_by_inliers(ranks, counts, b)


# ------------------------------------------------------- LoFTR-class rerank


def loftr_rerank(
    query_paths: Sequence[str],
    db_paths: Sequence[str],
    ranks: np.ndarray,
    match_fn=None,
    b: int = 60,
    resolution: Tuple[int, int] = (640, 480),
    count_fn=None,
    pair_batch: int = 4,
    banked_count_fn=None,
):
    """Detector-free matcher re-rank (Reranking.py:126-185).

    Candidates are re-sorted by match count (confidences over threshold);
    images are grayscale-resized to ``resolution`` (reference uses 720x480).
    Three drivers (pass exactly one):

    - ``banked_count_fn`` (``models.loftr.make_banked_count_fn``): the
      production path — unique images upload once into a device bank and ALL
      pair blocks run as one jitted scanned dispatch (VERDICT r3 #4).
    - ``count_fn`` (``models.loftr.make_batched_count_fn``): pairs are
      stacked ``pair_batch`` at a time, one dispatch per block, images
      re-uploaded per pair occurrence.
    - ``match_fn`` (``models.loftr.make_match_fn``): legacy one-dispatch-
      per-pair, when the full MatchResult is wanted.
    """
    import cv2

    if sum(f is not None for f in (match_fn, count_fn, banked_count_fn)) != 1:
        raise ValueError(
            "pass exactly one of match_fn / count_fn / banked_count_fn"
        )

    w, h = resolution

    def load(path):
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        img = cv2.resize(img, (w, h)).astype(np.float32) / 255.0
        return img[:, :, None]

    ranks = np.asarray(ranks)
    Q = len(query_paths)
    b = min(b, ranks.shape[1])
    counts = np.zeros((Q, b), np.int64)

    if banked_count_fn is not None:
        import jax.numpy as jnp

        paths = list(query_paths) + [
            db_paths[int(ranks[qi, j])] for qi in range(Q) for j in range(b)
        ]
        uniq: dict = {}
        for p in paths:
            if p not in uniq:
                uniq[p] = len(uniq)
        bank = jnp.asarray(
            np.stack([load(p) for p in uniq])  # (U, H, W, 1), uploaded once
        )
        iq = np.array(
            [uniq[query_paths[qi]] for qi in range(Q) for _ in range(b)],
            np.int32,
        )
        ic = np.array(
            [uniq[db_paths[int(ranks[qi, j])]] for qi in range(Q) for j in range(b)],
            np.int32,
        )
        P = Q * b
        nb = -(-P // pair_batch)
        pad = nb * pair_batch - P
        iq = np.concatenate([iq, np.full(pad, iq[-1], np.int32)])
        ic = np.concatenate([ic, np.full(pad, ic[-1], np.int32)])
        out = banked_count_fn(
            bank,
            jnp.asarray(iq.reshape(nb, pair_batch)),
            jnp.asarray(ic.reshape(nb, pair_batch)),
        )
        counts = np.asarray(out).reshape(-1)[:P].reshape(Q, b)
        return rerank_by_inliers(ranks, counts, b)

    if count_fn is not None:
        img_cache: dict = {}

        def cached(path):
            if path not in img_cache:
                img_cache[path] = load(path)
            return img_cache[path]

        pairs = [
            (query_paths[qi], db_paths[int(ranks[qi, j])])
            for qi in range(Q)
            for j in range(b)
        ]
        flat = np.zeros((len(pairs),), np.int64)
        for s in range(0, len(pairs), pair_batch):
            chunk = pairs[s : s + pair_batch]
            n = len(chunk)
            if n < pair_batch:  # pad to the compiled batch shape
                chunk = chunk + [chunk[-1]] * (pair_batch - n)
            i0 = np.stack([cached(p[0]) for p in chunk])
            i1 = np.stack([cached(p[1]) for p in chunk])
            flat[s : s + n] = np.asarray(count_fn(i0, i1))[:n]
        counts = flat.reshape(Q, b)
        return rerank_by_inliers(ranks, counts, b)

    for qi in range(Q):
        img_q = load(query_paths[qi])
        for j in range(b):
            img_c = load(db_paths[int(ranks[qi, j])])
            res = match_fn(img_q, img_c)
            counts[qi, j] = int(np.asarray(res.num_matches))
    return rerank_by_inliers(ranks, counts, b)
