"""Feature store: the offline -> online descriptor handoff.

Counterpart of the reference's pickle feature store
(``/root/reference/src/utils/general.py:67-92``: ``{'path': [...], 'feature':
D x N ndarray}`` at ``outputs/features/<dataset>_path_feature.pkl``). Here the
native format is npz (language-neutral, no arbitrary-code-execution pickle) with
row-major features; the reference's pickle files are still *readable* for
interop with existing outputs directories.
"""

from __future__ import annotations

import os
import pickle
import re
import warnings
from typing import Callable, List, Sequence, Tuple

import numpy as np


def _safe_name(dataset: str) -> str:
    return dataset.replace("/", "_")


def feature_path(root: str, dataset: str) -> str:
    return os.path.join(root, "features", f"{_safe_name(dataset)}_path_feature.npz")


def save_path_feature(
    dataset: str,
    vecs: np.ndarray,
    img_r_path: Sequence[str],
    root: str = "outputs",
) -> str:
    """Persist (paths, row-major features). Returns the file path."""
    vecs = np.asarray(vecs)
    if vecs.ndim != 2:
        raise ValueError("features must be 2-D (num_images, dim)")
    os.makedirs(os.path.join(root, "features"), exist_ok=True)
    path = feature_path(root, dataset)
    np.savez(
        path,
        paths=np.asarray(list(img_r_path), dtype=np.str_),
        features=vecs.astype(np.float32),
    )
    return path


def load_path_features(dataset: str, root: str = "outputs") -> Tuple[np.ndarray, List[str]]:
    """Load (features (N, D), paths). Falls back to the reference's pickle
    format (transposing its D x N layout) when only that file exists."""
    path = feature_path(root, dataset)
    if os.path.exists(path):
        z = np.load(path, allow_pickle=False)
        return z["features"], [str(p) for p in z["paths"]]

    legacy = os.path.join(
        root, "features", f"{_safe_name(dataset)}_path_feature.pkl"
    )
    if os.path.exists(legacy):
        with open(legacy, "rb") as f:
            d = pickle.load(f)
        vecs = np.asarray(d["feature"])
        paths = list(d["path"])
        # the reference stores D x N; detect by matching the path count
        if vecs.ndim == 2 and vecs.shape[0] != len(paths) and vecs.shape[1] == len(paths):
            vecs = vecs.T
        return vecs.astype(np.float32), paths
    raise FileNotFoundError(f"no feature store for {dataset!r} under {root}")


# ---------------------------------------------------------------------------
# Sharded feature store: the beyond-host-RAM handoff. At 10M x 2048 f32 the
# single-array store above is an 80 GB load the reference's pickle contract
# (general.py:67-92) could never serve; shards keep extraction resumable
# (cli/extract_1m.py --shard-size) and feed the streaming index builders
# (index.build_pq / build_ivfpq / build_hnsw_pq with vecs=<callable>, n=)
# one chunk at a time.
# ---------------------------------------------------------------------------

_SHARD_RE = re.compile(r"shard_(\d{12})_(\d{8})\.npz$")


def shards_dir(root: str, dataset: str) -> str:
    return os.path.join(root, "features", f"{_safe_name(dataset)}_shards")


def save_feature_shard(
    dataset: str,
    start: int,
    vecs: np.ndarray,
    img_r_path: Sequence[str],
    root: str = "outputs",
) -> str:
    """Persist rows ``[start, start+len(vecs))`` as one shard file.

    The write is atomic (tmp + rename), so a crash mid-write never leaves a
    truncated shard that resume logic would count as complete.
    """
    vecs = np.asarray(vecs, np.float32)
    if vecs.ndim != 2:
        raise ValueError("features must be 2-D (num_images, dim)")
    if len(img_r_path) != vecs.shape[0]:
        raise ValueError("one path per feature row required")
    d = shards_dir(root, dataset)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"shard_{start:012d}_{vecs.shape[0]:08d}.npz")
    tmp = path + ".tmp"
    np.savez(
        tmp,
        paths=np.asarray(list(img_r_path), dtype=np.str_),
        features=vecs,
    )
    # np.savez appends .npz to names without it
    os.replace(tmp if os.path.exists(tmp) else tmp + ".npz", path)
    return path


def _list_shards(dataset: str, root: str) -> List[Tuple[int, int, str]]:
    """Contiguous-from-0 prefix of (start, count, path), sorted by start."""
    d = shards_dir(root, dataset)
    if not os.path.isdir(d):
        return []
    found = []
    for f in sorted(os.listdir(d)):
        m = _SHARD_RE.match(f)
        if m:
            found.append((int(m.group(1)), int(m.group(2)), os.path.join(d, f)))
    out, expect = [], 0
    for start, count, p in found:
        if start < expect:
            # stale leftover from an older --shard-size grid whose rows the
            # prefix already covers; skipping (not breaking) lets resume
            # advance past it — breaking here would pin the resume point
            # forever (every rerun would rewrite the same next shard and
            # stop at this file again)
            warnings.warn(
                f"ignoring stale overlapping feature shard {p} "
                f"(covers rows {start}..{start + count}, prefix already "
                f"at {expect}); delete it to silence this warning"
            )
            continue
        if start > expect:
            break  # genuine hole — everything after is unusable
        out.append((start, count, p))
        expect = start + count
    return out


def shard_resume_point(dataset: str, root: str = "outputs") -> int:
    """First row NOT yet covered by a contiguous complete-shard prefix."""
    shards = _list_shards(dataset, root)
    return shards[-1][0] + shards[-1][1] if shards else 0


def chunked_feature_source(
    dataset: str, root: str = "outputs"
) -> Tuple[Callable, int]:
    """Return ``(chunks_fn, n)`` for the streaming index builders.

    ``chunks_fn()`` lazily yields each shard's ``(c, D)`` feature block —
    one shard resident at a time — and may be called repeatedly (the
    builders stream the source once per pass). Usage::

        chunks_fn, n = chunked_feature_source("revisitop10m")
        ix = index.build_hnsw_pq(chunks_fn, n=n, opq="refine")
    """
    shards = _list_shards(dataset, root)
    if not shards:
        raise FileNotFoundError(
            f"no feature shards for {dataset!r} under {root} "
            f"(expected {shards_dir(root, dataset)}/shard_*.npz)"
        )
    n = shards[-1][0] + shards[-1][1]

    def chunks_fn():
        for _, _, p in shards:
            z = np.load(p, allow_pickle=False)
            yield z["features"]

    return chunks_fn, n


def chunked_feature_relpaths(dataset: str, root: str = "outputs") -> List[str]:
    """All image relative paths across the shard prefix, in row order."""
    out: List[str] = []
    for _, _, p in _list_shards(dataset, root):
        z = np.load(p, allow_pickle=False)
        out.extend(str(s) for s in z["paths"])
    return out
