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
from typing import List, Sequence, Tuple

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
