"""Index contract and pickle-free artifact store.

The reference persists live python objects with pickle (HNSW/nanopq objects,
``/root/reference/src/utils/nnsearch.py:506-525,613-624``) and its offline/online
contract is "same flags, same files" (online.py:126-143). Here every backend is a
dataclass of plain arrays with a uniform contract:

- ``build_*(vecs, **params) -> Index``
- ``index.search(queries, k) -> (scores, idx)`` — scores descending, row-major
- ``index.save(path)`` / ``Index.load(path)`` — ``manifest.json`` + ``.npz``

so offline build and online serving share the same jitted kernels and the
artifacts are language-neutral.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple, Type

import numpy as np

_REGISTRY: Dict[str, Type] = {}

MANIFEST = "manifest.json"
ARRAYS = "arrays.npz"
FORMAT_VERSION = 1


def register(kind: str):
    """Class decorator: register an index type for load-by-manifest."""

    def deco(cls):
        cls.kind = kind
        _REGISTRY[kind] = cls
        return cls

    return deco


def save_index(index, path: str) -> None:
    """Write manifest + arrays. ``index`` must expose ``to_arrays() -> (meta, arrays)``."""
    os.makedirs(path, exist_ok=True)
    meta, arrays = index.to_arrays()
    manifest = {
        "format_version": FORMAT_VERSION,
        "kind": index.kind,
        "meta": meta,
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    np.savez(os.path.join(path, ARRAYS), **{k: np.asarray(v) for k, v in arrays.items()})


def load_index(path: str):
    """Load any registered index type from its artifact directory."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("format_version", 0) > FORMAT_VERSION:
        raise ValueError(f"artifact from a newer format: {manifest}")
    kind = manifest["kind"]
    if kind not in _REGISTRY:
        raise ValueError(f"unknown index kind: {kind!r} (have {sorted(_REGISTRY)})")
    arrays = dict(np.load(os.path.join(path, ARRAYS)))
    return _REGISTRY[kind].from_arrays(manifest["meta"], arrays)


def normalize_rows(x: np.ndarray, eps: float = 0.0) -> np.ndarray:
    """Row L2 normalization (the reference normalizes before every matcher,
    e.g. nnsearch.py:693-698)."""
    import jax.numpy as jnp

    n = jnp.linalg.norm(x, axis=1, keepdims=True)
    return x / (n + eps) if eps else x / jnp.clip(n, min=1e-30)
