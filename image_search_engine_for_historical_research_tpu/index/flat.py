"""Exact (flat) index: the brute-force matcher as an HBM-resident scan.

Replaces ``matching_L2`` (``/root/reference/src/utils/nnsearch.py:687-706``) and
the FAISS ``IndexFlatIP/L2`` wrappers (``src/utils/knn.py:33-41``). Vectors are
stored row-normalized (for ``metric='cosine'``) so search is one fused streaming
matmul+top-k over the MXU; optional bf16 storage halves HBM traffic at ~1e-3
score noise.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.topk import exact_topk
from .base import normalize_rows, register


@register("flat")
@dataclass
class FlatIndex:
    vectors: jnp.ndarray          # (N, D), normalized when metric == 'cosine'
    metric: str = "cosine"        # 'cosine' (ip on normalized) or 'l2'
    storage_dtype: str = "float32"

    @property
    def n(self) -> int:
        return self.vectors.shape[0]

    def search(
        self, queries, k: int, chunk: int = 262144, approximate: bool = False
    ) -> Tuple:
        """``approximate=True`` uses the TPU-fused approx_max_k (recall ~0.95)
        — removes the top_k sort from the critical path (see ops.topk notes)."""
        q = jnp.asarray(queries)
        if self.metric == "cosine":
            q = normalize_rows(q)
            metric = "ip"
        else:
            metric = "l2"
        matmul_dtype = jnp.bfloat16 if self.storage_dtype == "bfloat16" else None
        return exact_topk(
            q, self.vectors, k, metric=metric, chunk=chunk,
            matmul_dtype=matmul_dtype, approximate=approximate,
        )

    # --- artifacts ---
    def to_arrays(self):
        return (
            {"metric": self.metric, "storage_dtype": self.storage_dtype},
            {"vectors": np.asarray(self.vectors, dtype=np.float32)},
        )

    @classmethod
    def from_arrays(cls, meta, arrays):
        dtype = jnp.bfloat16 if meta.get("storage_dtype") == "bfloat16" else jnp.float32
        return cls(
            vectors=jnp.asarray(arrays["vectors"], dtype),
            metric=meta["metric"],
            storage_dtype=meta.get("storage_dtype", "float32"),
        )


def build_flat(
    vecs, metric: str = "cosine", storage_dtype: str = "float32"
) -> FlatIndex:
    v = jnp.asarray(vecs)
    if metric == "cosine":
        v = normalize_rows(v)
    if storage_dtype == "bfloat16":
        v = v.astype(jnp.bfloat16)
    return FlatIndex(vectors=v, metric=metric, storage_dtype=storage_dtype)
