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

import jax
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
        meta = {"metric": self.metric, "storage_dtype": self.storage_dtype}
        if self.storage_dtype == "bfloat16":
            # persist bf16 at native width via a uint16 bit-cast (npz has no
            # bf16 dtype) — an f32 upcast would double artifact size and the
            # device->host transfer for no fidelity gain
            return meta, {
                "vectors_bf16": np.asarray(
                    jax.lax.bitcast_convert_type(
                        self.vectors.astype(jnp.bfloat16), jnp.uint16
                    )
                )
            }
        return meta, {"vectors": np.asarray(self.vectors, dtype=np.float32)}

    @classmethod
    def from_arrays(cls, meta, arrays):
        if "vectors_bf16" in arrays:
            v = jax.lax.bitcast_convert_type(
                jnp.asarray(arrays["vectors_bf16"]), jnp.bfloat16
            )
        else:  # includes legacy f32-persisted bf16 artifacts
            dtype = (
                jnp.bfloat16
                if meta.get("storage_dtype") == "bfloat16"
                else jnp.float32
            )
            v = jnp.asarray(arrays["vectors"], dtype)
        return cls(
            vectors=v,
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


@register("flat_i8")
@dataclass
class Int8FlatIndex:
    """Flat index over an int8-quantized gallery (``ops.int8``).

    Storage is 1 byte/dim + one f32 scale per row — 2 GB at 1M x 2048 vs
    8 GB f32 / 4 GB bf16 — and the scan reads half the bytes of the bf16
    path on the same memory-bound kernel. ``rerank="bfloat16"`` keeps a bf16
    copy (4 GB at 1M) and re-ranks a gathered ``shortlist`` exactly; with
    ``rerank="none"`` ranking is by dequantized int8 scores alone (measured
    recall@100 vs exact ~1.0 on realistic descriptors, BASELINE.md).

    Cosine metric only (the framework's canonical metric: the reference
    normalizes rows before every matcher, nnsearch.py:693-698).
    """

    codes: jnp.ndarray            # (N, D) int8
    scales: jnp.ndarray           # (N,) f32
    rerank_vectors: Optional[jnp.ndarray] = None  # (N, D) bf16, optional
    shortlist: int = 512

    @property
    def n(self) -> int:
        return self.codes.shape[0]

    def search(self, queries, k: int, approximate: Optional[bool] = None) -> Tuple:
        """``approximate`` controls the top-k stage: approx_max_k (fuses into
        the scan matmul, recall_target 0.95) vs exact top_k. Default: True
        with rerank (the shortlist is >> k, so the fused scan costs nothing
        measurable in recall), False without (ranks are then final)."""
        from ..ops.int8 import int8_topk, int8_topk_rerank

        q = normalize_rows(jnp.asarray(queries, jnp.float32))
        if self.rerank_vectors is not None:
            return int8_topk_rerank(
                q, self.codes, self.scales, self.rerank_vectors, k,
                shortlist=max(self.shortlist, k),
                approximate=True if approximate is None else approximate,
            )
        return int8_topk(
            q, self.codes, self.scales, k,
            approximate=False if approximate is None else approximate,
        )

    # --- artifacts ---
    def to_arrays(self):
        meta = {
            "shortlist": self.shortlist,
            "has_rerank": self.rerank_vectors is not None,
        }
        arrays = {
            "codes": np.asarray(self.codes),
            "scales": np.asarray(self.scales, dtype=np.float32),
        }
        if self.rerank_vectors is not None:
            # persist bf16 via a uint16 bit-cast (npz has no bf16 dtype)
            arrays["rerank_bf16"] = np.asarray(
                jax.lax.bitcast_convert_type(
                    self.rerank_vectors.astype(jnp.bfloat16), jnp.uint16
                )
            )
        return meta, arrays

    @classmethod
    def from_arrays(cls, meta, arrays):
        rr = None
        if meta.get("has_rerank") and "rerank_bf16" in arrays:
            rr = jax.lax.bitcast_convert_type(
                jnp.asarray(arrays["rerank_bf16"]), jnp.bfloat16
            )
        return cls(
            codes=jnp.asarray(arrays["codes"], jnp.int8),
            scales=jnp.asarray(arrays["scales"], jnp.float32),
            rerank_vectors=rr,
            shortlist=int(meta.get("shortlist", 512)),
        )


def build_flat_i8(
    vecs, rerank: str = "bfloat16", shortlist: int = 512,
    chunk: int = 131072,
) -> Int8FlatIndex:
    """Quantize a gallery to int8 (rows are L2-normalized first).

    ``rerank="bfloat16"`` keeps an exact-rerank copy; ``rerank="none"``
    stores codes+scales only (quarter-of-f32 memory).

    Memory: rows are normalized to bf16 in ``chunk``-row blocks (host numpy
    input is uploaded block-wise) — no full-size f32 temporary is ever
    created (CLAUDE.md HBM rule: at 1M x 2048 a second f32 copy is 8 GB).
    Peak device memory ~= input (if already on device) + 4 GB bf16 + 2 GB
    codes at 1M x 2048; pass bf16 or host input at that scale.
    """
    import jax

    from ..ops.int8 import _iter_blocks, quantize_rows_int8

    N = vecs.shape[0]
    if N <= chunk and not isinstance(vecs, np.ndarray):
        v = normalize_rows(jnp.asarray(vecs)).astype(jnp.bfloat16)
    else:
        norm_block = jax.jit(
            lambda b: (
                b.astype(jnp.float32)
                / jnp.clip(
                    jnp.linalg.norm(b.astype(jnp.float32), axis=1, keepdims=True),
                    min=1e-30,
                )
            ).astype(jnp.bfloat16)
        )
        v = jnp.concatenate(
            [norm_block(blk) for _, blk in _iter_blocks(vecs, chunk)], axis=0
        )
    codes, scales = quantize_rows_int8(v)
    rr = v if rerank == "bfloat16" else None
    return Int8FlatIndex(
        codes=codes, scales=scales, rerank_vectors=rr, shortlist=shortlist
    )
