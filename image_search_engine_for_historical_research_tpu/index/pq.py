"""PQ index: compressed search via asymmetric-distance code scan.

Replaces ``matching_Nano_PQ`` (``/root/reference/src/utils/nnsearch.py:847-901``):
nanopq k-means training + per-query host ADC loop become one batched TPU k-means
fit and a streamed LUT gather-accumulate scan. Codes are (N, M) uint8 in HBM
(16 MB at 1M x 16 books — SURVEY.md section 2.5).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.pq import (
    PQCodebook,
    opq_train,
    pq_encode,
    pq_pack4,
    pq_search,
    pq_train,
    train_indices,
)
from .base import normalize_rows, register


@register("pq")
@dataclass
class PQIndex:
    codewords: jnp.ndarray   # (M, Ks, ds) — codes (N, M), or (N, M/2) when
    codes: jnp.ndarray       # packed4 (two 4-bit codes per byte, Ks <= 16)
    normalized: bool = True
    packed4: bool = False
    rotation: jnp.ndarray | None = None  # OPQ orthogonal pre-rotation

    @property
    def codebook(self) -> PQCodebook:
        return PQCodebook(codewords=self.codewords, rotation=self.rotation)

    @property
    def n(self) -> int:
        return self.codes.shape[0]

    def search(self, queries, k: int, chunk: int = 262144) -> Tuple:
        q = jnp.asarray(queries)
        if self.normalized:
            q = normalize_rows(q)
        return pq_search(self.codebook, self.codes, q, k, chunk=chunk,
                         packed4=self.packed4)

    def to_arrays(self):
        arrays = {
            "codewords": np.asarray(self.codewords, np.float32),
            "codes": np.asarray(self.codes),
        }
        if self.rotation is not None:
            arrays["rotation"] = np.asarray(self.rotation, np.float32)
        return {"normalized": self.normalized, "packed4": self.packed4}, arrays

    @classmethod
    def from_arrays(cls, meta, arrays):
        return cls(
            codewords=jnp.asarray(arrays["codewords"]),
            codes=jnp.asarray(arrays["codes"]),
            normalized=bool(meta.get("normalized", True)),
            packed4=bool(meta.get("packed4", False)),
            rotation=(
                jnp.asarray(arrays["rotation"]) if "rotation" in arrays else None
            ),
        )


def build_pq(
    vecs,
    M: int = 16,
    Ks: int = 256,
    iters: int = 20,
    seed: int = 42,
    normalize: bool = True,
    train_sample: int | None = None,
    mesh=None,
    pack4: bool = False,
    opq: bool = False,
    opq_iters: int = 10,
    n: int | None = None,
) -> PQIndex:
    """Train codebooks on the database and encode it (nnsearch.py:879-891).

    Reference defaults: M=16 books, Ks=2^n_bits, 20 k-means iters, seed 42,
    rows L2-normalized first. The reference drivers run n_bits=13
    (offline.py:109 ``N_books=16, n_bits_perbook=13``); above Ks=2048 the fit
    subsamples and runs bf16 assignment matmuls unless overridden
    (see ``ops.pq.pq_train``).

    **Streaming (beyond-HBM/host-RAM) build**: ``vecs`` may be a CALLABLE
    yielding ``(c, D)`` row chunks with the total row count as ``n=`` (same
    contract as ``build_ivfpq``/``build_hnsw_pq``; see ``index/streaming.py``).
    The fit trains on a gathered sample (``pq_train``'s own index rule, so
    bit-identical to in-memory at the same explicit ``train_sample``) and the
    encode pass streams the source; only the (N, M) codes ever materialize.
    """
    if callable(vecs):
        if n is None:
            raise ValueError(
                "build_pq(vecs=<callable>) needs the total row count n="
            )
        from .streaming import stream_encode_pieces, stream_gather_rows

        N = int(n)
        ts = min(N, train_sample if train_sample is not None
                 else max(65536, 32 * Ks))
        # ops.pq.train_indices IS pq_train/opq_train's internal rule: the
        # streamed fit stays bit-identical to in-memory at the same explicit
        # train_sample
        fit_idx = train_indices(N, ts, seed) if ts < N else np.arange(N)
        fit_rows = stream_gather_rows(vecs, N, fit_idx, normalize=normalize)
        if opq:
            # explicit train_sample passes through (bit-parity with the
            # in-memory build); None stays None so opq_train's tiered
            # 8*Ks-rotation / 16*Ks-final-fit budgets apply instead of the
            # full 32*Ks gather (which OOMs at Ks=2^13, ops/pq.py:141-145)
            cb = opq_train(
                fit_rows, M=M, Ks=Ks, iters=iters, opq_iters=opq_iters,
                seed=seed,
                train_sample=(
                    int(fit_rows.shape[0]) if train_sample is not None
                    else None
                ),
                mesh=mesh,
            )
        else:
            cb = pq_train(
                fit_rows, M=M, Ks=Ks, iters=iters, seed=seed,
                train_sample=int(fit_rows.shape[0]), mesh=mesh,
            )
        del fit_rows
        # encode stays on device end-to-end: each piece's codes concatenate
        # in HBM (320 MB uint16 at 10M x 16) — no host round trip
        parts = [
            pq_encode(cb, piece)
            for _, piece in stream_encode_pieces(
                vecs, N, 131072, normalize=normalize
            )
        ]
        codes = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        del parts
        if pack4:
            if Ks > 16:
                raise ValueError(
                    "pack4 requires Ks <= 16 (the Quick-ADC geometry)"
                )
            codes = pq_pack4(codes)
        return PQIndex(codewords=cb.codewords, codes=codes,
                       normalized=normalize, packed4=pack4,
                       rotation=cb.rotation)

    v = jnp.asarray(vecs)
    if normalize:
        v = normalize_rows(v)
    if opq:
        # learned orthogonal pre-rotation (Ge et al. CVPR'13) — beyond the
        # reference's plain-PQ nanopq; one extra (D, D) matmul per batch
        cb = opq_train(
            v, M=M, Ks=Ks, iters=iters, opq_iters=opq_iters, seed=seed,
            train_sample=train_sample, mesh=mesh,
        )
    else:
        cb = pq_train(
            v, M=M, Ks=Ks, iters=iters, seed=seed, train_sample=train_sample,
            mesh=mesh,
        )
    codes = pq_encode(cb, v)
    if pack4:
        if Ks > 16:
            raise ValueError("pack4 requires Ks <= 16 (the Quick-ADC geometry)")
        codes = pq_pack4(codes)
    return PQIndex(codewords=cb.codewords, codes=codes, normalized=normalize,
                   packed4=pack4, rotation=cb.rotation)
