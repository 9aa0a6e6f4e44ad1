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
    pq_decode,
    pq_encode,
    pq_pack4,
    pq_refine_rerank,
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
    # second-level residual codes (faiss IndexPQR / Jegou'11 source-coding
    # re-rank, round 5): the FULL-COVERAGE codes-only route for the >= 10M
    # regime where IVF probing is coverage-bound and PQ dedup collapses
    # (BASELINE.md) — the ADC scan shortlists every code, the refine re-rank
    # restores ordering. +refine_M bytes/image.
    refine_codewords: jnp.ndarray | None = None   # (Mr, Ksr, dsr)
    refine_codes: jnp.ndarray | None = None       # (N, Mr)
    refine_rotation: jnp.ndarray | None = None

    @property
    def codebook(self) -> PQCodebook:
        return PQCodebook(codewords=self.codewords, rotation=self.rotation)

    @property
    def n(self) -> int:
        return self.codes.shape[0]

    def search(self, queries, k: int, chunk: int = 262144,
               method: str = "auto", expand: int = 4) -> Tuple:
        """``method``: ``"adc"`` = the plain full-scan LUT accumulate;
        ``"adc+refine"`` = shortlist ``expand * k`` by ADC, re-rank from the
        two-level (coarse + residual) reconstructions — codes only, the
        high-recall full-coverage route (build with ``refine_M > 0``);
        ``"auto"`` = ``"adc+refine"`` when refine codes exist."""
        q = jnp.asarray(queries)
        if self.normalized:
            q = normalize_rows(q)
        if method == "auto":
            method = "adc+refine" if self.refine_codes is not None else "adc"
        if method == "adc":
            return pq_search(self.codebook, self.codes, q, k, chunk=chunk,
                             packed4=self.packed4)
        if method != "adc+refine":
            raise ValueError(f"unknown method {method!r}")
        if self.refine_codes is None:
            raise ValueError(
                "method='adc+refine' requires refine codes "
                "(build with refine_M > 0)"
            )
        if self.packed4:
            raise ValueError("adc+refine does not support packed4 codes")
        k_cand = min(max(expand * k, k), self.n)
        _, cand = pq_search(self.codebook, self.codes, q, k_cand, chunk=chunk)
        return pq_refine_rerank(
            self.codebook, self.codes,
            PQCodebook(self.refine_codewords, self.refine_rotation),
            self.refine_codes, q, cand, cand,
            jnp.ones(cand.shape, bool), k,
        )

    def to_arrays(self):
        arrays = {
            "codewords": np.asarray(self.codewords, np.float32),
            "codes": np.asarray(self.codes),
        }
        if self.rotation is not None:
            arrays["rotation"] = np.asarray(self.rotation, np.float32)
        if self.refine_codes is not None:
            arrays["refine_codewords"] = np.asarray(
                self.refine_codewords, np.float32
            )
            arrays["refine_codes"] = np.asarray(self.refine_codes)
            if self.refine_rotation is not None:
                arrays["refine_rotation"] = np.asarray(
                    self.refine_rotation, np.float32
                )
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
            refine_codewords=(
                jnp.asarray(arrays["refine_codewords"])
                if "refine_codewords" in arrays else None
            ),
            refine_codes=(
                jnp.asarray(arrays["refine_codes"])
                if "refine_codes" in arrays else None
            ),
            refine_rotation=(
                jnp.asarray(arrays["refine_rotation"])
                if "refine_rotation" in arrays else None
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
    refine_M: int = 0,
    refine_Ks: int = 256,
) -> PQIndex:
    """Train codebooks on the database and encode it (nnsearch.py:879-891).

    Reference defaults: M=16 books, Ks=2^n_bits, 20 k-means iters, seed 42,
    rows L2-normalized first. The reference drivers run n_bits=13
    (offline.py:109 ``N_books=16, n_bits_perbook=13``); above Ks=2048 the fit
    subsamples and runs bf16 assignment matmuls unless overridden
    (see ``ops.pq.pq_train``).

    ``refine_M > 0`` additionally trains a second PQ over the residuals and
    stores per-image residual codes (faiss IndexPQR): ``search`` then
    defaults to the codes-only ``adc+refine`` re-rank — the full-coverage
    high-recall route for the >= 10M regime, where IVF probing is
    coverage-bound and PQ_HNSW's dedup collapses (BASELINE.md, round 5).

    **Streaming (beyond-HBM/host-RAM) build**: ``vecs`` may be a CALLABLE
    yielding ``(c, D)`` row chunks with the total row count as ``n=`` (same
    contract as ``build_ivfpq``/``build_hnsw_pq``; see ``index/streaming.py``).
    The fit trains on a gathered sample (``pq_train``'s own index rule, so
    bit-identical to in-memory at the same explicit ``train_sample``) and the
    encode pass streams the source; only the (N, M) codes ever materialize.
    """
    if pack4 and refine_M:
        raise ValueError("refine_M and pack4 are mutually exclusive")
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
        ridx = None
        if refine_M:
            rs = min(N, max(16384, 32 * refine_Ks))
            ridx = train_indices(N, rs, seed + 1) if rs < N else np.arange(N)
        gathered = stream_gather_rows(
            vecs, N, [fit_idx] + ([ridx] if refine_M else []),
            normalize=normalize,
        )
        fit_rows, refine_rows = gathered[0], (
            gathered[1] if refine_M else None
        )
        del gathered
        if refine_M:  # clamp to the largest divisor of D (as in-memory)
            D = int(fit_rows.shape[1])
            refine_M = min(refine_M, D)
            while D % refine_M:
                refine_M -= 1
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
        rcb = None
        if refine_M:
            # pq_encode is row-local: encoding the sampled rows directly
            # equals slicing a full code matrix at ridx
            ci = pq_encode(cb, refine_rows)
            residuals = refine_rows - pq_decode(cb, ci)
            del refine_rows, ci
            if opq:
                rcb = opq_train(
                    residuals, M=refine_M, Ks=refine_Ks, iters=iters,
                    opq_iters=opq_iters, seed=seed + 1,
                )
            else:
                rcb = pq_train(
                    residuals, M=refine_M, Ks=refine_Ks, iters=iters,
                    seed=seed + 1,
                )
            del residuals
        # encode stays on device end-to-end: each piece's codes concatenate
        # in HBM (320 MB uint16 at 10M x 16) — no host round trip
        parts, rparts = [], []
        for _, piece in stream_encode_pieces(
            vecs, N, 131072, normalize=normalize
        ):
            code = pq_encode(cb, piece)
            parts.append(code)
            if refine_M:
                rparts.append(
                    pq_encode(rcb, piece - pq_decode(cb, code))
                )
            del piece
        codes = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        del parts
        rcodes = None
        if refine_M:
            rcodes = (
                jnp.concatenate(rparts) if len(rparts) > 1 else rparts[0]
            )
            del rparts
        if pack4:
            if Ks > 16:
                raise ValueError(
                    "pack4 requires Ks <= 16 (the Quick-ADC geometry)"
                )
            codes = pq_pack4(codes)
        return PQIndex(codewords=cb.codewords, codes=codes,
                       normalized=normalize, packed4=pack4,
                       rotation=cb.rotation,
                       refine_codewords=rcb.codewords if rcb else None,
                       refine_codes=rcodes,
                       refine_rotation=rcb.rotation if rcb else None)

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
    rcb = rcodes = None
    if refine_M:
        N, D = v.shape
        refine_M = min(refine_M, D)
        while D % refine_M:  # largest divisor of D not above the request
            refine_M -= 1
        # train the residual codebook on a row subsample (faiss-style
        # points-per-centroid budget), then encode every residual chunked —
        # a full f32 residual copy is another 8 GB at 1M x 2048
        rs = min(N, max(16384, 32 * refine_Ks))
        if rs < N:
            ridx = jnp.asarray(train_indices(N, rs, seed + 1))
            residuals = v[ridx] - pq_decode(cb, codes[ridx])
        else:
            residuals = v - pq_decode(cb, codes)
        if opq:
            rcb = opq_train(
                residuals, M=refine_M, Ks=refine_Ks, iters=iters,
                opq_iters=opq_iters, seed=seed + 1,
            )
        else:
            rcb = pq_train(
                residuals, M=refine_M, Ks=refine_Ks, iters=iters,
                seed=seed + 1,
            )
        del residuals
        step = 131072
        rparts = [
            pq_encode(
                rcb, v[s0 : s0 + step] - pq_decode(cb, codes[s0 : s0 + step])
            )
            for s0 in range(0, N, step)
        ]
        rcodes = jnp.concatenate(rparts) if len(rparts) > 1 else rparts[0]
        del rparts
    if pack4:
        if Ks > 16:
            raise ValueError("pack4 requires Ks <= 16 (the Quick-ADC geometry)")
        codes = pq_pack4(codes)
    return PQIndex(codewords=cb.codewords, codes=codes, normalized=normalize,
                   packed4=pack4, rotation=cb.rotation,
                   refine_codewords=rcb.codewords if rcb else None,
                   refine_codes=rcodes,
                   refine_rotation=rcb.rotation if rcb else None)
