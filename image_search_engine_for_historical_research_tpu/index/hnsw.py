"""HNSW index: native C++ build, TPU beam-search traversal.

Replaces the reference's pure-python HNSW (``nnsearch.py:59-538``: build "runs
for days" at 1M per its README) and the PQ-code variant ``matching_HNSW_NanoPQ``
(:585-683). Build happens once on the host in C++ (``native/hnsw_build.cpp``);
search runs entirely on TPU over the padded neighbor tables.

The PQ variant keeps the reference's exact structure: encode the database,
deduplicate identical code rows (np.unique, :633), build the graph over unique
codes with code-to-code distances, search with the asymmetric LUT, then expand
unique-code hits back to image ids via the stored group table (the pickled
``dict_recover``, :636-646, becomes two flat arrays).
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..native import load as load_native
from ..ops.graph_search import (
    hnsw_search_batch,
    hnsw_search_batch_pq,
    hnsw_search_batch_pq_centroid,
)
from ..ops.pq import PQCodebook, pq_decode, pq_encode, pq_train, train_indices
from .base import normalize_rows, register

MAX_LEVELS = 6


def _build_graph(data: np.ndarray, m: int, m0: int, ef: int, seed: int):
    """Run the native builder; returns (nbr0, nbru, levels, entry, top)."""
    lib = load_native("hnsw")
    lib.hnsw_build.restype = ctypes.c_int
    n, d = data.shape
    data = np.ascontiguousarray(data, np.float32)
    nbr0 = np.empty((n, m0), np.int32)
    nbru = np.empty((MAX_LEVELS - 1, n, m), np.int32)
    levels = np.empty((n,), np.int32)
    meta = np.empty((2,), np.int32)
    rc = lib.hnsw_build(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n), ctypes.c_int64(d),
        ctypes.c_int(m), ctypes.c_int(m0), ctypes.c_int(ef),
        ctypes.c_int(MAX_LEVELS), ctypes.c_uint64(seed),
        nbr0.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nbru.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        levels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"hnsw_build failed with code {rc}")
    return nbr0, nbru, levels, int(meta[0]), int(meta[1])


@register("hnsw")
@dataclass
class HNSWIndex:
    vectors: jnp.ndarray      # (N, D) normalized
    nbr0: jnp.ndarray         # (N, m0)
    nbru: jnp.ndarray         # (MAX_LEVELS-1, N, m)
    entry: int
    ef_default: int = 100
    coarse_ids: Optional[jnp.ndarray] = None  # upper-level member ids (seeds)

    @property
    def n(self) -> int:
        return self.vectors.shape[0]

    def search(
        self, queries, k: int, ef: Optional[int] = None, use_pallas: bool = False
    ) -> Tuple:
        q = normalize_rows(jnp.asarray(queries))
        ef = ef or max(self.ef_default, k)
        if use_pallas:
            return self.search_pallas(q, k, ef)
        return hnsw_search_batch(
            self.vectors, self.nbr0, self.nbru, self.entry, q, k, ef,
            coarse_ids=self.coarse_ids,
        )

    def search_pallas(
        self,
        queries,
        k: int,
        ef: int,
        interpret: bool = False,
        n_seeds: int = 1,
    ):
        """Level-0 beam search in the Pallas kernel (ops.pallas_graph):
        per-query VMEM state + async HBM gathers — the at-scale search path
        (the XLA vmapped traversal measured unusable at 1M).

        Entry points come from a brute-force matmul over the coarse
        (upper-level) nodes when available — at 1M that is a ~60k-row scan in
        microseconds, and it avoids the XLA greedy-descent loop entirely —
        falling back to the graph's global entry point otherwise.

        ``n_seeds > 1`` launches independent beams from the top-``n_seeds``
        coarse entries per query and merges their shortlists — a robustness
        knob for queries far from the gallery manifold (distances nearly tie,
        a single greedy beam can wander; measured on OOD synthetic queries in
        scripts/measure_serving_graph.py). Costs ~``n_seeds`` x; results are
        deduplicated before the final top-k."""
        from ..ops.graph_search import hnsw_descend_entries
        from ..ops.pallas_graph import pallas_beam_search

        import jax

        q = normalize_rows(jnp.asarray(queries))
        Q = q.shape[0]
        use_coarse = self.coarse_ids is not None and self.coarse_ids.shape[0] > 0
        s = max(1, int(n_seeds))
        if use_coarse:
            s = min(s, int(self.coarse_ids.shape[0]))
            cvecs = self.vectors[self.coarse_ids].astype(q.dtype)
            _, top = jax.lax.top_k(q @ cvecs.T, s)
            starts = self.coarse_ids[top]                   # (Q, s)
        else:
            s = 1
            starts = hnsw_descend_entries(
                self.vectors, self.nbru, self.entry, q
            )[:, None]
        if s == 1:
            scores, ids = pallas_beam_search(
                self.vectors, self.nbr0, q, starts[:, 0], ef=ef,
                interpret=interpret,
            )
            return scores[:, :k], ids[:, :k]

        # multi-seed: tile queries s-fold, one kernel launch, merge per query
        qs = jnp.repeat(q, s, axis=0)                       # (Q*s, D)
        scores, ids = pallas_beam_search(
            self.vectors, self.nbr0, qs, starts.reshape(-1), ef=ef,
            interpret=interpret,
        )
        scores = scores.reshape(Q, s * scores.shape[1])
        ids = ids.reshape(Q, s * ids.shape[1])
        # dedupe beam overlaps: an entry is a duplicate if an equal id
        # appears earlier in score order; demote duplicates to -inf
        order = jnp.argsort(-scores, axis=1)
        ids_o = jnp.take_along_axis(ids, order, axis=1)
        sc_o = jnp.take_along_axis(scores, order, axis=1)
        eq = ids_o[:, :, None] == ids_o[:, None, :]        # (Q, L, L)
        earlier = jnp.tril(
            jnp.ones((ids_o.shape[1], ids_o.shape[1]), bool), -1
        )                                                  # earlier[a, b]: b < a
        dup = jnp.any(eq & earlier[None], axis=2)
        sc_o = jnp.where(dup, -jnp.inf, sc_o)
        ts, t = jax.lax.top_k(sc_o, k)
        return ts, jnp.take_along_axis(ids_o, t, axis=1)

    def to_arrays(self):
        arrays = {
            "vectors": np.asarray(self.vectors, np.float32),
            "nbr0": np.asarray(self.nbr0, np.int32),
            "nbru": np.asarray(self.nbru, np.int32),
        }
        if self.coarse_ids is not None:
            arrays["coarse_ids"] = np.asarray(self.coarse_ids, np.int32)
        return {"entry": self.entry, "ef_default": self.ef_default}, arrays

    @classmethod
    def from_arrays(cls, meta, arrays):
        return cls(
            vectors=jnp.asarray(arrays["vectors"]),
            nbr0=jnp.asarray(arrays["nbr0"]),
            nbru=jnp.asarray(arrays["nbru"]),
            entry=int(meta["entry"]),
            ef_default=int(meta.get("ef_default", 100)),
            coarse_ids=(
                jnp.asarray(arrays["coarse_ids"]) if "coarse_ids" in arrays else None
            ),
        )


def build_hnsw(
    vecs,
    m: int = 16,
    m0: Optional[int] = None,
    ef_construction: int = 100,
    seed: int = 42,
    normalize: bool = True,
) -> HNSWIndex:
    """Native-build an HNSW graph (reference params m=16, ef=100 at
    offline.py:114; m0 = 2m per the paper and nnsearch.py:157)."""
    v = jnp.asarray(vecs, jnp.float32)
    if normalize:
        v = normalize_rows(v)
    m0 = m0 or 2 * m
    nbr0, nbru, levels, entry, top = _build_graph(
        np.asarray(v), m, m0, ef_construction, seed
    )
    coarse = np.where(levels >= 1)[0].astype(np.int32)
    return HNSWIndex(
        vectors=v,
        nbr0=jnp.asarray(nbr0),
        nbru=jnp.asarray(nbru),
        entry=entry,
        ef_default=max(ef_construction, 16),
        coarse_ids=jnp.asarray(coarse) if len(coarse) else None,
    )


@partial(jax.jit, static_argnames=("k",))
def _rerank_members(vectors, q, cand_idx, valid, k: int):
    """Exact inner-product re-rank of expanded member candidates.

    ``vectors`` is the L2-normalized gallery, passed as a jit *argument* so the
    8 GB array at 1M is never captured into the compile payload (CLAUDE.md
    tunnel rule). The (Q, E) gather is tiny next to a full scan: E rows per
    query instead of N.
    """
    v = jnp.take(vectors, cand_idx, axis=0)          # (Q, E, D)
    s = jnp.einsum("qd,qed->qe", q.astype(v.dtype), v)
    s = jnp.where(valid, s.astype(jnp.float32), -jnp.inf)
    top_s, top_j = jax.lax.top_k(s, k)
    top_i = jnp.take_along_axis(cand_idx, top_j, axis=1)
    return top_s, top_i


def _rerank_refine(
    cb, unique_codes, rcb, refine_codes,
    q, cand_u, cand_idx, valid, k: int,
):
    """Codes-only re-rank of expanded members — ``ops.pq.pq_refine_rerank``
    with unique-code rows as the coarse side (the TPU answer to the
    reference's raw-vector re-sort, nnsearch.py:669-680; E = expand*k slots
    per query, ~230 MB reconstructed at Q=70/E=400/D=2048)."""
    from ..ops.pq import pq_refine_rerank

    return pq_refine_rerank(
        cb, unique_codes, rcb, refine_codes, q, cand_u, cand_idx, valid, k
    )


@register("hnsw_pq")
@dataclass
class HNSWPQIndex:
    codewords: jnp.ndarray     # (M, Ks, ds)
    unique_codes: jnp.ndarray  # (U, M)
    nbr0: jnp.ndarray          # (U, m0)
    nbru: jnp.ndarray
    entry: int
    group_offsets: np.ndarray  # (U+1,) member ranges into group_members
    group_members: np.ndarray  # (N,) image ids grouped by unique code
    ef_default: int = 100
    coarse_ids: Optional[jnp.ndarray] = None  # upper-level members (ADC seeds)
    # two-level refinement codes (IVFADC+R style, Jegou et al. 2011): a second
    # PQ over the residual x - decode(coarse_code), indexed by IMAGE id (group
    # members share a coarse code but differ in residual). ~refine_M bytes per
    # vector; enables the codes-only high-recall re-rank (`*+refine` methods)
    # the beyond-HBM regime needs (VERDICT r3 #1).
    refine_codewords: Optional[jnp.ndarray] = None  # (Mr, Ksr, dsr)
    refine_codes: Optional[jnp.ndarray] = None      # (N, Mr) uint8
    # OPQ orthogonal pre-rotations (build with opq=True): coarse codes live
    # in rotated space (queries rotate before LUTs; graph distances are
    # rotation-invariant), refine codes quantize original-space residuals
    rotation: Optional[jnp.ndarray] = None
    refine_rotation: Optional[jnp.ndarray] = None
    # per-NODE centroid refine codes (VERDICT r4 #7): the mean member
    # residual, re-quantized with the refine codebook, plus the stored
    # ||centroid||^2 — the graph walk then scores nodes by exact two-level
    # centroid distance (2 LUT gathers + 1 scalar) instead of noisy
    # coarse-only ADC. The graph itself stays built over coarse decodes
    # (a centroid-built graph measured WORSE at 1M — it collapses a
    # cluster's codes onto one point). ~(Mr + 4) bytes per node; absent on
    # refine_M=0 builds.
    node_codes: Optional[jnp.ndarray] = None        # (U, Mr)
    node_norm2: Optional[jnp.ndarray] = None        # (U,) f32

    @property
    def n(self) -> int:
        return int(self.group_members.shape[0])

    def search(
        self, queries, k: int, ef: Optional[int] = None, method: str = "auto",
        vectors=None, expand: int = 4, n_seeds: int = 8,
        centroid_walk: bool = True,
    ) -> Tuple:
        """Returns (scores, idx) over *image ids*, expanding unique-code hits
        in rank order until k members are collected (nnsearch.py:669-680).

        ``method``:
        - ``"adc"``: exact ADC scan over the **unique codes** then expand.
          Group members share one code, so this reaches the full-scan ADC's
          shortlist recall (0.838@100 at the 1M/Ks=2^13 driver point at
          1.89 ms/q, BASELINE.md) at ~U/N of its cost — strictly dominating
          the graph walk on-chip (recall 0.606 at 4.6 ms/q).
        - ``"adc+rerank"``: the adc route expanded to ``expand * k`` member
          slots, then re-ranked by exact inner product against the raw
          ``vectors`` (L2-normalized ``(N, D)`` device array — pass the
          gallery the serving/flat index already holds; the codes alone
          cannot order members that share a code). Lifts shortlist recall
          to the candidate-set ceiling for one small gather+matmul.
        - ``"adc+refine"``: same expansion, but the re-rank reconstructs each
          candidate from its coarse + residual codes (two-level PQ; build
          with ``refine_M > 0``) — **codes only**, no raw vectors, ~32 bytes
          per image instead of 8 KB: the high-recall route for the beyond-HBM
          regime (measured 1M driver point: 0.897/0.907/0.920 recall@100 at
          refine_M=16/32/64, 2.8-3.5 ms/q, BASELINE.md; default refine_M=32
          clears the >= 0.9 bar).
        - ``"graph"``: beam search over the code graph — the reference's
          traversal semantics (nnsearch.py:585-683), and the only mode whose
          per-query HBM traffic is o(U): it earns its keep past single-chip
          HBM (>= 10M codes) or for strict reference-parity studies.
        - ``"graph+refine"``: the beam walk (ef-wide shortlist, ``n_seeds``
          coarse-ADC entry points) + the refine re-rank — beyond-HBM traffic
          *and* re-ranked recall. Measured 1M/hybrid-OPQ operating point:
          ``ef=320, n_seeds=32`` gives recall@100 = 0.936 at 14.7 ms/q
          (saturates by ef=480 — graph-quality-bound; BASELINE.md).
        - ``"auto"`` (default): ``"adc+refine"`` when refine codes exist,
          else ``"adc"`` — the measured winners everywhere a single chip can
          hold the codes (``"adc+rerank"`` needs the raw vectors, which PQ
          exists to avoid storing).
        """
        q = normalize_rows(jnp.asarray(queries))
        U = self.unique_codes.shape[0]
        if method == "auto":
            method = "adc+refine" if self.refine_codes is not None else "adc"
        rerank = method == "adc+rerank"
        refine = method in ("adc+refine", "graph+refine")
        if rerank and vectors is None:
            raise ValueError("method='adc+rerank' requires the raw `vectors`")
        if refine and self.refine_codes is None:
            raise ValueError(
                f"method={method!r} requires refine codes (build with refine_M > 0)"
            )
        n_slots = min(expand * k, self.n) if (rerank or refine) else k
        if method in ("adc", "adc+rerank", "adc+refine"):
            from ..ops.pq import pq_search

            k_unique = min(max(n_slots, 1), U)
            scores_u, idx_u = pq_search(
                PQCodebook(self.codewords, self.rotation),
                self.unique_codes.astype(jnp.int32),
                q,
                k_unique,
            )
        else:
            # the walk's shortlist is its beam: ef unique codes, later
            # expanded to n_slots member slots (members per code ~ N/U)
            ef_eff = ef or max(self.ef_default, k)
            k_unique = min(max(ef_eff, k), U) if refine else min(k, U)
            if centroid_walk and self.node_codes is not None:
                # centroid-ADC walk: exact two-level distance to each node's
                # member centroid (norm2 - 2 q.x via two ip-LUT gathers) —
                # the coarse-only ADC's quantization noise both misorders
                # the beam and hides the funnel directions (VERDICT r4 #7)
                scores_u, idx_u = hnsw_search_batch_pq_centroid(
                    self.unique_codes, self.codewords, self.node_codes,
                    self.refine_codewords, self.node_norm2,
                    self.nbr0, self.nbru, self.entry, q, k_unique,
                    max(ef_eff, k_unique), coarse_ids=self.coarse_ids,
                    n_seeds=n_seeds, rotation=self.rotation,
                    node_rotation=self.refine_rotation,
                )
            else:
                q_g = q @ self.rotation if self.rotation is not None else q
                scores_u, idx_u = hnsw_search_batch_pq(
                    self.unique_codes, self.codewords, self.nbr0, self.nbru,
                    self.entry, q_g, k_unique, max(ef_eff, k_unique),
                    coarse_ids=self.coarse_ids, n_seeds=n_seeds,
                )
        out_scores, out_idx, out_u, valid, total = self._expand_members(
            np.asarray(idx_u), np.asarray(scores_u, np.float32), n_slots
        )
        if rerank:
            top_s, top_i = _rerank_members(
                jnp.asarray(vectors), q, jnp.asarray(out_idx),
                jnp.asarray(valid), k
            )
            out_scores = np.asarray(top_s, np.float32)
            out_idx = np.asarray(top_i, np.int32)
        elif refine:
            top_s, top_i = _rerank_refine(
                PQCodebook(self.codewords, self.rotation), self.unique_codes,
                PQCodebook(self.refine_codewords, self.refine_rotation),
                self.refine_codes, q, jnp.asarray(out_u),
                jnp.asarray(out_idx), jnp.asarray(valid), k,
            )
            out_scores = np.asarray(top_s, np.float32)
            out_idx = np.asarray(top_i, np.int32)

        for row in np.nonzero(total < k)[0]:  # rare: backfill (nnsearch.py:676-678)
            fill = int(min(total[row], k))
            missing = np.setdiff1d(np.arange(self.n), out_idx[row, :fill])[: k - fill]
            out_idx[row, fill : fill + len(missing)] = missing
        return jnp.asarray(out_scores[:, :k]), jnp.asarray(out_idx[:, :k])

    def _expand_members(self, idx_u, scores_u, k):
        """Vectorized rank-order group expansion to ``k`` member slots.

        One banded ``searchsorted`` instead of a per-query python loop:
        output slot j of query q belongs to the hit whose cumulative member
        count first exceeds j; its member is then
        ``members[offsets[hit] + (j - slots_before_hit)]``.
        Returns (scores, idx, ucode_idx, valid, total): (Q, k) arrays +
        (Q,) totals; ``ucode_idx`` is each slot's unique-code row (the
        refine re-rank decodes the coarse part from it).
        """
        U = self.unique_codes.shape[0]
        Q, ku = idx_u.shape
        offs, members = self.group_offsets, self.group_members

        safe_u = np.clip(idx_u, 0, U - 1)
        cnt = np.where(idx_u >= 0, offs[safe_u + 1] - offs[safe_u], 0)  # (Q, ku)
        cum = np.cumsum(cnt, axis=1)
        total = cum[:, -1]
        before = cum - cnt  # member slots filled before each hit

        band = np.int64(self.n + 1)  # cum <= n < band: rows occupy disjoint bands
        rows = band * np.arange(Q, dtype=np.int64)[:, None]
        flat_cum = (cum + rows).ravel()
        j = np.arange(k, dtype=np.int64)[None, :]
        r = np.searchsorted(flat_cum, (j + rows).ravel(), side="right").reshape(
            Q, k
        ) - ku * np.arange(Q, dtype=np.int64)[:, None]
        valid = j < np.minimum(total, k)[:, None]
        r = np.minimum(r, ku - 1)

        qi = np.arange(Q)[:, None]
        pos = offs[safe_u[qi, r]] + (j - before[qi, r])
        out_idx = np.where(valid, members[np.minimum(pos, self.n - 1)], 0).astype(
            np.int32
        )
        out_scores = np.where(valid, scores_u[qi, r], -np.inf).astype(np.float32)
        out_u = np.where(valid, safe_u[qi, r], 0).astype(np.int32)
        return out_scores, out_idx, out_u, valid, total

    def to_arrays(self):
        arrays = {
            "codewords": np.asarray(self.codewords, np.float32),
            "unique_codes": np.asarray(self.unique_codes),
            "nbr0": np.asarray(self.nbr0, np.int32),
            "nbru": np.asarray(self.nbru, np.int32),
            "group_offsets": np.asarray(self.group_offsets, np.int64),
            "group_members": np.asarray(self.group_members, np.int32),
        }
        if self.coarse_ids is not None:
            arrays["coarse_ids"] = np.asarray(self.coarse_ids, np.int32)
        if self.refine_codes is not None:
            arrays["refine_codewords"] = np.asarray(
                self.refine_codewords, np.float32
            )
            arrays["refine_codes"] = np.asarray(self.refine_codes)
        if self.rotation is not None:
            arrays["rotation"] = np.asarray(self.rotation, np.float32)
        if self.refine_rotation is not None:
            arrays["refine_rotation"] = np.asarray(
                self.refine_rotation, np.float32
            )
        if self.node_codes is not None:
            arrays["node_codes"] = np.asarray(self.node_codes)
            arrays["node_norm2"] = np.asarray(self.node_norm2, np.float32)
        return {"entry": self.entry, "ef_default": self.ef_default}, arrays

    @classmethod
    def from_arrays(cls, meta, arrays):
        return cls(
            codewords=jnp.asarray(arrays["codewords"]),
            unique_codes=jnp.asarray(arrays["unique_codes"]),
            nbr0=jnp.asarray(arrays["nbr0"]),
            nbru=jnp.asarray(arrays["nbru"]),
            entry=int(meta["entry"]),
            group_offsets=np.asarray(arrays["group_offsets"]),
            group_members=np.asarray(arrays["group_members"]),
            ef_default=int(meta.get("ef_default", 100)),
            coarse_ids=(
                jnp.asarray(arrays["coarse_ids"]) if "coarse_ids" in arrays else None
            ),
            refine_codewords=(
                jnp.asarray(arrays["refine_codewords"])
                if "refine_codewords" in arrays else None
            ),
            refine_codes=(
                jnp.asarray(arrays["refine_codes"])
                if "refine_codes" in arrays else None
            ),
            rotation=(
                jnp.asarray(arrays["rotation"]) if "rotation" in arrays else None
            ),
            refine_rotation=(
                jnp.asarray(arrays["refine_rotation"])
                if "refine_rotation" in arrays else None
            ),
            node_codes=(
                jnp.asarray(arrays["node_codes"])
                if "node_codes" in arrays else None
            ),
            node_norm2=(
                jnp.asarray(arrays["node_norm2"])
                if "node_norm2" in arrays else None
            ),
        )


def build_hnsw_pq(
    vecs,
    M: int = 16,
    Ks: int = 256,
    m: int = 16,
    m0: Optional[int] = None,
    ef_construction: int = 100,
    iters: int = 20,
    seed: int = 42,
    normalize: bool = True,
    train_sample: Optional[int] = None,
    builder: str = "auto",
    refine_M: int = 32,
    refine_Ks: int = 256,
    opq: bool = False,
    opq_iters: int = 10,
    n: Optional[int] = None,
    max_graph_bytes: int = 12 << 30,
    graph_k_candidates: int = 96,
    graph_alpha: float = 1.2,
) -> HNSWPQIndex:
    """PQ-encode, dedupe codes, graph the unique codes (nnsearch.py:585-683).

    The reference driver's operating point is Ks=2^13 (offline.py:116,
    ``N_words=2**13``); at that codebook size nearly every database row gets a
    unique code, so the graph covers ~N nodes and the build cost approaches
    plain HNSW over the decoded vectors. ``builder``: ``"native"`` (C++
    insert, exact HNSW semantics), ``"tpu"`` (kNN-graph + device pruning —
    minutes at 1M where the single-thread insert is hours), or ``"auto"``
    (tpu above 32k unique codes: measured 31 min native vs ~2 min TPU at
    162k unique, BASELINE.md).

    ``refine_M > 0`` (default 32) additionally trains a second PQ over the
    residuals ``x - decode(code)`` and stores per-image residual codes
    (``refine_M`` bytes each) — the two-level code the ``*+refine`` search
    methods reconstruct from. Set 0 to skip (halves index bytes, caps
    recall@100 at the coarse-ADC ceiling).

    ``opq``: ``True`` learns an orthogonal pre-rotation for BOTH code levels;
    ``"refine"`` rotates only the residual level — keeping the coarse codes'
    dedup (and therefore the small graph + cheap unique-code ADC scan) while
    the refine re-rank gets the rotation's lower reconstruction error.

    ``vecs`` may be passed as a ONE-ELEMENT LIST to donate the gallery: the
    builder then owns the only reference and frees the 8 GB (at 1M x 2048)
    device buffer before materializing the decoded graph vectors — without
    donation the graph stage holds gallery + decoded (12 GB) and the OPQ
    path's extra transient churn tips a 16 GB chip over (measured).

    **Streaming (beyond-HBM/host-RAM) build**: ``vecs`` may instead be a
    CALLABLE yielding ``(c, D)`` row chunks, with the total row count as
    ``n=`` (same contract as ``build_ivfpq``; see ``index/streaming.py``).
    The gallery then never materializes: one pass gathers the fit + refine
    training samples (device chunks stay on device), the (O)PQ fits run on
    those samples, and a second pass encodes both code levels chunk-by-chunk.
    The graph stage only ever touches the deduped codes. Fits are
    bit-identical to an in-memory build called with the same explicit
    ``train_sample`` (the sample index rule is ``pq_train``'s own); with
    ``train_sample=None`` streaming always trains on the faiss-style
    32*Ks-row budget — it cannot fall back to whole-database fits."""
    streaming = callable(vecs)
    if streaming and n is None:
        raise ValueError(
            "build_hnsw_pq(vecs=<callable>) needs the total row count n="
        )
    if isinstance(vecs, list):
        vecs = vecs.pop()  # empty the caller's holder: transfer ownership
    if opq not in (False, True, "refine"):
        raise ValueError(f"opq must be False, True, or 'refine'; got {opq!r}")
    # opq=True rotates BOTH levels; opq="refine" rotates only the residual
    # level: the coarse codes then keep their dedup (a full rotation measured
    # 162k -> 1M unique codes at the 1M driver point — rotated subspaces no
    # longer align with cluster axes — inflating the graph and the ADC scan
    # 6x) while the refine re-rank still gets the rotation's ~3x lower
    # reconstruction error, which is what bounds final ordering
    coarse_opq = opq is True
    refine_cw = refine_codes_np = refine_rot = None
    rotation = None
    if streaming:
        from ..ops.pq import opq_train
        from .streaming import stream_encode_pieces, stream_gather_rows

        N = int(n)
        ts = min(N, train_sample if train_sample is not None
                 else max(65536, 32 * Ks))
        # ops.pq.train_indices IS the rule pq_train/opq_train use
        # internally, so the streamed fit is bit-identical to an in-memory
        # build given the same explicit train_sample (tests/test_index_graph.py)
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
        D = int(fit_rows.shape[1])
        if refine_M:  # clamp to the largest divisor of D (as in-memory)
            refine_M = min(refine_M, D)
            while D % refine_M:
                refine_M -= 1
        if coarse_opq:
            # pass explicit train_sample through (all gathered rows — the
            # bit-parity contract with in-memory), but keep None as None:
            # pinning it to the 32*Ks gather would override opq_train's
            # tiered 8*Ks-rotation / 16*Ks-final-fit budgets and re-create
            # the measured OOM pattern (ops/pq.py:141-145) at Ks=2^13
            cb = opq_train(
                fit_rows, M=M, Ks=Ks, iters=iters, opq_iters=opq_iters,
                seed=seed,
                train_sample=(
                    int(fit_rows.shape[0]) if train_sample is not None
                    else None
                ),
            )
        else:
            cb = pq_train(
                fit_rows, M=M, Ks=Ks, iters=iters, seed=seed,
                train_sample=int(fit_rows.shape[0]),
            )
        del fit_rows
        rcb = None
        if refine_M:
            # pq_encode is row-local, so encoding the sampled rows directly
            # equals slicing the full code matrix at ridx
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
            refine_cw = rcb.codewords
            refine_rot = rcb.rotation
        # ONE streamed pass encodes both code levels chunk-by-chunk; only
        # the (c, M) uint codes ever cross to host
        code_parts, ref_parts = [], []
        for _, piece in stream_encode_pieces(
            vecs, N, 131072, normalize=normalize
        ):
            code = pq_encode(cb, piece)
            code_parts.append(np.asarray(code))
            if refine_M:
                ref_parts.append(np.asarray(
                    pq_encode(rcb, piece - pq_decode(cb, code))
                ))
            del piece, code
        codes = (
            np.concatenate(code_parts) if len(code_parts) > 1
            else code_parts[0]
        )
        del code_parts
        if refine_M:
            refine_codes_np = (
                np.concatenate(ref_parts) if len(ref_parts) > 1
                else ref_parts[0]
            )
            del ref_parts
        v = None
    else:
        v = jnp.asarray(vecs, jnp.float32)
        if normalize:
            v = normalize_rows(v)
        N = v.shape[0]
        if coarse_opq:
            from ..ops.pq import opq_train

            # learned orthogonal pre-rotation (Ge et al. CVPR'13): coarse
            # codes quantize rotated vectors; graph distances are
            # rotation-invariant
            cb = opq_train(
                v, M=M, Ks=Ks, iters=iters, opq_iters=opq_iters, seed=seed,
                train_sample=train_sample,
            )
        else:
            cb = pq_train(
                v, M=M, Ks=Ks, iters=iters, seed=seed,
                train_sample=train_sample,
            )
        codes = np.asarray(pq_encode(cb, v))

        if refine_M:
            # clamp to the largest divisor of D not above the request (the
            # default 16 would otherwise reject small toy dims outright)
            D = int(v.shape[1])
            refine_M = min(refine_M, D)
            while D % refine_M:
                refine_M -= 1
        if refine_M:
            # train the residual codebook on a row subsample (faiss-style
            # points-per-centroid budget), then encode every residual
            # chunked — a full f32 residual copy is another 8 GB at 1M x 2048
            rs = min(N, max(16384, 32 * refine_Ks))
            if rs < N:
                ridx = train_indices(N, rs, seed + 1)
                vi = v[jnp.asarray(ridx)]
                ci = jnp.asarray(codes[ridx])
            else:
                vi, ci = v, jnp.asarray(codes)
            residuals = vi - pq_decode(cb, ci)   # original space
            if opq:
                from ..ops.pq import opq_train

                rcb = opq_train(
                    residuals, M=refine_M, Ks=refine_Ks, iters=iters,
                    opq_iters=opq_iters, seed=seed + 1,
                )
            else:
                rcb = pq_train(
                    residuals, M=refine_M, Ks=refine_Ks, iters=iters,
                    seed=seed + 1,
                )
            step = 131072
            parts = []
            for s0 in range(0, N, step):
                res = v[s0 : s0 + step] - pq_decode(
                    cb, jnp.asarray(codes[s0 : s0 + step])
                )
                parts.append(np.asarray(pq_encode(rcb, res)))
            refine_codes_np = (
                np.concatenate(parts, 0) if len(parts) > 1 else parts[0]
            )
            refine_cw = rcb.codewords
            refine_rot = rcb.rotation

    unique, inverse = np.unique(codes, return_inverse=True, axis=0)
    order = np.argsort(inverse, kind="stable")
    counts = np.bincount(inverse, minlength=unique.shape[0])
    offsets = np.zeros(unique.shape[0] + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    members = order.astype(np.int32)

    # graph distances between codes = distances between decoded vectors
    m0 = m0 or 2 * m
    U = unique.shape[0]
    if builder == "auto":
        builder = "tpu" if U > 32_768 else "native"
    codewords = cb.codewords
    rotation = cb.rotation
    # free the 8 GB device gallery before materializing decodes (releases
    # the caller's buffer too under list-donation, see docstring)
    del v, vecs, cb

    # node centroids (VERDICT r4 #7): re-quantize each unique code's MEAN
    # member residual with the refine codebook. The walk then scores nodes
    # by exact two-level centroid distance, replacing the coarse decode's
    # quantization noise (the measured graph-quality bound at the 1M driver
    # point) with the residual codebook's ~10x smaller error. (The graph
    # itself stays built over coarse decodes — see _fill_centroid.) Memory
    # gate: the f32 accumulate + mean buffers (2 x U x D) plus the bf16
    # graph must fit the graph budget — over it, node codes fall back to
    # each group's first member (next branch).
    node_codes_np = node_norm2_np = None
    D_full = int(codewords.shape[0] * codewords.shape[2])
    if (
        refine_codes_np is not None
        and (2 * 4 + 2) * U * D_full > max_graph_bytes
    ):
        # mean buffers (2 x U x D f32) over budget (the >= 10M regime's
        # ~1.6M unique codes): fall back to each group's FIRST member as the
        # node representative — a free host gather, still far closer to the
        # member cloud than the coarse decode alone
        node_codes_np = np.ascontiguousarray(
            refine_codes_np[members[offsets[:-1]]]
        )
    elif refine_codes_np is not None:
        rcb_t = PQCodebook(
            jnp.asarray(refine_cw),
            jnp.asarray(refine_rot) if refine_rot is not None else None,
        )
        inv32 = inverse.reshape(-1).astype(np.int32)
        step_n = 131072

        # pad rows scatter into the sacrificial row U (dropped below), so
        # every chunk keeps one compiled shape
        @partial(jax.jit, donate_argnums=(0,))
        def _acc(bufp, rcodes, inv):
            return bufp.at[inv].add(pq_decode(rcb_t, rcodes))

        bufp = jnp.zeros((U + 1, D_full), jnp.float32)
        for s0 in range(0, N, step_n):
            rc = refine_codes_np[s0 : s0 + step_n]
            iv = inv32[s0 : s0 + step_n]
            if rc.shape[0] < step_n and N > step_n:
                padn = step_n - rc.shape[0]
                rc = np.concatenate(
                    [rc, np.zeros((padn, rc.shape[1]), rc.dtype)]
                )
                iv = np.concatenate([iv, np.full((padn,), U, np.int32)])
            bufp = _acc(bufp, jnp.asarray(rc), jnp.asarray(iv))

        @partial(jax.jit, donate_argnums=(0,))
        def _mean(bufp, cnt):
            return bufp * cnt[:, None]

        invcnt = np.zeros((U + 1,), np.float32)
        invcnt[:U] = 1.0 / counts
        mean_res = _mean(bufp, jnp.asarray(invcnt))
        del bufp
        node_codes_np = np.asarray(pq_encode(rcb_t, mean_res[:U]))
        del mean_res, rcb_t
    if builder == "tpu":
        from .graph_build import build_hnsw_graph_tpu

        # the unique-code graph lives decoded in HBM: refuse clearly when it
        # cannot fit instead of OOMing mid-build (which wedges the TPU worker
        # for minutes). Dedup is scale-limited: at 1M/Ks=2^13 ~16% of codes
        # are unique, but at 10M the same Ks measured ~93% unique (9.3M — a
        # Ks=8192-words-per-subspace cell grid cannot give 82k clusters one
        # word each, so cells cut through clusters), i.e. a 38 GB decode.
        # The >= 10M codes-only regime belongs to build_ivfpq(refine_M=...),
        # matching the reference's own IVF switch at scale (knn.py:43-54).
        graph_bytes = int(U) * int(
            codewords.shape[0] * codewords.shape[2]
        ) * 2
        if graph_bytes > max_graph_bytes:
            raise ValueError(
                f"unique-code graph needs {graph_bytes / 2**30:.1f} GiB "
                f"decoded ({U} unique codes) — over the max_graph_bytes "
                f"budget ({max_graph_bytes / 2**30:.1f} GiB). PQ dedup "
                "collapses at this scale/Ks; use build_ivfpq(refine_M=...) "
                "for the beyond-graph regime, or raise max_graph_bytes if "
                "the device really has the memory."
            )
        # chunked on-device decode straight to bf16, written in place into
        # one donated pre-allocated buffer: a concatenate-of-parts would
        # hold parts + output simultaneously (2x U*D*2 bytes — at the 10M
        # regime's ~2M unique codes that is 2 x 7.8 GB and OOMs); donation
        # caps the peak at the buffer plus one f32 chunk decode
        uq = jnp.asarray(unique)
        step = 131072

        @partial(jax.jit, donate_argnums=(0,))
        def _fill(buf, cw, chunk, start):
            dec = pq_decode(PQCodebook(cw), chunk).astype(buf.dtype)
            return jax.lax.dynamic_update_slice(buf, dec, (start, 0))

        # centroid variant: graph vectors stay COARSE decodes — a
        # centroid-shifted graph collapses a cluster's ~20 codes onto one
        # point and starves edge diversity (measured at 1M: coarse walk on a
        # centroid-built graph lost 0.04 recall@100 vs the coarse-built
        # graph) — but the exact f32 norm of the centroid (coarse + refine,
        # un-rotated to the shared original space) is computed alongside for
        # the walk's two-level distance
        @partial(jax.jit, donate_argnums=(0,))
        def _fill_centroid(buf, cw, rot, rcw, rrot, chunk, nchunk, start):
            dec = pq_decode(PQCodebook(cw), chunk)
            cent = pq_decode(PQCodebook(cw, rot), chunk) + pq_decode(
                PQCodebook(rcw, rrot), nchunk
            )
            n2 = jnp.sum(cent * cent, axis=1)
            return (
                jax.lax.dynamic_update_slice(
                    buf, dec.astype(buf.dtype), (start, 0)
                ),
                n2,
            )

        decoded_dev = jnp.zeros((U, D_full), jnp.bfloat16)
        n2_parts = []
        rot_dev = jnp.asarray(rotation) if rotation is not None else None
        rrot_dev = (
            jnp.asarray(refine_rot) if refine_rot is not None else None
        )
        for s in range(0, U, step):
            if node_codes_np is not None:
                decoded_dev, n2 = _fill_centroid(
                    decoded_dev, codewords, rot_dev,
                    jnp.asarray(refine_cw), rrot_dev,
                    uq[s : s + step],
                    jnp.asarray(node_codes_np[s : s + step]),
                    jnp.int32(s),
                )
                n2_parts.append(np.asarray(n2, np.float32))
            else:
                decoded_dev = _fill(
                    decoded_dev, codewords, uq[s : s + step], jnp.int32(s)
                )
        if n2_parts:
            node_norm2_np = np.concatenate(n2_parts)
        del uq
        # graph_k_candidates/graph_alpha (VERDICT r4 #7): the unique-code
        # space is crowded with near-duplicate codes (members of one cluster
        # differing in a few subspace words), so the default 96-candidate
        # kNN pass can fill with intra-clique edges and starve the diverse
        # mid-range links the beam needs to funnel between cliques; a bigger
        # candidate pool + a looser prune keep them (measured sweep in
        # BASELINE.md)
        nbr0, nbru, levels, entry, top = build_hnsw_graph_tpu(
            decoded_dev, m=m, m0=m0, seed=seed,
            k_candidates=graph_k_candidates, alpha=graph_alpha,
        )
    else:
        # host-side numpy decode: np.asarray of a device decode would pull
        # GBs through the MB/s tunnel (CLAUDE.md gotcha)
        cw = np.asarray(codewords)                      # (M, Ks, ds) small
        M_, _, ds = cw.shape
        decoded = cw[np.arange(M_)[None, :], unique.astype(np.int64), :]
        decoded = np.ascontiguousarray(
            decoded.reshape(U, M_ * ds), np.float32
        )
        if node_codes_np is not None:
            # per-node centroid norms for the walk distance (graph vectors
            # stay coarse decodes — see the TPU-path comment; only the small
            # codebooks/codes cross the tunnel)
            rcw = np.asarray(refine_cw)
            Mr_, _, dsr = rcw.shape
            rdec = rcw[
                np.arange(Mr_)[None, :], node_codes_np.astype(np.int64), :
            ].reshape(U, Mr_ * dsr)
            if refine_rot is not None:
                rdec = rdec @ np.asarray(refine_rot).T
            cent = (
                decoded @ np.asarray(rotation).T
                if rotation is not None else decoded
            ) + rdec
            node_norm2_np = np.sum(
                cent.astype(np.float64) ** 2, axis=1
            ).astype(np.float32)
            del cent, rdec
        nbr0, nbru, levels, entry, top = _build_graph(
            decoded, m, m0, ef_construction, seed
        )
    coarse = np.where(levels >= 1)[0].astype(np.int32)
    return HNSWPQIndex(
        codewords=codewords,
        unique_codes=jnp.asarray(unique),
        nbr0=jnp.asarray(nbr0),
        nbru=jnp.asarray(nbru),
        entry=entry,
        group_offsets=offsets,
        group_members=members,
        ef_default=max(ef_construction, 16),
        coarse_ids=jnp.asarray(coarse) if len(coarse) else None,
        refine_codewords=refine_cw,
        refine_codes=(
            jnp.asarray(refine_codes_np) if refine_codes_np is not None else None
        ),
        rotation=rotation,
        refine_rotation=refine_rot,
        node_codes=(
            jnp.asarray(node_codes_np) if node_codes_np is not None else None
        ),
        node_norm2=(
            jnp.asarray(node_norm2_np) if node_norm2_np is not None else None
        ),
    )
