"""k-reciprocal re-ranking (CVPR'17 person re-ID) as dense device linear algebra.

TPU-native counterpart of ``kr_reranking``
(``/root/reference/src/utils/Reranking.py:447-624``): the reference builds
k-reciprocal neighbour sets with host loops over python lists, an inverted index,
and a sparse Jaccard accumulation on CUDA+numpy. Here the sets are boolean
matrices and every step is a (masked) matmul — O(n^2) memory, which matches the
reference's own dense ``V (all_num, all_num)`` float32 allocation (:513-525), so
the practical size envelope is the same (~tens of thousands of images).

Semantics kept: k1=20 reciprocal neighbours with 2/3-overlap expansion, exp(-d)
weights, k2=6 query expansion of V, Jaccard distance, final
``(1-lambda) * jaccard + lambda * original`` with lambda=0.3.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.normalization import l2n


@partial(jax.jit, static_argnames=("k1", "k2"))
def kr_rerank_scores(
    qvecs: jnp.ndarray,
    vecs: jnp.ndarray,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.3,
) -> jnp.ndarray:
    """Returns the final distance matrix (Q, N); rank ascending.

    Inputs are L2-normalized descriptors (the reference assumes this:
    ``dist = 2 - 2 q.g``, Reranking.py:460).
    """
    feat = jnp.concatenate([qvecs, vecs], axis=0)
    nq = qvecs.shape[0]
    n = feat.shape[0]

    d = 2.0 - 2.0 * (feat @ feat.T)                     # (n, n)
    d = d / jnp.clip(jnp.max(d, axis=0, keepdims=True), min=1e-12)

    # top-(k1+1) neighbour membership, row-wise
    def topk_mask(dist, k):
        _, idx = jax.lax.top_k(-dist, k)
        m = jnp.zeros((n, n), bool)
        rows = jnp.arange(n, dtype=jnp.int32)[:, None]
        return m.at[rows, idx].set(True)

    nbr = topk_mask(d, k1 + 1)                          # i -> top k1+1
    recip = jnp.logical_and(nbr, nbr.T)                 # k-reciprocal set R(i, k1)

    half = topk_mask(d, int(round(k1 / 2)) + 1)
    recip_half = jnp.logical_and(half, half.T)          # R(j, k1/2)

    # expansion: include R_half(j) when |R_half(j) & R(i)| > 2/3 |R_half(j)|
    overlap = recip_half.astype(jnp.float32) @ recip.astype(jnp.float32).T  # (j, i)
    sizes = jnp.sum(recip_half, axis=1).astype(jnp.float32)[:, None]
    grow = jnp.logical_and(overlap > (2.0 / 3.0) * sizes, recip.T)          # (j, i)
    expanded = jnp.logical_or(
        recip, (grow.astype(jnp.float32).T @ recip_half.astype(jnp.float32)) > 0
    )

    # V: exp(-d) weights over the expanded sets, row-normalized
    w = jnp.where(expanded, jnp.exp(-d), 0.0)
    V = w / jnp.clip(jnp.sum(w, axis=1, keepdims=True), min=1e-12)

    # query expansion of V over the k2 nearest neighbours
    _, idx2 = jax.lax.top_k(-d, k2)
    V = jnp.mean(V[idx2], axis=1)                       # (n, n)

    # Jaccard distance for query rows against everything
    def jac_row(vq):
        minsum = jnp.sum(jnp.minimum(vq[None, :], V), axis=1)  # (n,)
        return 1.0 - minsum / (2.0 - minsum)

    jaccard = jax.lax.map(jac_row, V[:nq])              # (nq, n)

    orig = d[:nq, :]
    final = jaccard * (1 - lambda_value) + orig * lambda_value
    return final[:, nq:]                                # (Q, N)


@partial(jax.jit, donate_argnums=(1,))
def _colmax_chunk(rows, colmax, fb):
    """Running per-column max of d = 2 - 2 f f^T over a row chunk."""
    d = 2.0 - 2.0 * jnp.einsum(
        "rd,nd->rn", rows, fb, preferred_element_type=jnp.float32
    )
    return jnp.maximum(colmax, jnp.max(d, axis=0))


@partial(jax.jit, static_argnames=("K",))
def _topk_chunk(rows, fb, colmax, K: int):
    """Top-(k1+1) nearest columns of the column-normalized distance."""
    d = 2.0 - 2.0 * jnp.einsum(
        "rd,nd->rn", rows, fb, preferred_element_type=jnp.float32
    )
    d = d / jnp.clip(colmax, min=1e-12)[None, :]
    _, idx = jax.lax.top_k(-d, K)
    return idx.astype(jnp.int32)


@jax.jit
def _expand_weigh_chunk(rank_c, recip_c, rows, rank, rank_h, recip_h, size_h,
                        fb, colmax):
    """Reciprocal-set expansion + exp(-d) weights for one row chunk.

    Mirrors the dense formulation above (and Reranking.py:525-538): candidate
    j in R(i) contributes R_half(j) when |R_half(j) & R(i)| > 2/3 |R_half(j)|.
    Sets are fixed-width padded index rows (pad sentinel = n); duplicates in
    the union keep their first (sorted) slot, like the dense boolean OR.
    Returns the sparse V chunk: (r, W) int32 indices + row-normalized f32
    weights, W = (k1+1)(1 + k1/2+1).
    """
    n = rank.shape[0]
    r, K = rank_c.shape
    Kh = rank_h.shape[1]
    j = jnp.clip(rank_c, 0, n - 1)                    # (r, K)
    Rh_idx = rank_h[j]                                # (r, K, Kh)
    Rh_m = recip_h[j]                                 # (r, K, Kh)
    Ri = jnp.where(recip_c, rank_c, -1)               # (r, K)
    in_R = jnp.any(
        Rh_idx[..., None] == Ri[:, None, None, :], axis=3
    ) & Rh_m                                          # (r, K, Kh)
    overlap = jnp.sum(in_R, axis=2)                   # (r, K)
    grow = recip_c & (overlap > (2.0 / 3.0) * size_h[j])
    add_idx = jnp.where(grow[..., None] & Rh_m, Rh_idx, n).reshape(r, K * Kh)
    base_idx = jnp.where(recip_c, rank_c, n)
    s = jnp.sort(jnp.concatenate([base_idx, add_idx], axis=1), axis=1)  # (r, W)
    dup = jnp.concatenate(
        [jnp.zeros((r, 1), bool), s[:, 1:] == s[:, :-1]], axis=1
    )
    valid = (s < n) & ~dup
    sc = jnp.clip(s, 0, n - 1)
    dot = jnp.einsum(
        "rd,rwd->rw", rows, fb[sc], preferred_element_type=jnp.float32
    )
    dval = (2.0 - 2.0 * dot) / jnp.clip(colmax[sc], min=1e-12)
    w = jnp.where(valid, jnp.exp(-dval), 0.0)
    vval = w / jnp.clip(jnp.sum(w, axis=1, keepdims=True), min=1e-12)
    return jnp.where(valid, sc, 0), jnp.where(valid, vval, 0.0)


@jax.jit
def _jaccard_chunk(nbr_c, vidx, vval, vqT):
    """Query-expanded sparse rows -> Jaccard distance vs the dense query side.

    ``nbr_c``: (r, k2) nearest rows of each chunk row; their sparse V rows are
    concatenated (the qe mean sums duplicate columns), segment-summed by
    column id via a sorted cumsum, then min-summed against ``vqT`` (n, nq).
    """
    k2 = nbr_c.shape[1]
    r = nbr_c.shape[0]
    gi = vidx[nbr_c].reshape(r, -1)                   # (r, k2*W)
    gv = (vval[nbr_c] / k2).reshape(r, -1)
    order = jnp.argsort(gi, axis=1)
    si = jnp.take_along_axis(gi, order, axis=1)
    sv = jnp.take_along_axis(gv, order, axis=1)
    cs = jnp.cumsum(sv, axis=1)
    L = si.shape[1]
    last = jnp.concatenate(
        [si[:, :-1] != si[:, 1:], jnp.ones((r, 1), bool)], axis=1
    )
    first = jnp.concatenate(
        [jnp.ones((r, 1), bool), si[:, 1:] != si[:, :-1]], axis=1
    )
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    start = jax.lax.cummax(jnp.where(first, pos, -1), axis=1)
    base = jnp.where(
        start > 0,
        jnp.take_along_axis(cs, jnp.clip(start - 1, 0), axis=1),
        0.0,
    )
    sval = jnp.where(last, cs - base, 0.0)            # summed value at group end
    vq = vqT[si]                                      # (r, L, nq)
    minsum = jnp.sum(jnp.minimum(sval[..., None], vq), axis=1)  # (r, nq)
    return 1.0 - minsum / (2.0 - minsum)


def kr_rerank_chunked(
    qvecs,
    vecs,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.3,
    row_chunk: int = 8192,
    set_chunk: int = 2048,
    jaccard_chunk: int = 4096,
    matmul_dtype=jnp.float32,
):
    """Chunked k-reciprocal re-rank: same semantics as ``kr_rerank_scores``
    without materializing any (n, n) array — the 100k+-gallery envelope the
    reference reaches by batching its torch loops (Reranking.py:447-624,
    ``batch_torch_topk``/``batch_v`` stream 6000-row blocks and never hold the
    full Jaccard; its dense ``V`` is the one O(n^2) buffer we also eliminate).

    Structure: two chunked matmul passes (column max, then top-(k1+1) of the
    normalized distance), reciprocity tests on the (n, k1+1) rank table,
    fixed-width padded expansion sets, a sparse V of width (k1+1)(k1/2+2),
    and a per-chunk query-expanded Jaccard against the dense (n, nq) query
    side. Chunk sizes bound per-pass transients: the expansion pass gathers
    (r, W, D) vectors (~2 GB at set_chunk=2048, D=2048), the Jaccard pass
    holds (r, k2 W, nq) f32 (~1.7 GB at jaccard_chunk=4096, nq=70).
    Peak memory ~ n x (k1+1)(k1/2+2) x 8 bytes for V (~200 MB at 100k) plus
    per-chunk transients. Ranks (Q, N) ascending, identical to the dense path
    (parity-tested).
    """
    qn = l2n(jnp.asarray(qvecs, jnp.float32))
    gn = l2n(jnp.asarray(vecs, jnp.float32))
    nq = int(qn.shape[0])
    feat = jnp.concatenate([qn, gn], axis=0)
    n = int(feat.shape[0])
    fb = feat.astype(matmul_dtype)
    K = k1 + 1
    Kh = int(round(k1 / 2)) + 1

    def padded_rows(lo, size):
        rows = fb[lo : lo + size]
        if rows.shape[0] < size:  # pad final chunk with row 0 (results sliced off)
            rows = jnp.concatenate(
                [rows, jnp.broadcast_to(fb[:1], (size - rows.shape[0], fb.shape[1]))]
            )
        return rows

    # pass A: column max of the raw distance (normalizer, Reranking.py:503)
    colmax = jnp.full((n,), -jnp.inf, jnp.float32)
    for lo in range(0, n, row_chunk):
        colmax = _colmax_chunk(padded_rows(lo, row_chunk), colmax, fb)

    # pass B: top-(k1+1) of the normalized distance
    parts = []
    for lo in range(0, n, row_chunk):
        parts.append(_topk_chunk(padded_rows(lo, row_chunk), fb, colmax, K))
    rank = jnp.concatenate(parts, axis=0)[:n]          # (n, K)
    del parts
    rank_h = rank[:, :Kh]

    # reciprocity masks: i in top(j) for each candidate j = rank[i, l]
    iexp = jnp.arange(n, dtype=jnp.int32)[:, None, None]
    recip = jnp.any(rank[rank] == iexp, axis=2)        # (n, K)
    recip_h = jnp.any(rank_h[rank_h] == iexp, axis=2)  # (n, Kh)
    size_h = jnp.sum(recip_h, axis=1).astype(jnp.float32)

    # expansion + weights, chunked (the (r, K, Kh, K) membership test bounds r)
    vi_parts, vv_parts = [], []
    for lo in range(0, n, set_chunk):
        hi = min(n, lo + set_chunk)
        pad = set_chunk - (hi - lo)
        rank_c = jnp.concatenate([rank[lo:hi], rank[:1].repeat(pad, 0)]) if pad \
            else rank[lo:hi]
        recip_c = jnp.concatenate([recip[lo:hi], recip[:1].repeat(pad, 0)]) if pad \
            else recip[lo:hi]
        vi, vv = _expand_weigh_chunk(
            rank_c, recip_c, padded_rows(lo, set_chunk), rank, rank_h,
            recip_h, size_h, fb, colmax,
        )
        vi_parts.append(vi)
        vv_parts.append(vv)
    vidx = jnp.concatenate(vi_parts, axis=0)[:n]       # (n, W)
    vval = jnp.concatenate(vv_parts, axis=0)[:n]
    del vi_parts, vv_parts

    # dense query side of the qe'd V: (nq, n) scatter-add of k2 sparse rows
    nbq = rank[:nq, :k2]
    gi = vidx[nbq].reshape(nq, -1)
    gv = (vval[nbq] / k2).reshape(nq, -1)
    vqT = (
        jnp.zeros((nq, n), jnp.float32)
        .at[jnp.arange(nq)[:, None], gi]
        .add(gv)
    ).T                                                # (n, nq)

    # per-chunk Jaccard of every row's qe'd sparse V against the query side
    # (a larger chunk than the expansion pass: its transient is (r, k2*W, nq)
    # f32 — and on the tunneled chip each python-loop chunk pays a ~33 ms
    # dispatch round-trip, so fewer/bigger chunks win)
    jacc_parts = []
    for lo in range(0, n, jaccard_chunk):
        hi = min(n, lo + jaccard_chunk)
        pad = jaccard_chunk - (hi - lo)
        nbr_c = rank[lo:hi, :k2]
        if pad:
            nbr_c = jnp.concatenate([nbr_c, nbr_c[:1].repeat(pad, 0)])
        jacc_parts.append(_jaccard_chunk(nbr_c, vidx, vval, vqT))
    jacc = jnp.concatenate(jacc_parts, axis=0)[:n]     # (n, nq)

    dq = 2.0 - 2.0 * jnp.einsum(
        "qd,nd->qn", fb[:nq], fb, preferred_element_type=jnp.float32
    )
    dq = dq / jnp.clip(colmax, min=1e-12)[None, :]
    final = jacc.T * (1.0 - lambda_value) + dq * lambda_value
    return jnp.argsort(final[:, nq:], axis=1)


def kr_rerank(
    qvecs,
    vecs,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.3,
    max_bytes: int = 8 << 30,
    method: str = "auto",
):
    """Ranks (Q, N) ascending by the re-ranked distance (Reranking.py:616-624).

    ``method="auto"`` uses the dense one-jit path while its ~6 (n, n) f32
    buffers (~24 bytes/entry peak) fit ``max_bytes``, and the chunked path
    (``kr_rerank_chunked``: no O(n^2) buffer, >= 100k-gallery envelope)
    beyond that. ``"dense"`` / ``"chunked"`` force a path; dense raises
    rather than OOM-wedge the 16 GB chip (CLAUDE.md).
    """
    n = int(qvecs.shape[0]) + int(vecs.shape[0])
    est = 24 * n * n
    if method == "auto":
        method = "dense" if est <= max_bytes else "chunked"
    if method == "chunked":
        return kr_rerank_chunked(
            qvecs, vecs, k1=k1, k2=k2, lambda_value=lambda_value
        )
    if est > max_bytes:
        raise ValueError(
            f"kr_rerank(method='dense') needs ~{est / 2**30:.1f} GiB for n={n} "
            f"(queries+gallery); budget is {max_bytes / 2**30:.1f} GiB. The dense "
            "path is inherently O(n^2) (the reference's own V buffer, "
            "Reranking.py:513) — use method='chunked' (the auto default at this "
            "size) or raise max_bytes explicitly."
        )
    final = kr_rerank_scores(
        l2n(jnp.asarray(qvecs)), l2n(jnp.asarray(vecs)), k1=k1, k2=k2,
        lambda_value=lambda_value,
    )
    return jnp.argsort(final, axis=1)
