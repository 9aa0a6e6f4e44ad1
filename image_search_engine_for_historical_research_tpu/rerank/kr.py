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


@partial(
    jax.jit,
    static_argnames=(
        "nq", "k1", "k2", "row_chunk", "set_chunk", "jaccard_chunk",
        "matmul_dtype", "stage", "compact_width",
    ),
)
def _kr_chunked_program(
    feat,
    lambda_value,
    nq: int,
    k1: int,
    k2: int,
    row_chunk: int,
    set_chunk: int,
    jaccard_chunk: int,
    matmul_dtype,
    stage: str = "full",
    compact_width: int = 0,
):
    """The whole chunked re-rank as ONE jitted program: every chunk loop is a
    ``lax.scan``, so the tunneled chip pays one dispatch instead of one per
    chunk (~100 x 33 ms at 100k — round 3's host loop spent a third of its
    wall time on dispatch round-trips). ``feat`` is passed as an argument,
    never closed over (CLAUDE.md: captured arrays upload with the compile
    payload)."""
    n, D = feat.shape
    fb = feat.astype(matmul_dtype)
    K = k1 + 1
    Kh = int(round(k1 / 2)) + 1

    def chunked(x, c):
        """Pad with row 0 to a multiple of c and stack into (C, c, ...) scan
        xs (padded tail rows are computed then sliced off)."""
        pad = (-x.shape[0]) % c
        if pad:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])], axis=0
            )
        return x.reshape((-1, c) + x.shape[1:])

    fbc = chunked(fb, row_chunk)

    # pass A: column max of the raw distance (normalizer, Reranking.py:503);
    # duplicate pad rows cannot change a max
    def colmax_step(cm, rows):
        d = 2.0 - 2.0 * jnp.einsum(
            "rd,nd->rn", rows, fb, preferred_element_type=jnp.float32
        )
        return jnp.maximum(cm, jnp.max(d, axis=0)), None

    colmax, _ = jax.lax.scan(
        colmax_step, jnp.full((n,), -jnp.inf, jnp.float32), fbc
    )

    # pass B: top-(k1+1) of the normalized distance (a two-stage blocked
    # top_k was tried here and measured SLOWER — the flat top_k fuses into
    # the producing matmul while the blocked variant materializes the
    # (r, n/512, K) winners)
    def topk_step(_, rows):
        d = 2.0 - 2.0 * jnp.einsum(
            "rd,nd->rn", rows, fb, preferred_element_type=jnp.float32
        )
        d = d / jnp.clip(colmax, min=1e-12)[None, :]
        _, idx = jax.lax.top_k(-d, K)
        return None, idx.astype(jnp.int32)

    _, rank_c = jax.lax.scan(topk_step, None, fbc)
    rank = rank_c.reshape(-1, K)[:n]                   # (n, K)
    rank_h = rank[:, :Kh]

    # ablation early-outs (scripts/ablate_kr.py): return a rank matrix that
    # depends on everything computed so far (blocking DCE) so each stage's
    # device cost can be timed in isolation on the chip
    def _early(dep):
        dqe = 2.0 - 2.0 * jnp.einsum(
            "qd,nd->qn", fb[:nq], fb, preferred_element_type=jnp.float32
        )
        return jnp.argsort(
            dqe[:, nq:] + (dep * 1e-20).astype(jnp.float32), axis=1
        ), jnp.bool_(False)

    if stage == "dist":
        return _early(jnp.sum(rank))

    # reciprocity masks: i in top(j) for each candidate j = rank[i, l]
    iexp = jnp.arange(n, dtype=jnp.int32)[:, None, None]
    recip = jnp.any(rank[rank] == iexp, axis=2)        # (n, K)
    recip_h = jnp.any(rank_h[rank_h] == iexp, axis=2)  # (n, Kh)
    size_h = jnp.sum(recip_h, axis=1).astype(jnp.float32)

    if stage == "recip":
        return _early(jnp.sum(recip) + jnp.sum(size_h))

    # expansion + weights (Reranking.py:525-538): candidate j in R(i)
    # contributes R_half(j) when |R_half(j) & R(i)| > 2/3 |R_half(j)|. Sets
    # are fixed-width padded index rows (pad sentinel = n); duplicates in the
    # union keep their first (sorted) slot, like the dense boolean OR. The
    # scan chunk bounds the (r, K, Kh, K) membership test and the (r, n)
    # recomputed distance row. The set-member distances come from that MXU
    # matmul + a scalar row gather (r, W) — NOT a (r, W, D) vector gather,
    # which at W=(k1+1)(k1/2+2)=252, D=2048 moved ~200 GB through the
    # scalar-unit-bound gather path at 100k (the round-4 146 ms/q limiter;
    # same trade as ops/pq.py's one-hot-vs-gather crossover).
    def expand_step(_, xs):
        rank_cc, recip_cc, rows = xs
        r = rank_cc.shape[0]
        j = jnp.clip(rank_cc, 0, n - 1)               # (r, K)
        Rh_idx = rank_h[j]                            # (r, K, Kh)
        Rh_m = recip_h[j]                             # (r, K, Kh)
        Ri = jnp.where(recip_cc, rank_cc, -1)         # (r, K)
        in_R = jnp.any(
            Rh_idx[..., None] == Ri[:, None, None, :], axis=3
        ) & Rh_m                                      # (r, K, Kh)
        overlap = jnp.sum(in_R, axis=2)               # (r, K)
        grow = recip_cc & (overlap > (2.0 / 3.0) * size_h[j])
        add_idx = jnp.where(grow[..., None] & Rh_m, Rh_idx, n).reshape(
            r, K * Kh
        )
        base_idx = jnp.where(recip_cc, rank_cc, n)
        s = jnp.sort(jnp.concatenate([base_idx, add_idx], axis=1), axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((r, 1), bool), s[:, 1:] == s[:, :-1]], axis=1
        )
        valid = (s < n) & ~dup
        sc = jnp.clip(s, 0, n - 1)
        drow = 2.0 - 2.0 * jnp.einsum(
            "rd,nd->rn", rows, fb, preferred_element_type=jnp.float32
        )
        drow = drow / jnp.clip(colmax, min=1e-12)[None, :]
        dval = jnp.take_along_axis(drow, sc, axis=1)  # (r, W)
        w = jnp.where(valid, jnp.exp(-dval), 0.0)
        vv = w / jnp.clip(jnp.sum(w, axis=1, keepdims=True), min=1e-12)
        return None, (jnp.where(valid, sc, 0), jnp.where(valid, vv, 0.0))

    _, (vi, vv) = jax.lax.scan(
        expand_step, None,
        (chunked(rank, set_chunk), chunked(recip, set_chunk),
         chunked(fb, set_chunk)),
    )
    W = K * (Kh + 1)
    vidx = vi.reshape(-1, W)[:n]                       # (n, W)
    vval = vv.reshape(-1, W)[:n]

    if stage == "expand":
        return _early(jnp.sum(vidx) + jnp.sum(vval))

    # lossless compaction (the round-5 ablation: the Jaccard scan's per-row
    # sort over k2*W columns was 60% of the whole program, and W=273 is the
    # worst-case expansion width — real k-reciprocal sets are far narrower).
    # Stable-partition valid entries to the front and slice to the static
    # ``compact_width`` budget; a row with more valid entries than the budget
    # raises ``overflow`` and the host wrapper re-runs at full width, so
    # ranks stay exactly dense-path-identical.
    overflow = jnp.bool_(False)
    if compact_width and compact_width < W:
        invalid = vval <= 0.0
        order = jnp.argsort(invalid.astype(jnp.int32), axis=1, stable=True)
        vidx = jnp.take_along_axis(vidx, order, axis=1)[:, :compact_width]
        vval = jnp.take_along_axis(vval, order, axis=1)[:, :compact_width]
        overflow = jnp.any(
            jnp.sum(~invalid, axis=1) > compact_width
        )
        W = compact_width

    # dense query side of the qe'd V: (nq, n) scatter-add of k2 sparse rows
    nbq = rank[:nq, :k2]
    gi = vidx[nbq].reshape(nq, -1)
    gv = (vval[nbq] / k2).reshape(nq, -1)
    vqT = (
        jnp.zeros((nq, n), jnp.float32)
        .at[jnp.arange(nq)[:, None], gi]
        .add(gv)
    ).T                                                # (n, nq)

    if stage == "vq":
        return _early(jnp.sum(vqT) + jnp.sum(jnp.where(overflow, 1.0, 0.0)))

    # query-expanded sparse rows -> Jaccard vs the dense query side: each
    # row's k2 nearest sparse V rows are concatenated (the qe mean sums
    # duplicate columns), segment-summed by column id via a sorted cumsum,
    # then min-summed against vqT. Chunk bounds the (r, k2 W, nq) transient
    # (~1.7 GB at jaccard_chunk=4096, nq=70).
    def jacc_step(_, nbr_cc):
        r = nbr_cc.shape[0]
        gi2 = vidx[nbr_cc].reshape(r, -1)             # (r, k2*W)
        gv2 = (vval[nbr_cc] / k2).reshape(r, -1)
        L = gi2.shape[1]
        if stage == "jacc_nosort":
            # ablation variant (WRONG values, same shapes/ops minus the
            # sort+segment-sum): isolates the per-row sort cost
            si, sval = gi2, gv2
        else:
            # one multi-operand sort carries the f32 payload with the int
            # keys — measured cheaper than argsort + two take_along gathers
            si, sv = jax.lax.sort((gi2, gv2), dimension=1, num_keys=1)
            cs = jnp.cumsum(sv, axis=1)
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
            sval = jnp.where(last, cs - base, 0.0)    # summed value at group end
        if stage == "jacc_nogather":
            # ablation variant (WRONG values): isolates the (r, L, nq)
            # sparse row-gather cost by replacing it with a broadcast
            vq = jnp.broadcast_to(vqT[0][None, None], (r, L, nq))
        else:
            vq = vqT[si]                              # (r, L, nq)
        minsum = jnp.sum(jnp.minimum(sval[..., None], vq), axis=1)
        return None, 1.0 - minsum / (2.0 - minsum)

    _, jacc_c = jax.lax.scan(
        jacc_step, None, chunked(rank[:, :k2], jaccard_chunk)
    )
    jacc = jacc_c.reshape(-1, nq)[:n]                  # (n, nq)

    dq = 2.0 - 2.0 * jnp.einsum(
        "qd,nd->qn", fb[:nq], fb, preferred_element_type=jnp.float32
    )
    dq = dq / jnp.clip(colmax, min=1e-12)[None, :]
    final = jacc.T * (1.0 - lambda_value) + dq * lambda_value
    return jnp.argsort(final[:, nq:], axis=1), overflow


def kr_rerank_chunked(
    qvecs,
    vecs,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.3,
    row_chunk: int = 8192,
    set_chunk: int = 2048,
    jaccard_chunk: int = 8192,
    matmul_dtype=jnp.float32,
    stage: str = "full",
    compact_width: int = 96,
):
    """Chunked k-reciprocal re-rank: same semantics as ``kr_rerank_scores``
    without materializing any (n, n) array — the 100k+-gallery envelope the
    reference reaches by batching its torch loops (Reranking.py:447-624,
    ``batch_torch_topk``/``batch_v`` stream 6000-row blocks and never hold the
    full Jaccard; its dense ``V`` is the one O(n^2) buffer we also eliminate).

    Structure: two scanned matmul passes (column max, then top-(k1+1) of the
    normalized distance), reciprocity tests on the (n, k1+1) rank table,
    fixed-width padded expansion sets, a sparse V compacted from the
    worst-case width (k1+1)(k1/2+2)=273 down to ``compact_width`` (the
    round-5 ablation measured the Jaccard scan's per-row sort over the
    k2-fold concatenation of those rows at 60% of the whole program; real
    k-reciprocal sets are far narrower than the worst case), and a scanned
    query-expanded Jaccard against the dense (n, nq) query side — all inside
    ONE jitted program (``_kr_chunked_program``). If any row's expanded set
    exceeds ``compact_width`` the program reports overflow and the wrapper
    re-runs once at full width, so results are EXACTLY dense-path-identical
    either way (parity-tested). Peak memory ~ n x W x 8 bytes for the sparse
    V plus per-scan-step transients bounded by the chunk sizes. Ranks (Q, N)
    ascending."""
    qn = l2n(jnp.asarray(qvecs, jnp.float32))
    gn = l2n(jnp.asarray(vecs, jnp.float32))
    feat = jnp.concatenate([qn, gn], axis=0)
    kw = dict(
        nq=int(qn.shape[0]),
        k1=k1,
        k2=k2,
        row_chunk=row_chunk,
        set_chunk=set_chunk,
        jaccard_chunk=jaccard_chunk,
        matmul_dtype=matmul_dtype,
        stage=stage,
    )
    lam = jnp.float32(lambda_value)
    ranks, overflow = _kr_chunked_program(
        feat, lam, compact_width=compact_width, **kw
    )
    if compact_width and bool(overflow):
        # a row's expanded set outgrew the compaction budget: re-run at the
        # worst-case width (exact; rare — the budget covers typical data)
        ranks, _ = _kr_chunked_program(feat, lam, compact_width=0, **kw)
    return ranks


def kr_rerank(
    qvecs,
    vecs,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.3,
    max_bytes: int = 8 << 30,
    method: str = "auto",
    matmul_dtype=jnp.float32,
):
    """Ranks (Q, N) ascending by the re-ranked distance (Reranking.py:616-624).

    ``method="auto"`` uses the dense one-jit path while its ~6 (n, n) f32
    buffers (~24 bytes/entry peak) fit ``max_bytes``, and the chunked path
    (``kr_rerank_chunked``: no O(n^2) buffer, >= 100k-gallery envelope)
    beyond that. ``"dense"`` / ``"chunked"`` force a path; dense raises
    rather than OOM-wedge the 16 GB chip (CLAUDE.md).

    ``matmul_dtype`` (chunked path only) runs the two full distance passes in
    that dtype — ``jnp.bfloat16`` halves their bytes and quadruples MXU rate;
    the top-(k1+1) sets it produces differ only where distances tie below
    bf16 resolution (see BASELINE.md for the measured effect). f32 default
    keeps exact dense-path parity.
    """
    n = int(qvecs.shape[0]) + int(vecs.shape[0])
    est = 24 * n * n
    if method == "auto":
        method = "dense" if est <= max_bytes else "chunked"
    if method == "chunked":
        return kr_rerank_chunked(
            qvecs, vecs, k1=k1, k2=k2, lambda_value=lambda_value,
            matmul_dtype=matmul_dtype,
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
