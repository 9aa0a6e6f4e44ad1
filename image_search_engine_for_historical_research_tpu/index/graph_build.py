"""TPU-accelerated navigable-graph construction (kNN graph + heuristic prune).

The native C++ HNSW builder (``native/hnsw_build.cpp``) is faithful but serial:
~50 min at 200k x 2048 on one core. This builder moves all distance work onto
the MXU — the TPU-native answer to "index 1M images in minutes"
(BASELINE.json north star):

1. exact kNN graph via the batched streaming top-k (the whole 1M x 1M problem
   is ~250 fused matmul scans);
2. HNSW-style heuristic pruning (keep candidate j only if it is closer to the
   node than to every already-kept neighbor — Malkov & Yashunin Alg. 4,
   the reference's ``_select_heuristic`` at nnsearch.py:442-476) run **on
   device**: a vmapped lax.scan over each node's candidate list using the
   candidates' pairwise distance matrix (one batched einsum per chunk);
3. reverse-edge union capped by distance (host numpy pass, O(N * m));
4. geometric level assignment; upper-level neighbor lists are the pruned
   candidates restricted to sampled nodes.

The result is the same padded neighbor-table format the traversal kernels
consume, so ``HNSWIndex`` works identically with either builder. Search
semantics are NSW-equivalent rather than insert-order-identical to hnswlib —
recall is validated against exact search in tests.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk import exact_topk


@jax.jit
def _normalize_bf16_chunk(x):
    """Row-normalize one chunk in f32 and emit bf16 (semantics of
    ``index.base.normalize_rows`` with eps=0)."""
    x32 = x.astype(jnp.float32)
    n = jnp.linalg.norm(x32, axis=1, keepdims=True)
    return (x32 / jnp.clip(n, min=1e-30)).astype(jnp.bfloat16)


def _prune_core(vectors, nbr_ids, nbr_scores, m: int, alpha: float = 1.2):
    """Heuristic-prune each node's candidate list on device.

    ``nbr_ids (B, K)`` candidates sorted by ascending distance to the node
    (excluding self), ``nbr_scores (B, K)`` their ip scores to the node.
    Returns ``(ids (B, m) kept ids -1-padded, scores (B, m) their ip scores
    (-inf at invalid slots), n_kept (B,))`` where ``n_kept`` counts the
    HEURISTIC survivors only — slots beyond it hold keepPrunedConnections
    backfill.
    """
    B, K = nbr_ids.shape
    if K < m:  # tiny galleries / m > k_candidates: pad candidate columns
        pad = m - K
        nbr_ids = jnp.concatenate(
            [nbr_ids, jnp.full((B, pad), -1, nbr_ids.dtype)], axis=1
        )
        nbr_scores = jnp.concatenate(
            [nbr_scores, jnp.full((B, pad), -1e30, nbr_scores.dtype)], axis=1
        )
        K = m
    cand = vectors[jnp.clip(nbr_ids, 0)]                 # (B, K, D)
    # pairwise candidate similarity -> squared L2 (unit vectors): 2 - 2 s
    sims = jnp.einsum(
        "bkd,bjd->bkj", cand, cand, preferred_element_type=jnp.float32
    )
    d_cc = 2.0 - 2.0 * sims                              # (B, K, K)
    d_nc = 2.0 - 2.0 * nbr_scores                        # (B, K) node-candidate

    def prune_one(d_nc_row, d_cc_row, ids_row, sc_row):
        # scan candidates in order; keep j iff d(node, j) < d(j, every kept)
        def step(carry, j):
            kept_mask, n_kept = carry
            d_j_kept = jnp.where(kept_mask, d_cc_row[j], jnp.inf)
            # alpha > 1 is Vamana-style relaxed pruning: reject only when a
            # kept neighbor is decisively closer, preserving longer-range
            # "highway" edges a pure kNN graph lacks between clusters
            closer_to_kept = jnp.any(d_j_kept * alpha < d_nc_row[j])
            ok = jnp.logical_and(
                jnp.logical_and(~closer_to_kept, n_kept < m), ids_row[j] >= 0
            )
            kept_mask = kept_mask.at[j].set(ok)
            return (kept_mask, n_kept + ok.astype(jnp.int32)), None

        (kept_mask, _), _ = jax.lax.scan(
            step, (jnp.zeros((K,), bool), jnp.int32(0)), jnp.arange(K)
        )
        # backfill with nearest skipped candidates (keepPrunedConnections)
        order = jnp.argsort(jnp.where(kept_mask, 0, 1) * K + jnp.arange(K))
        chosen = jnp.where(jnp.arange(K) < m, ids_row[order], -1)[:m]
        # mask out candidates that were invalid
        valid = jnp.where(jnp.arange(K) < m, ids_row[order] >= 0, False)[:m]
        n_kept = jnp.minimum(kept_mask.sum().astype(jnp.int32), m)
        sc = jnp.where(valid, sc_row[order][:m], -jnp.inf)
        return jnp.where(valid, chosen, -1), sc, n_kept

    return jax.vmap(prune_one)(d_nc, d_cc, nbr_ids, nbr_scores)


_prune_chunk = partial(jax.jit, static_argnames=("m", "alpha"))(_prune_core)


def _dedup_rows_dev(ids, sc):
    """Device version of ``_dedup_rows``: mark duplicate ids within each row
    invalid (id -1, score -inf), keeping the earliest column among equals
    (stable-sort semantics identical to the numpy pass, asserted in tests)."""
    B, W = ids.shape
    order = jnp.argsort(ids, axis=1, stable=True)
    sorted_ids = jnp.take_along_axis(ids, order, 1)
    dup_sorted = jnp.concatenate(
        [
            jnp.zeros((B, 1), bool),
            (sorted_ids[:, 1:] == sorted_ids[:, :-1]) & (sorted_ids[:, 1:] >= 0),
        ],
        axis=1,
    )
    dup = (
        jnp.zeros((B, W), bool)
        .at[jnp.arange(B)[:, None], order]
        .set(dup_sorted)
    )
    return jnp.where(dup, -1, ids), jnp.where(dup, -jnp.inf, sc)


@partial(jax.jit, static_argnames=("m", "alpha"))
def _union_reprune_chunk(vectors, c_ids, c_sc, b_ids, b_sc, m: int, alpha: float):
    """Reverse-edge union + re-prune for one node chunk, entirely on device:
    concat candidates with backlinks, dedup, stable sort by descending score,
    heuristic-prune to m. Replaces the round-2 host concat/dedup/argsort loop
    whose per-chunk uploads dominated the pass through the tunnel."""
    u_ids = jnp.concatenate([c_ids, b_ids], axis=1)
    u_sc = jnp.concatenate(
        [c_sc.astype(jnp.float32), b_sc.astype(jnp.float32)], axis=1
    )
    u_ids, u_sc = _dedup_rows_dev(u_ids, u_sc)
    order = jnp.argsort(-u_sc, axis=1, stable=True)
    u_ids = jnp.take_along_axis(u_ids, order, 1)
    u_sc = jnp.take_along_axis(u_sc, order, 1)
    ids, _, n_kept = _prune_core(vectors, u_ids, u_sc, m, alpha)
    return ids, n_kept


@jax.jit
def _drop_self_chunk(sc, ix, row0):
    """Device-side self-hit removal for one kNN batch (the old host drain):
    each row drops its own id from the top list (wherever it appears), rows
    without a self hit drop their last column instead."""
    B, Ke = ix.shape
    rows = row0 + jnp.arange(B, dtype=ix.dtype)[:, None]
    self_mask = ix == rows
    first_self = jnp.argmax(self_mask, axis=1).astype(jnp.int32)
    has_self = jnp.take_along_axis(self_mask, first_self[:, None], 1)[:, 0]
    drop = jnp.where(has_self, first_self, Ke - 1)
    j = jnp.arange(Ke - 1, dtype=jnp.int32)[None, :]
    gidx = j + (j >= drop[:, None]).astype(jnp.int32)
    return jnp.take_along_axis(sc, gidx, 1), jnp.take_along_axis(ix, gidx, 1)


def build_knn_graph(
    vectors: jnp.ndarray,
    k: int = 64,
    batch: int = 4096,
    matmul_dtype=jnp.bfloat16,
    mesh=None,
    approximate: bool = False,
    recall_target: float = 0.99,
):
    """Exact kNN graph (ids + ip scores), self excluded, via batched scans.
    Returns DEVICE arrays ``(ids (N, k), scores (N, k))`` — the whole graph
    build pipeline is device-resident (round 3: the round-2 host drain +
    re-upload cost more than the compute through the ~66 MB/s tunnel).

    ``mesh``: shard the database rows over the mesh and run each batch's scan
    as per-shard top-k + all-gather merge (``parallel.sharded_exact_topk``) —
    the dominant ~N/batch matmul passes then scale linearly with mesh size
    (the "v5e-8 builds the 1M index in minutes" path; VERDICT r2 #2). Row
    count must be divisible by the mesh size in that mode.

    ``approximate``: use the fused ``lax.approx_max_k`` for the per-batch
    candidate selection instead of exact ``lax.top_k`` — candidates feed a
    heuristic pruner that keeps only m0 of them, so a ~1% tail miss does not
    change graph quality (beam recall parity is asserted in tests), while the
    top-k cost disappears into the producing matmul. The self hit scores
    exactly 1.0 (row max), which ``approx_max_k`` retains, so self-removal
    below is unaffected.
    """
    N = vectors.shape[0]
    k_eff = min(k + 1, N)
    db = vectors
    if mesh is not None:
        from ..parallel import shard_batch, sharded_exact_topk

        db = shard_batch(vectors, mesh)
    id_chunks, sc_chunks = [], []
    for s in range(0, N, batch):
        q = vectors[s : s + batch]
        if mesh is not None:
            sc, ix = sharded_exact_topk(
                q, db, k_eff, mesh, matmul_dtype=matmul_dtype,
                approximate=approximate, recall_target=recall_target,
            )
            # commit the replicated mesh output to the default device so the
            # downstream single-device chunked passes see ordinary arrays —
            # device-to-device, never through host numpy (at 1M the per-chunk
            # host drains total ~0.8 GB through the slow tunnel)
            sc = jax.device_put(sc, jax.devices()[0])
            ix = jax.device_put(ix, jax.devices()[0])
        else:
            sc, ix = exact_topk(
                q, db, k_eff, matmul_dtype=matmul_dtype,
                approximate=approximate, recall_target=recall_target,
            )
        sc, ix = _drop_self_chunk(sc, ix, jnp.int32(s))
        sc_chunks.append(sc)
        id_chunks.append(ix)
    if len(id_chunks) == 1:
        return id_chunks[0], sc_chunks[0]
    return jnp.concatenate(id_chunks, 0), jnp.concatenate(sc_chunks, 0)


def build_hnsw_graph_tpu(
    vectors: jnp.ndarray,
    m: int = 16,
    m0: Optional[int] = None,
    k_candidates: int = 96,
    max_levels: int = 6,
    seed: int = 42,
    batch: int = 8192,
    alpha: float = 1.2,
    mesh=None,
    approximate: bool = True,
    verbose: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
    """Full graph build; returns (nbr0, nbru, levels, entry, top_level) in the
    native builder's output format. ``mesh`` shards the kNN pass (the
    dominant cost) over the device mesh; pruning/levels are unchanged, so
    sharded and single-device builds produce identical graphs up to
    score-tie ordering. ``approximate`` uses the matmul-fused approx_max_k
    for candidate generation (see ``build_knn_graph``)."""
    import time as _time

    N, D = vectors.shape
    m0 = m0 or 2 * m
    k_candidates = min(k_candidates, N - 1)

    t0 = _time.perf_counter()

    def _tick(stage):
        nonlocal t0
        if verbose:
            t1 = _time.perf_counter()
            print(f"[graph_build] {stage}: {t1 - t0:.1f} s", flush=True)
            t0 = t1

    cand_ids, cand_scores = build_knn_graph(
        vectors, k_candidates, batch, mesh=mesh, approximate=approximate
    )
    if verbose:
        jax.block_until_ready(cand_ids)
    _tick("kNN candidate pass")

    # The prune stages gather (B, W, D) candidate vectors per chunk — their
    # batch is capped by a ~1 GiB gather budget, independent of the kNN
    # matmul batch (batch=8192 at W=128, D=2048 would gather 4-8 GB next to
    # the resident gallery: measured OOM at 1M).
    def _prune_batch(W):
        budget = 1 << 30
        return max(256, min(batch, budget // (W * D * vectors.dtype.itemsize)))

    # device pruning to m0 forward edges per node (chunked; all intermediates
    # stay device-resident — round 2 drained every chunk to host and
    # re-uploaded it, which dominated the pass through the tunnel)
    p_chunks, s_chunks, k_chunks = [], [], []
    pb = _prune_batch(cand_ids.shape[1])
    for s in range(0, N, pb):
        p_c, s_c, k_c = _prune_chunk(
            vectors, cand_ids[s : s + pb], cand_scores[s : s + pb], m0, alpha
        )
        p_chunks.append(p_c)
        s_chunks.append(s_c)
        k_chunks.append(k_c)
    pruned = jnp.concatenate(p_chunks, 0) if len(p_chunks) > 1 else p_chunks[0]
    pruned_sc = jnp.concatenate(s_chunks, 0) if len(s_chunks) > 1 else s_chunks[0]
    fwd_kept = jnp.concatenate(k_chunks, 0) if len(k_chunks) > 1 else k_chunks[0]
    if verbose:
        jax.block_until_ready(pruned)
    _tick("forward prune")

    # reverse-edge union: re-run the heuristic over candidates + backlinks
    # (the hnswlib shrink semantics), chunked on device
    bl_ids, bl_sc = _gather_backlinks_dev(pruned, pruned_sc, fwd_kept)
    if verbose:
        jax.block_until_ready(bl_ids)
    _tick("backlink gather")
    n0_chunks, nk_chunks = [], []
    pb = _prune_batch(cand_ids.shape[1] + bl_ids.shape[1])
    for s in range(0, N, pb):
        n0_c, nk_c = _union_reprune_chunk(
            vectors,
            cand_ids[s : s + pb],
            cand_scores[s : s + pb],
            bl_ids[s : s + pb],
            bl_sc[s : s + pb],
            m0,
            alpha,
        )
        n0_chunks.append(n0_c)
        nk_chunks.append(nk_c)
    nbr0_dev = jnp.concatenate(n0_chunks, 0) if len(n0_chunks) > 1 else n0_chunks[0]
    nbr0 = np.asarray(nbr0_dev)  # ONE download: (N, m0) int32
    union_kept = np.asarray(
        jnp.concatenate(nk_chunks, 0) if len(nk_chunks) > 1 else nk_chunks[0]
    )  # heuristic survivors per node (slots beyond are backfill)
    _tick("reverse-union re-prune")

    # geometric levels + upper-level lists from candidates within the level set
    rng = np.random.default_rng(seed)
    level_mult = 1.0 / np.log(m)
    levels = np.minimum(
        (-np.log(rng.uniform(size=N, low=1e-12, high=1.0)) * level_mult).astype(int),
        max_levels - 1,
    )
    nbru = np.full((max_levels - 1, N, m), -1, np.int32)
    for lvl in range(1, max_levels):
        members = np.where(levels >= lvl)[0]
        if len(members) <= 1:
            break
        # a real kNN graph among this level's members (exact, on device) —
        # restricting level-0 candidate lists leaves upper levels nearly empty
        # and the greedy descent non-navigable (measured: whole-cluster misses)
        mv = vectors[jnp.asarray(members)]
        k_lvl = min(m + 1, len(members))
        _, sub_ids = exact_topk(mv, mv, k_lvl, matmul_dtype=jnp.bfloat16)
        # drop self on HOST: level shapes differ every level, so the jitted
        # _drop_self_chunk would recompile per level (~35 s each through the
        # remote-compile tunnel — measured 166 s for this loop vs 22 s host);
        # the arrays here are tiny (~N/m rows)
        sub_ids = np.asarray(sub_ids)
        B = len(members)
        self_mask = sub_ids == np.arange(B)[:, None]
        keep = np.ones_like(sub_ids, bool)
        first_self = np.argmax(self_mask, axis=1)
        has_self = self_mask[np.arange(B), first_self]
        keep[np.arange(B)[has_self], first_self[has_self]] = False
        keep[~has_self, -1] = False
        local = sub_ids[keep].reshape(B, k_lvl - 1)[:, :m]
        glob = members[local]
        out = np.full((B, m), -1, np.int32)
        out[:, : glob.shape[1]] = glob
        nbru[lvl - 1][members] = out

    top_level = int(levels.max())
    entry = int(np.argmax(levels))

    # Splice the hierarchy edges into the beam table. The one-shot kNN build
    # has no insert-order long-range links, so a tight cluster smaller than
    # k_candidates can be a *disconnected component* at level 0 (measured:
    # 40 clusters x 50 points, 8/20 queries terminated with only their own
    # cluster found — recall@100 capped at 0.68 regardless of ef). hnswlib
    # escapes this because early inserts link across the whole dataset
    # (nnsearch.py insert loop); here the upper-level kNN graphs play that
    # role — they are built over level-sampled member sets that span
    # clusters, so their edges are exactly the missing "highways". hnswlib
    # walks those levels with separate per-level tables during descent; our
    # beam consumes ONE flat (N, m0) table, so on each hub node (level >= 1,
    # ~N/m of all nodes) tail slots are replaced by that node's hierarchy
    # edges — preferring the keepPrunedConnections *backfill* slots (those
    # past the union-prune's heuristic-survivor count) and cutting into real
    # heuristic survivors only down to a guaranteed m0/8 hierarchy links,
    # never more than m0/2 total: a hub whose heuristic kept nearly all m0
    # diversity edges loses at most m0/8 of them. Width stays m0, so the
    # pallas kernel's per-expansion DMA cost is unchanged. Rows are deduped
    # (an id twice in one row would enter the beam twice: the visited check
    # precedes the row's own writes).
    hier = np.concatenate([nbru[l] for l in range(max_levels - 1)], 1)
    comb = np.concatenate([nbr0, hier], 1)  # locals first: dedup keeps them
    _dedup_np_rows(comb)
    W = comb.shape[1]
    cols = np.arange(W)[None, :]
    valid = comb >= 0
    vl = valid & (cols < m0)
    vh = valid & (cols >= m0)
    n_h = vh.sum(1)
    n_backfill = np.maximum(m0 - union_kept, 0)
    n_evict = np.minimum(
        np.minimum(n_h, m0 // 2), np.maximum(n_backfill, m0 // 8)
    )
    n_keep_local = m0 - n_evict                           # (N,)
    keep_l = vl & ((np.cumsum(vl, 1) - 1) < n_keep_local[:, None])
    kept_l = keep_l.sum(1)
    keep_h = vh & ((np.cumsum(vh, 1) - 1) < (m0 - kept_l)[:, None])
    keep = keep_l | keep_h
    key = np.where(keep, cols, W)
    comp = np.take_along_axis(
        comb, np.argsort(key, axis=1, kind="stable"), 1
    )[:, :m0]
    nbr0 = np.ascontiguousarray(
        np.where(np.arange(m0)[None, :] < keep.sum(1)[:, None], comp, -1)
    )
    _tick("levels")
    return nbr0, nbru, levels.astype(np.int32), entry, top_level


@jax.jit
def _gather_backlinks_dev(pruned, pruned_sc, fwd_kept):
    """Per-node reverse-edge lists (ids, ip scores), -1/-inf padded (N, m0).

    A reverse edge ``dst <- src`` exists for every HEURISTIC survivor edge
    ``src -> dst`` (backfill slots are not real graph edges); its distance
    is symmetric, so the score is read off the source's pruned row — no
    recompute. Each node keeps its nearest m0 backlinks. Without backlinks
    a node that appears in nobody's candidate top-k has zero in-degree and
    is unreachable by greedy search (the bug this pass exists to prevent:
    the pruner's keepPrunedConnections backfill fills all m0 slots, so a
    slots-only union never fires). Runs ON DEVICE as one jitted
    sort+scatter program: the numpy version (lexsort + fancy indexing over
    32M edges at 1M x 32) measured 106-165 s on the host vCPU vs ~1 s of
    XLA sort; semantics identical (stable lexicographic (dst, -score)
    order), asserted by tests.
    """
    N, m0 = pruned.shape
    rank_ok = jnp.arange(m0, dtype=jnp.int32)[None, :] < fwd_kept[:, None]
    node = jnp.arange(N, dtype=jnp.int32)
    ok = (pruned >= 0) & (pruned != node[:, None]) & rank_ok

    src = jnp.broadcast_to(node[:, None], (N, m0)).reshape(-1)
    dst = jnp.where(ok, pruned, N).reshape(-1)  # invalid edges sort last
    negsc = jnp.where(ok, -pruned_sc, jnp.inf).reshape(-1)

    # stable lexicographic sort: by dst, then by descending score
    dst_s, negsc_s, src_s = jax.lax.sort(
        (dst, negsc, src), num_keys=2, is_stable=True
    )
    # position of each edge within its dst group
    starts = jnp.searchsorted(dst_s, node)  # (N,) first edge of each group
    pos = jnp.arange(N * m0, dtype=jnp.int32) - starts[
        jnp.clip(dst_s, 0, N - 1)
    ].astype(jnp.int32)
    keep = (dst_s < N) & (pos < m0)

    row = jnp.where(keep, dst_s, N)  # out-of-bounds rows drop
    col = jnp.where(keep, pos, 0)
    bl_ids = (
        jnp.full((N, m0), -1, jnp.int32)
        .at[row, col].set(src_s, mode="drop")
    )
    bl_sc = (
        jnp.full((N, m0), -jnp.inf, jnp.float32)
        .at[row, col].set(-negsc_s, mode="drop")
    )
    return bl_ids, bl_sc


def _dedup_np_rows(ids):
    """In-place ids-only row dedup: later duplicates of an id become -1,
    keeping the earliest column (vectorized via stable row-wise sort)."""
    B, W = ids.shape
    order = np.argsort(ids, axis=1, kind="stable")
    sorted_ids = np.take_along_axis(ids, order, 1)
    dup_sorted = np.zeros((B, W), bool)
    dup_sorted[:, 1:] = (sorted_ids[:, 1:] == sorted_ids[:, :-1]) & (
        sorted_ids[:, 1:] >= 0
    )
    dup = np.zeros((B, W), bool)
    np.put_along_axis(dup, order, dup_sorted, 1)
    ids[dup] = -1


def _dedup_rows(ids, sc):
    """In-place: mark duplicate ids within each row invalid (id -1,
    score -inf), keeping one occurrence. Vectorized via row-wise sort."""
    B, W = ids.shape
    order = np.argsort(ids, axis=1, kind="stable")
    sorted_ids = np.take_along_axis(ids, order, 1)
    dup_sorted = np.zeros((B, W), bool)
    dup_sorted[:, 1:] = (sorted_ids[:, 1:] == sorted_ids[:, :-1]) & (
        sorted_ids[:, 1:] >= 0
    )
    dup = np.zeros((B, W), bool)
    np.put_along_axis(dup, order, dup_sorted, 1)
    ids[dup] = -1
    sc[dup] = -np.inf


def build_hnsw_tpu(
    vecs,
    m: int = 16,
    m0: Optional[int] = None,
    k_candidates: int = 96,
    seed: int = 42,
    normalize: bool = True,
    batch: int = 8192,
    alpha: float = 1.2,
    mesh=None,
    approximate: bool = True,
    verbose: bool = False,
):
    """Drop-in fast builder returning an ``HNSWIndex``.

    Vectors are stored bfloat16: at 1M x 2048 the f32 database plus one bf16
    working copy exceeds single-chip HBM (measured 16.1 GB > 15.7), and bf16
    distances only reorder near-ties (recall checked in tests).

    ``approximate=True`` (default) runs the candidate kNN pass with the
    matmul-fused ``approx_max_k`` one-shot scan — measured 36-45 us/query at
    1M vs 422 us for the exact chunked scan, with candidate recall 0.997 and
    *identical* final beam recall (the pruner keeps m0 of ~k candidates, so
    the ~1% candidate tail never survives anyway; asserted in tests).
    """
    from .base import normalize_rows
    from .hnsw import HNSWIndex

    # keep host-resident non-bf16 input on the host until the chunk loop: an
    # upfront jnp.asarray of a 1M x 2048 f32 source (8 GB) would stay live
    # while the 4 GB bf16 parts + 4 GB concatenate output allocate, peaking
    # ~16 GB against the 15.7 GB usable HBM. Chunks upload one at a time.
    host_src = not isinstance(vecs, jnp.ndarray) and getattr(
        vecs, "dtype", None
    ) != jnp.bfloat16
    v = vecs if host_src else jnp.asarray(vecs)
    if normalize:
        # chunked fused normalize+cast: at 1M x 2048 a full f32 upcast (8 GB)
        # next to the bf16 input and result peaks over single-chip HBM
        # (measured OOM); per-chunk jitted calls keep the f32 temp small.
        N = v.shape[0]
        chunk = 65536
        if N > chunk:
            parts = [
                _normalize_bf16_chunk(jnp.asarray(v[s : s + chunk]))
                for s in range(0, N, chunk)
            ]
            v = jnp.concatenate(parts, axis=0)
        else:
            v = normalize_rows(
                jnp.asarray(v).astype(jnp.float32)
            ).astype(jnp.bfloat16)
    elif host_src:
        v = jnp.asarray(v)
    if v.dtype != jnp.bfloat16:
        v = v.astype(jnp.bfloat16)
    nbr0, nbru, levels, entry, top = build_hnsw_graph_tpu(
        v, m=m, m0=m0, k_candidates=k_candidates, seed=seed, batch=batch,
        alpha=alpha, mesh=mesh, approximate=approximate, verbose=verbose,
    )
    coarse = np.where(levels >= 1)[0].astype(np.int32)
    return HNSWIndex(
        vectors=v,
        nbr0=jnp.asarray(nbr0),
        nbru=jnp.asarray(nbru),
        entry=entry,
        ef_default=100,
        coarse_ids=jnp.asarray(coarse) if len(coarse) else None,
    )
