"""Random-projection forest: the ANNOY-class index, built and queried on TPU.

Replaces ``matching_ANNOY`` (``/root/reference/src/utils/nnsearch.py:1016-1051``:
Annoy C++, 100 trees, euclidean, per-item host insert loop + ``build``).

TPU-first redesign instead of a translation: every tree is a *balanced* binary
tree of median splits, so the structure is implicit (complete tree, all leaves
at one depth) and the whole forest builds as a fixed number of array programs:

- per level, each segment picks a random hyperplane (difference of two randomly
  chosen member points — Annoy's two-point split), projects its members with one
  fused multiply-reduce, and splits at the segment median (a sorted-rank
  computation) — no recursion, no host round-trips;
- leaves are equal-size slices of a permutation array -> a dense (T, L, leaf)
  int32 table;
- query descent is ``depth`` steps of gather+dot per (query, tree), followed by
  an exact re-rank of the gathered candidate union.

Accuracy contract: algorithmic equivalence with Annoy at matched candidate
budget (recall governed by trees x leaf_size), not bit-identical traversal.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import normalize_rows, register


def _median_split_level(x, seg_id, n_segs, key):
    """One level of forest build: per-segment hyperplane + median split.

    Returns (planes (n_segs, D), thresholds (n_segs,), new seg_id).
    """
    N, D = x.shape
    k1, k2 = jax.random.split(key)

    # two random representatives per segment via random-score argmax
    def seg_pick(k):
        r = jax.random.uniform(k, (N,))
        # segment argmax: max over (r) then match
        seg_max = jax.ops.segment_max(r, seg_id, num_segments=n_segs)
        is_max = r >= seg_max[seg_id] - 1e-12
        # first index achieving the max in each segment
        idx = jnp.where(is_max, jnp.arange(N), N)
        return jax.ops.segment_min(idx, seg_id, num_segments=n_segs)

    a = jnp.clip(seg_pick(k1), 0, N - 1)
    b = jnp.clip(seg_pick(k2), 0, N - 1)
    planes = x[a] - x[b]                          # (n_segs, D)
    # degenerate (a==b) planes: replace with a random direction
    degenerate = jnp.all(planes == 0, axis=1, keepdims=True)
    planes = jnp.where(
        degenerate, jax.random.normal(k2, planes.shape, planes.dtype), planes
    )

    # chunked projection: planes[seg_id] materialized whole is an (N, D)
    # gather — 8 GB at 1M x 2048, alongside the database itself (OOM)
    chunk = min(131072, N)
    nch = -(-N // chunk)

    def _proj_chunk(i, out):
        start = jnp.minimum(i * chunk, N - chunk)
        xc = jax.lax.dynamic_slice_in_dim(x, start, chunk, 0)
        sc = jax.lax.dynamic_slice_in_dim(seg_id, start, chunk, 0)
        pc = jnp.sum(xc * planes[sc], axis=1)
        return jax.lax.dynamic_update_slice_in_dim(out, pc, start, 0)

    proj = jax.lax.fori_loop(
        0, nch, _proj_chunk, jnp.zeros((N,), jnp.float32)
    )                                             # (N,)

    # per-segment median: rank items within segment by projection
    order = jnp.lexsort((proj, seg_id))           # sort by (seg, proj)
    ranks = jnp.zeros((N,), jnp.int32)
    seg_sizes = jax.ops.segment_sum(jnp.ones((N,), jnp.int32), seg_id, num_segments=n_segs)
    seg_starts = jnp.cumsum(seg_sizes) - seg_sizes
    pos_in_seg = jnp.arange(N, dtype=jnp.int32) - seg_starts[seg_id[order]]
    ranks = ranks.at[order].set(pos_in_seg)
    go_right = ranks >= (seg_sizes[seg_id] + 1) // 2

    # threshold per segment = projection of the first right-going item
    big = jnp.where(go_right, proj, jnp.inf)
    thresholds = jax.ops.segment_min(big, seg_id, num_segments=n_segs)
    thresholds = jnp.where(jnp.isfinite(thresholds), thresholds, 0.0)

    new_seg = seg_id * 2 + go_right.astype(jnp.int32)
    return planes, thresholds, new_seg


@partial(jax.jit, static_argnames=("depth",))
def _build_tree(x, depth: int, key):
    """Build one balanced tree; returns (planes-by-level list flattened,
    thresholds flattened, leaf assignment (N,))."""
    N, D = x.shape
    seg_id = jnp.zeros((N,), jnp.int32)
    planes_all = []
    thr_all = []
    for d in range(depth):
        key, sub = jax.random.split(key)
        planes, thr, seg_id = _median_split_level(x, seg_id, 1 << d, sub)
        planes_all.append(planes)
        thr_all.append(thr)
    # complete-tree layout: level d occupies [2^d - 1, 2^{d+1} - 1)
    return (
        jnp.concatenate(planes_all, axis=0),       # (2^depth - 1, D)
        jnp.concatenate(thr_all, axis=0),          # (2^depth - 1,)
        seg_id,                                    # leaf id per item
    )


@partial(jax.jit, static_argnames=("depth",))
def _descend(planes, thresholds, queries, depth: int):
    """Root-to-leaf descent: (T, nodes, D) x (Q, D) -> leaf ids (Q, T)."""
    T = planes.shape[0]
    Q = queries.shape[0]
    node = jnp.zeros((Q, T), jnp.int32)  # within-level index
    for d in range(depth):
        flat = (1 << d) - 1 + node                       # (Q, T) node slots
        p = jnp.take_along_axis(planes, flat.T[:, :, None], axis=1)   # (T, Q, D)
        t = jnp.take_along_axis(thresholds, flat.T, axis=1)           # (T, Q)
        proj = jnp.einsum("tqd,qd->tq", p, queries)
        node = node * 2 + (proj.T > t.T)
    return node  # leaf index per (query, tree)


@register("rpforest")
@dataclass
class RPForestIndex:
    vectors: jnp.ndarray     # (N, D) normalized
    planes: jnp.ndarray      # (T, 2^depth - 1, D)
    thresholds: jnp.ndarray  # (T, 2^depth - 1)
    leaf_items: jnp.ndarray  # (T, 2^depth, leaf_max) int32, -1 padded
    depth: int

    @property
    def n(self) -> int:
        return self.vectors.shape[0]

    def search(self, queries, k: int, query_chunk: Optional[int] = None) -> Tuple:
        """Descend all trees, union candidates, exact re-rank the union.

        Queries are processed in chunks: the vmapped candidate gather
        materializes (chunk, n_trees * leaf_max, D) — 34 GB for 70 queries at
        the 100-tree default — so the chunk adapts to keep that block under
        ~1 GB."""
        q = normalize_rows(jnp.asarray(queries))
        Q = q.shape[0]
        if Q == 0:
            return (
                jnp.zeros((0, k), jnp.float32),
                jnp.zeros((0, k), jnp.int32),
            )
        cand = self.leaf_items.shape[0] * self.leaf_items.shape[2]
        if query_chunk is None:
            # floor at 8: a chunk of 1 would pay the ~33 ms tunnel round-trip
            # per query; 8 amortizes dispatch while capping the gather block
            query_chunk = max(8, (1 << 28) // max(cand * self.vectors.shape[1], 1))
        pad = (-Q) % query_chunk  # pad so every chunk compiles to one shape
        if pad:
            q = jnp.concatenate([q, jnp.broadcast_to(q[:1], (pad, q.shape[1]))], 0)
        out_s, out_i = [], []
        for s in range(0, q.shape[0], query_chunk):
            qc = q[s : s + query_chunk]
            leaf = _descend(self.planes, self.thresholds, qc, self.depth)
            sc, ix = _rerank_candidates(self.vectors, self.leaf_items, leaf, qc, k)
            out_s.append(sc)
            out_i.append(ix)
        if len(out_s) == 1:
            return out_s[0][:Q], out_i[0][:Q]
        return (
            jnp.concatenate(out_s, 0)[:Q],
            jnp.concatenate(out_i, 0)[:Q],
        )

    def to_arrays(self):
        # planes persist as a uint16 bit-cast of their bfloat16 storage: an
        # f32 save would re-inflate the deliberately-compressed plane memory
        # (~1.7 GB at the 1M/100-tree config) on every load
        planes_u16 = np.asarray(
            jax.lax.bitcast_convert_type(
                self.planes.astype(jnp.bfloat16), jnp.uint16
            )
        )
        return (
            {"depth": self.depth},
            {
                "vectors": np.asarray(self.vectors, np.float32),
                "planes_bf16": planes_u16,
                "thresholds": np.asarray(self.thresholds, np.float32),
                "leaf_items": np.asarray(self.leaf_items, np.int32),
            },
        )

    @classmethod
    def from_arrays(cls, meta, arrays):
        if "planes_bf16" in arrays:
            planes = jax.lax.bitcast_convert_type(
                jnp.asarray(arrays["planes_bf16"]), jnp.bfloat16
            )
        else:  # legacy f32 saves
            planes = jnp.asarray(arrays["planes"]).astype(jnp.bfloat16)
        return cls(
            vectors=jnp.asarray(arrays["vectors"]),
            planes=planes,
            thresholds=jnp.asarray(arrays["thresholds"]),
            leaf_items=jnp.asarray(arrays["leaf_items"]),
            depth=int(meta["depth"]),
        )


@partial(jax.jit, static_argnames=("k",))
def _rerank_candidates(vectors, leaf_items, leaf, queries, k: int):
    """Gather each query's T candidate leaves and exact-score the union."""
    Q, T = leaf.shape
    leaf_max = leaf_items.shape[2]

    def per_query(q, leaf_q):
        cand = jnp.take_along_axis(
            leaf_items, leaf_q[:, None, None], axis=1
        ).reshape(T * leaf_max)                         # may contain dups/-1
        valid = cand >= 0
        v = vectors[jnp.clip(cand, 0)]                  # (C, D)
        s = v @ q
        # mask invalid and duplicate candidates (keep first occurrence)
        order = jnp.argsort(cand)
        sorted_c = cand[order]
        dup = jnp.concatenate(
            [jnp.array([False]), sorted_c[1:] == sorted_c[:-1]]
        )
        dup_mask = jnp.zeros_like(valid).at[order].set(dup)
        s = jnp.where(valid & ~dup_mask, s, -jnp.inf)
        kk = min(k, s.shape[0])
        top_s, sel = jax.lax.top_k(s, kk)
        top_i = cand[sel]
        if kk < k:
            # keep the (Q, k) rank-matrix contract even when the candidate
            # budget T*leaf_max < k: pad with the best id at -inf score
            # (duplicate ids already occur when the union runs short)
            top_s = jnp.concatenate(
                [top_s, jnp.full((k - kk,), -jnp.inf, top_s.dtype)]
            )
            top_i = jnp.concatenate(
                [top_i, jnp.broadcast_to(top_i[:1], (k - kk,))]
            )
        return top_s, top_i

    return jax.vmap(per_query)(queries, leaf)


def build_rpforest(
    vecs,
    n_trees: int = 100,
    leaf_size: int = 512,
    seed: int = 42,
    normalize: bool = True,
    mesh=None,
) -> RPForestIndex:
    """Build the forest entirely on device.

    Defaults follow the reference's Annoy config (100 trees, offline.py:112 /
    nnsearch.py:1041). ``leaf_size`` is the TPU-side knob Annoy doesn't have:
    the leaf-union re-rank is one MXU matmul, so large leaves buy recall
    almost free — measured at 100k x 2048 (BASELINE.md): leaf 512 reaches
    recall@10 = 0.98 with 64 trees at 159 MB where leaf 128 needs 562 MB for
    0.89. Shallower trees also mean fewer plane rows (the memory hog).

    With ``mesh``, trees build data-replicated / TREE-SHARDED over the device
    mesh (trees are independent; no collectives at all) — the last expensive
    build to join the sharded family (graph kNN, PQ/IVF-PQ k-means, diffusion
    offline). Per-tree keys are identical in both modes, so the sharded
    forest equals the single-device one exactly (tests/test_parallel.py)."""
    v = jnp.asarray(vecs, jnp.float32)
    if normalize:
        v = normalize_rows(v)
    N = v.shape[0]
    depth = max(1, int(np.ceil(np.log2(max(N / leaf_size, 2)))))
    n_leaves = 1 << depth

    tree_keys = jax.random.split(jax.random.PRNGKey(seed), n_trees)
    planes_l, thr_l, assign_l = [], [], []
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        axis = "data"
        n_shards = mesh.shape[axis]
        Tp = ((n_trees + n_shards - 1) // n_shards) * n_shards
        keys_p = jnp.concatenate(
            [tree_keys, jnp.tile(tree_keys[:1], (Tp - n_trees, 1))], axis=0
        )

        def per_shard(keys_shard, v_rep):
            return jax.lax.map(
                lambda kk: _build_tree(v_rep, depth, kk), keys_shard
            )

        # check_vma=False: the per-tree fori_loop carries start as constants
        # (unvarying) and become shard-varying; with no collectives anywhere
        # in the tree build the varying-manual-axes check is just noise
        fn = jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(P(axis), P()), out_specs=(P(axis), P(axis), P(axis)),
            check_vma=False,
        )
        planes_a, thr_a, assign_a = jax.jit(fn)(keys_p, v)
        # reshard tree-sharded outputs to replicated (one ICI all-gather)
        # before slicing — scalar indexing across a sharded axis is ambiguous
        from jax.sharding import NamedSharding

        rep = NamedSharding(mesh, P())
        planes_a = jax.device_put(planes_a, rep)
        thr_a = jax.device_put(thr_a, rep)
        assign_np = np.asarray(jax.device_put(assign_a, rep))
        for t in range(n_trees):
            planes_l.append(planes_a[t].astype(jnp.bfloat16))
            thr_l.append(thr_a[t])
            assign_l.append(assign_np[t])
    else:
        for t in range(n_trees):
            planes, thr, leaf_assign = _build_tree(v, depth, tree_keys[t])
            # bf16 plane storage: at 1M x 2048 with 100 trees the f32 planes
            # are 1.7 GB and the final jnp.stack transiently doubles that next
            # to the 8 GB gallery (OOM). Split decisions only compare a
            # projection to a threshold; bf16 rounding flips only points
            # already on the boundary
            planes_l.append(planes.astype(jnp.bfloat16))
            thr_l.append(thr)
            assign_l.append(np.asarray(leaf_assign))

    # pack leaf item tables (host, one argsort per tree); width = observed max
    all_counts = [np.bincount(a, minlength=n_leaves) for a in assign_l]
    leaf_max = int(max(c.max() for c in all_counts))
    leaves_l = []
    for la, counts in zip(assign_l, all_counts):
        order = np.argsort(la, kind="stable")
        table = np.full((n_leaves, leaf_max), -1, np.int32)
        pos = 0
        for l in range(n_leaves):
            c = counts[l]
            table[l, :c] = order[pos : pos + c]
            pos += c
        leaves_l.append(table)

    return RPForestIndex(
        vectors=v,
        planes=jnp.stack(planes_l),
        thresholds=jnp.stack(thr_l),
        leaf_items=jnp.asarray(np.stack(leaves_l)),
        depth=depth,
    )
