"""kNN-graph diffusion (random walk) re-ranking.

TPU-native counterpart of ``/root/reference/src/utils/diffusion.py`` +
the online half in ``QGE`` (``Reranking.py:233-265``):

offline — kNN graph over the gallery, mutual-kNN affinity ``relu(sims)^3``
(diffusion.py:101-116), symmetric-normalized Laplacian ``I - alpha D^-1/2 A D^-1/2``
with alpha=0.99 (:87-98), then for every gallery image a truncated conjugate-
gradient solve ``L|_trunc x = e1`` (maxiter=20, :15-19). The reference runs one
scipy CG per image across joblib threads; here the solves are vmapped into
batched device CG over padded fixed-size supports — one compiled program, no
host round-trips.

online — query kNN against the gallery (k=3), ``sims^3``-weighted combination of
the neighbours' offline score rows, scattered dense and ranked (:239-253).

Artifacts: ``DiffusionOffline`` is two dense arrays (ids + scores per gallery
row) stored via npz — replacing the joblib-pickled scipy CSR ``offline.jbl``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk import exact_topk

GAMMA = 3          # affinity exponent (diffusion.py:101)
ALPHA = 0.99       # laplacian alpha (diffusion.py:87)
CG_MAXITER = 20    # diffusion.py:18
CG_TOL = 1e-6

# The reference only runs diffusion below this gallery size (Reranking.py:212:
# the >=120k branch does alphaQE only). Above it the dense-ish offline artifact
# costs ~N*T*(4+2) bytes and must be explicitly opted into.
DIFFUSION_REGIME_MAX = 120_000


@dataclass
class DiffusionOffline:
    """Per-gallery-row truncated diffusion scores over their kNN supports.

    Arrays may live on device (jnp, small galleries) or host (np, large
    galleries built with ``host_out=True`` — the online pass then gathers only
    the query-neighbour rows on the host, so the multi-GB artifact never
    occupies HBM)."""

    trunc_ids: "np.ndarray | jnp.ndarray"  # (N, T) int32
    scores: "np.ndarray | jnp.ndarray"     # (N, T) float32 or float16

    @property
    def n(self) -> int:
        return self.trunc_ids.shape[0]

    @property
    def on_host(self) -> bool:
        return isinstance(self.trunc_ids, np.ndarray)

    def save(self, path: str, chunk_rows: int = 65536) -> None:
        """Persist the artifact. Device-resident arrays transfer to host in
        ``chunk_rows``-row slices: one np.asarray of a multi-GB device array
        stalls for 30+ min through the tunnel's ~MB/s device->host path
        (CLAUDE.md); chunking bounds each transfer and keeps host peak at
        artifact size + one slice."""

        def pull(a, dtype=None):
            if isinstance(a, np.ndarray):
                return a.astype(dtype) if dtype is not None else a
            N = a.shape[0]
            out = np.empty(a.shape, dtype or a.dtype)
            for s in range(0, N, chunk_rows):
                out[s : s + chunk_rows] = np.asarray(a[s : s + chunk_rows])
            return out

        np.savez(
            path,
            trunc_ids=pull(self.trunc_ids, np.int32),
            scores=pull(self.scores),
        )

    @classmethod
    def load(cls, path: str, to_device: bool = True) -> "DiffusionOffline":
        z = np.load(path)
        if to_device:
            return cls(jnp.asarray(z["trunc_ids"]), jnp.asarray(z["scores"]))
        return cls(z["trunc_ids"], z["scores"])


# Above this many gallery bytes the one-call self-kNN cannot compile on a
# 16 GB chip: the gallery enters the jit as BOTH the query and the db
# parameter (the compile-time HBM check budgets each separately, it cannot
# see they alias) and the chunked scan pads/copies it again — 28.7 GB at
# 1M x 2048 f32, a measured compile-time OOM. The large path loops
# query-row slices on the host against a single bf16 gallery copy instead:
# peak HBM = gallery + one padded bf16 copy + a score tile (~8.6 GB at 1M).
KNN_GRAPH_ONECALL_BYTES = 3 << 30
KNN_GRAPH_QROWS = 8192


def _knn_graph(vecs: jnp.ndarray, k: int):
    """(sims, ids) of the gallery against itself, self included at rank 0."""
    N, D = vecs.shape
    if N * D * vecs.dtype.itemsize <= KNN_GRAPH_ONECALL_BYTES:
        return exact_topk(vecs, vecs, k, metric="ip")
    db = vecs if vecs.dtype == jnp.bfloat16 else vecs.astype(jnp.bfloat16)
    sims, ids = [], []
    for s in range(0, N, KNN_GRAPH_QROWS):
        # approx_max_k fuses into the producing matmul (~free) where the
        # exact per-tile lax.top_k dominates the chunked scan at this scale
        sb, ib = exact_topk(
            db[s : s + KNN_GRAPH_QROWS], db, k, metric="ip",
            approximate=True, recall_target=0.99,
        )
        sims.append(sb)
        ids.append(ib)
    return jnp.concatenate(sims, axis=0), jnp.concatenate(ids, axis=0)


@partial(jax.jit, static_argnames=("chunk",))
def _mutual_mask(ids: jnp.ndarray, chunk: int = 512) -> jnp.ndarray:
    """ismutual[i, m] = i appears in ids[ids[i, m]] (diffusion.py:107); the
    self column 0 is forced off (:108). Chunked to bound the (chunk, kd, kd)
    gather."""
    N, kd = ids.shape
    pad = (-N) % chunk
    ids_p = jnp.concatenate([ids, jnp.zeros((pad, kd), ids.dtype)], 0) if pad else ids
    rows = ids_p.reshape(-1, chunk, kd)
    base = jnp.arange(rows.shape[0], dtype=jnp.int32) * chunk

    def one(inp):
        r, b = inp  # (chunk, kd), scalar base
        nbr_lists = ids[r]  # (chunk, kd, kd)
        me = (jnp.arange(chunk, dtype=jnp.int32) + b)[:, None, None]
        return jnp.any(nbr_lists == me, axis=-1)

    m = jax.lax.map(one, (rows, base)).reshape(-1, kd)[:N]
    return m.at[:, 0].set(False)


def _laplacian_rows(vecs: jnp.ndarray, kd: int, mesh=None):
    """Padded-row normalized Laplacian: (nbr (N,kd), val (N,kd)) off-diagonals.

    Row i of L is ``1`` at i plus ``val[i, m]`` at column ``nbr[i, m]`` (masked
    entries have val 0). Matches get_affinity + get_laplacian semantics.
    ``mesh`` shards the O(N^2) self-kNN pass over the device mesh.
    """
    if mesh is not None and vecs.shape[0] % mesh.devices.size == 0:
        from ..parallel import shard_batch, sharded_exact_topk

        sims, ids = sharded_exact_topk(
            vecs, shard_batch(vecs, mesh), kd, mesh, metric="ip"
        )
    else:
        sims, ids = _knn_graph(vecs, kd)
    w = jnp.clip(sims, min=0.0) ** GAMMA
    mutual = _mutual_mask(ids)
    w = jnp.where(mutual, w, 0.0)  # (N, kd), directed entries i -> ids[i]

    # affinity is symmetric in support and value (cosine sims symmetric, and
    # mutuality is a symmetric predicate), so row degrees are row sums
    degrees = jnp.sum(w, axis=1) + 1e-12
    dinv = 1.0 / jnp.sqrt(degrees)
    val = -ALPHA * w * dinv[:, None] * dinv[ids]
    return ids, val


@jax.jit
def _threshold_laplacian_stats(sims, ids):
    """(thresh, dinv) for the vector-recompute solver.

    ``u in knn(i)  <=>  sim(i, u) >= thresh_i`` (the kd-th neighbour sim), so
    the mutual-kNN test needs only one (N, kd) gather — ``sims >= thresh[ids]``
    — instead of ``_mutual_mask``'s (N, kd, kd) neighbour-list gather. Degrees
    and dinv follow from the masked affinity exactly as in ``_laplacian_rows``.
    """
    thresh = sims[:, -1]
    mutual = sims >= thresh[ids]
    mutual = mutual.at[:, 0].set(False)
    w = jnp.where(mutual, jnp.clip(sims, min=0.0) ** GAMMA, 0.0)
    degrees = jnp.sum(w, axis=1) + 1e-12
    return thresh, 1.0 / jnp.sqrt(degrees)


@partial(jax.jit, static_argnames=("k",))
def _knn_and_solve_vec(rows, vecs, thresh, dinv, k):
    """Per-batch support kNN + truncated CG with the operator *recomputed*
    from the support vectors on the MXU.

    The table-driven ``_batched_trunc_cg`` is gather/sort/scatter-bound on
    TPU: measured 4.9 s per 1024-row batch at (1M, T=512, kd=50) — an 80-min
    sweep. Rebuilding each row's truncated operator as ``G = V V^T`` over the
    gathered support vectors (contiguous row DMA + one batched matmul),
    with mutuality via the kd-th-sim thresholds, measures **0.059 s** per
    batch on the same shapes (scripts/ablate_cg_matvec.py) — the sweep
    becomes ~matmul+HBM-bound. Semantics match the table path up to
    float rounding of the threshold test at the kd-th-neighbour boundary."""
    _, tids = exact_topk(
        rows, vecs, k, metric="ip", approximate=True, recall_target=0.95,
    )
    T = tids.shape[1]

    def solve_one(support):
        V = vecs[support]
        G = jax.lax.dot_general(
            V, V, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        tau = thresh[support]
        mutual = (G >= tau[:, None]) & (G >= tau[None, :])
        mutual &= ~jnp.eye(T, dtype=bool)
        w = jnp.where(mutual, jnp.clip(G, min=0.0) ** GAMMA, 0.0)
        di = dinv[support]
        S = (-ALPHA) * w * di[:, None] * di[None, :]

        def matvec(v):
            return v + S @ v

        # support[0] is the row itself (the top-1 of approx_max_k is exact:
        # the global max survives any bucketed max-reduction), so b = e0
        b = jnp.zeros((T,), jnp.float32).at[0].set(1.0)
        x, _ = jax.scipy.sparse.linalg.cg(matvec, b, tol=CG_TOL, maxiter=CG_MAXITER)
        return x

    return tids, jax.vmap(solve_one)(tids)


def _batched_trunc_cg(lap_nbr, lap_val, trunc_ids):
    """Solve ``L|_s x = e1`` for every support row s (vmapped CG)."""
    N, kd = lap_nbr.shape
    T = trunc_ids.shape[1]

    def solve_one(support):
        order = jnp.argsort(support)
        ss = support[order]                       # sorted support (T,)
        nbrs = lap_nbr[ss]                        # (T, kd)
        vals = lap_val[ss]
        pos = jnp.searchsorted(ss, nbrs)
        pos = jnp.clip(pos, 0, T - 1)
        hit = ss[pos] == nbrs
        loc = jnp.where(hit, pos, T)              # T = out-of-support

        def matvec(v):
            vpad = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])
            return v + jnp.sum(vals * vpad[loc], axis=1)

        b = jnp.zeros((T,), jnp.float32)
        b = b.at[jnp.searchsorted(ss, support[0])].set(1.0)
        x, _ = jax.scipy.sparse.linalg.cg(matvec, b, tol=CG_TOL, maxiter=CG_MAXITER)
        # back to trunc_ids order
        return jnp.zeros((T,), jnp.float32).at[order].set(x)

    return jax.vmap(solve_one)(trunc_ids)


@partial(jax.jit, static_argnames=("k", "approx"))
def _knn_and_solve(rows, vecs, lap_nbr, lap_val, k, approx=False):
    """Fused per-batch self-kNN + truncated CG solve.

    Module-level jit with the gallery/Laplacian as *arguments*: a closure
    capturing them embeds ~1 GB of constants in the serialized module, which
    the tunnel's remote compile uploads at MB/s (CLAUDE.md gotcha — measured
    as a 20-minute stall ending in a broken pipe at 120k).

    ``approx`` selects the fused ``approx_max_k`` support shortlist: the
    support is a truncation choice, and the exact per-tile ``lax.top_k`` at
    k=T over a 1M-row chunked scan dominates the whole offline build
    (measured: the 1M sweep did not finish in an hour exact; ~minutes with
    the fused path at recall_target 0.95)."""
    _, tids = exact_topk(
        rows, vecs, k, metric="ip",
        approximate=approx, recall_target=0.95,
    )
    return tids, _batched_trunc_cg(lap_nbr, lap_val, tids)


@lru_cache(maxsize=None)
def _sharded_cg_fn(mesh, axis="data"):
    """Batch-row-sharded CG: each device solves its rows' truncated systems
    (independent problems — no collectives), Laplacian rows replicated."""
    from jax.sharding import PartitionSpec as P

    fn = jax.shard_map(
        _batched_trunc_cg,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(fn)


def _knn_and_solve_sharded(rows, vecs_sharded, lap_nbr, lap_val, k, mesh):
    """Mesh-parallel variant of ``_knn_and_solve`` (VERDICT r2 #2): the
    candidate kNN runs as per-shard scan + all-gather merge over the sharded
    gallery, and the CG batch rows are sharded so each device solves its
    slice. Falls back per-piece when the row count doesn't divide the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import sharded_exact_topk

    _, tids = sharded_exact_topk(rows, vecs_sharded, k, mesh, metric="ip")
    if rows.shape[0] % mesh.devices.size == 0:
        scores = _sharded_cg_fn(mesh)(lap_nbr, lap_val, tids)
        # re-replicate: the offline artifact is row-gathered by the online
        # pass with replicated indices — a row-sharded result would force
        # collectives (or fail) on every downstream gather
        scores = jax.device_put(scores, NamedSharding(mesh, P()))
    else:
        scores = jax.jit(_batched_trunc_cg)(lap_nbr, lap_val, tids)
    return tids, scores


def budget_trunc_size(
    n: int, n_trunc: int, memory_budget_bytes: int, score_bytes: int = 2
) -> int:
    """Largest support size T (multiple of 128, >= 128) whose (N, T) ids+scores
    artifact fits ``memory_budget_bytes`` (ids are int32)."""
    per_row = 4 + score_bytes
    t = memory_budget_bytes // (n * per_row)
    t = max(128, (t // 128) * 128)
    return min(n_trunc, t)


def build_diffusion_offline(
    vecs: jnp.ndarray,
    n_trunc: int = 2000,
    kd: int = 50,
    batch: int = 256,
    host_out: bool = None,
    score_dtype=None,
    memory_budget_bytes: int = None,
    allow_large: bool = False,
    approx_support: bool = None,
    progress_every: int = 0,
    solver: str = None,
    mesh=None,
) -> DiffusionOffline:
    """Gallery-side diffusion (diffusion.py:52-84).

    ``n_trunc`` is the truncated-support size (reference: 2000), ``kd`` the
    affinity graph degree (50..200). The self-kNN and the CG solves are fused
    per ``batch`` of gallery rows, so peak device memory is the Laplacian
    ((N, kd) ids+vals) plus one batch — never the full (N, T) artifact.

    Large galleries (> ``DIFFUSION_REGIME_MAX``, the reference's 120k regime
    switch at Reranking.py:212) require ``allow_large=True`` and should pass a
    ``memory_budget_bytes`` (shrinks T) — by default the artifact streams to
    host float16 (``host_out=True``; the online pass gathers rows on host).
    Passing ``host_out=False, score_dtype=np.float16`` instead keeps the
    budgeted artifact in HBM for the fast fully-jitted online pass — at 1M a
    3 GB budget gives T=512 next to a bf16 gallery. Pass the gallery as
    bfloat16 at this scale: an f32 copy alone is half of HBM (CLAUDE.md).

    ``solver``: ``"recompute"`` (beyond-regime default) rebuilds each row's
    truncated operator from its support vectors on the MXU — measured 83x
    faster per batch than the gather/sort/scatter-bound ``"tables"`` CG at
    (1M, T=512); ``"tables"`` (reference-regime and mesh default) walks the
    precomputed adjacency lists exactly as ``get_laplacian`` does.
    """
    N = vecs.shape[0]
    if N > DIFFUSION_REGIME_MAX and not allow_large:
        raise ValueError(
            f"gallery of {N} rows exceeds the reference's diffusion regime "
            f"(<{DIFFUSION_REGIME_MAX}, Reranking.py:212 runs alphaQE only "
            "there). Pass allow_large=True plus memory_budget_bytes to build "
            "a truncated large-scale artifact anyway."
        )
    if host_out is None:
        host_out = N > DIFFUSION_REGIME_MAX
    if score_dtype is None:
        score_dtype = np.float16 if host_out else np.float32
    if approx_support is None:
        # beyond the reference regime the exact per-tile top_k at k=T
        # dominates the sweep; the approx shortlist is ~matmul-cost
        approx_support = N > DIFFUSION_REGIME_MAX
    if solver is None:
        # "recompute" rebuilds each truncated operator from the support
        # vectors on the MXU (80x faster per batch at 1M); "tables" is the
        # adjacency-table CG kept for the reference regime and the mesh path
        solver = "recompute" if N > DIFFUSION_REGIME_MAX and mesh is None else "tables"
    if solver not in ("tables", "recompute"):
        raise ValueError(f"unknown solver: {solver!r}")

    T = min(n_trunc, N)
    if memory_budget_bytes is not None:
        T = budget_trunc_size(
            N, T, memory_budget_bytes, np.dtype(score_dtype).itemsize
        )
    kd = min(kd, N)

    if solver == "recompute":
        # no adjacency tables and no (N, kd, kd) mutual-mask pass: the batch
        # solver rebuilds each truncated operator from the vectors, so the
        # graph stage only yields per-row thresholds + degree normalizers
        sims, ids = _knn_graph(vecs, kd)
        thresh, dinv = _threshold_laplacian_stats(sims, ids)
        lap_nbr = lap_val = None
        del sims, ids
    else:
        lap_nbr, lap_val = _laplacian_rows(vecs, kd, mesh=mesh)
    vecs_sharded = None
    if mesh is not None and N % mesh.devices.size == 0:
        from ..parallel import shard_batch

        vecs_sharded = shard_batch(vecs, mesh)

    ids_out, sc_out = [], []
    for start in range(0, N, batch):
        if solver == "recompute":
            tids, sc = _knn_and_solve_vec(
                vecs[start : start + batch], vecs, thresh, dinv, T
            )
        elif vecs_sharded is not None:
            tids, sc = _knn_and_solve_sharded(
                vecs[start : start + batch], vecs_sharded, lap_nbr, lap_val,
                T, mesh,
            )
            # commit to the default device (device-to-device, no host drain):
            # the artifact must be consumable by the single-device online jit
            tids = jax.device_put(tids, jax.devices()[0])
            sc = jax.device_put(sc, jax.devices()[0])
        else:
            tids, sc = _knn_and_solve(
                vecs[start : start + batch], vecs, lap_nbr, lap_val, T,
                approx=approx_support,
            )
        if host_out:
            ids_out.append(np.asarray(tids, np.int32))
            sc_out.append(np.asarray(sc).astype(score_dtype))
        else:
            ids_out.append(tids)
            sc_out.append(sc.astype(score_dtype))
        if progress_every and (start // batch) % progress_every == 0:
            # back-pressure + visibility: force the latest piece so the
            # dispatch queue cannot run unboundedly ahead of the device
            np.asarray(sc_out[-1].ravel()[:1] if not host_out else sc_out[-1][:1, :1])
            print(f">> diffusion offline rows {min(start + batch, N)}/{N}", flush=True)
    cat = np.concatenate if host_out else jnp.concatenate
    return DiffusionOffline(trunc_ids=cat(ids_out, axis=0), scores=cat(sc_out, axis=0))


@partial(jax.jit, static_argnames=("k_query",))
def diffusion_online_scores(
    offline_ids: jnp.ndarray,
    offline_scores: jnp.ndarray,
    vecs: jnp.ndarray,
    qvecs: jnp.ndarray,
    k_query: int = 3,
) -> jnp.ndarray:
    """Dense (Q, N) diffusion scores for queries (Reranking.py:239-253)."""
    N = vecs.shape[0]
    Q = qvecs.shape[0]
    qsims, qids = exact_topk(qvecs, vecs, k_query, metric="ip")
    wq = jnp.clip(qsims, min=0.0) ** GAMMA        # sims ** 3 (:242)

    ids = offline_ids[qids]                       # (Q, k, T)
    vals = offline_scores[qids] * wq[:, :, None]  # (Q, k, T)
    dense = jnp.zeros((Q, N), jnp.float32)
    qidx = jnp.arange(Q, dtype=jnp.int32)[:, None, None]
    return dense.at[qidx, ids].add(vals)


@partial(jax.jit, static_argnames=("n",))
def _scatter_rows(ids, vals, wq, n):
    """(Q, k, T) gathered offline rows -> dense (Q, n) weighted combination."""
    Q = ids.shape[0]
    dense = jnp.zeros((Q, n), jnp.float32)
    qidx = jnp.arange(Q, dtype=jnp.int32)[:, None, None]
    return dense.at[qidx, ids].add(vals.astype(jnp.float32) * wq[:, :, None])


def diffusion_online_scores_hosted(
    offline: DiffusionOffline,
    vecs: jnp.ndarray,
    qvecs: jnp.ndarray,
    k_query: int = 3,
) -> jnp.ndarray:
    """Online diffusion against a host-resident artifact: only the Q*k_query
    neighbour rows cross to the device (the multi-GB (N, T) arrays stay on
    host — device->host/host->device through the axon tunnel is slow and HBM
    is the scarce resource at 1M)."""
    qsims, qids = exact_topk(qvecs, vecs, k_query, metric="ip")
    wq = jnp.clip(qsims, min=0.0) ** GAMMA
    qids_h = np.asarray(qids)
    ids = np.asarray(offline.trunc_ids[qids_h], np.int32)   # (Q, k, T) host gather
    vals = np.asarray(offline.scores[qids_h])
    return _scatter_rows(jnp.asarray(ids), jnp.asarray(vals), wq, vecs.shape[0])


def diffusion_rerank(
    vecs,
    qvecs,
    offline: DiffusionOffline = None,
    n_trunc: int = 2000,
    kd: int = 50,
    k_query: int = 3,
    truncation: int = None,
    **build_kwargs,
):
    """Full QGE random-walk pass: returns (ranks (Q, R), offline) with R =
    ``truncation`` (reference: 2000) ranked by diffusion score. Extra kwargs
    (``allow_large``, ``memory_budget_bytes``, ``host_out``) forward to
    ``build_diffusion_offline``."""
    N = vecs.shape[0]
    if offline is None:
        offline = build_diffusion_offline(vecs, n_trunc=n_trunc, kd=kd, **build_kwargs)
    if offline.on_host:
        scores = diffusion_online_scores_hosted(offline, vecs, qvecs, k_query=k_query)
    else:
        scores = diffusion_online_scores(
            offline.trunc_ids, offline.scores, vecs, qvecs, k_query=k_query
        )
    R = min(truncation or n_trunc, N)
    _, ranks = jax.lax.top_k(scores, R)
    return ranks, offline
