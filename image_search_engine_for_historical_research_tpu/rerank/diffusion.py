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
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk import exact_topk

GAMMA = 3          # affinity exponent (diffusion.py:101)
ALPHA = 0.99       # laplacian alpha (diffusion.py:87)
CG_MAXITER = 20    # diffusion.py:18
CG_TOL = 1e-6


@dataclass
class DiffusionOffline:
    """Per-gallery-row truncated diffusion scores over their kNN supports."""

    trunc_ids: jnp.ndarray  # (N, T) int32
    scores: jnp.ndarray     # (N, T) float32

    @property
    def n(self) -> int:
        return self.trunc_ids.shape[0]

    def save(self, path: str) -> None:
        np.savez(
            path,
            trunc_ids=np.asarray(self.trunc_ids, np.int32),
            scores=np.asarray(self.scores, np.float32),
        )

    @classmethod
    def load(cls, path: str) -> "DiffusionOffline":
        z = np.load(path)
        return cls(jnp.asarray(z["trunc_ids"]), jnp.asarray(z["scores"]))


def _knn_graph(vecs: jnp.ndarray, k: int):
    """(sims, ids) of the gallery against itself, self included at rank 0."""
    return exact_topk(vecs, vecs, k, metric="ip")


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


def _laplacian_rows(vecs: jnp.ndarray, kd: int):
    """Padded-row normalized Laplacian: (nbr (N,kd), val (N,kd)) off-diagonals.

    Row i of L is ``1`` at i plus ``val[i, m]`` at column ``nbr[i, m]`` (masked
    entries have val 0). Matches get_affinity + get_laplacian semantics.
    """
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


def build_diffusion_offline(
    vecs: jnp.ndarray,
    n_trunc: int = 2000,
    kd: int = 50,
    batch: int = 256,
) -> DiffusionOffline:
    """Gallery-side diffusion (diffusion.py:52-84).

    ``n_trunc`` is the truncated-support size (reference: 2000), ``kd`` the
    affinity graph degree (50..200). Solves run in device batches of ``batch``.
    """
    N = vecs.shape[0]
    T = min(n_trunc, N)
    kd = min(kd, N)

    _, trunc_ids = _knn_graph(vecs, T)            # (N, T), self at rank 0
    lap_nbr, lap_val = _laplacian_rows(vecs, kd)

    solve = jax.jit(_batched_trunc_cg)
    out = []
    for start in range(0, N, batch):
        out.append(solve(lap_nbr, lap_val, trunc_ids[start : start + batch]))
    scores = jnp.concatenate(out, axis=0)
    return DiffusionOffline(trunc_ids=trunc_ids, scores=scores)


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


def diffusion_rerank(
    vecs,
    qvecs,
    offline: DiffusionOffline = None,
    n_trunc: int = 2000,
    kd: int = 50,
    k_query: int = 3,
    truncation: int = None,
):
    """Full QGE random-walk pass: returns (ranks (Q, R), offline) with R =
    ``truncation`` (reference: 2000) ranked by diffusion score."""
    N = vecs.shape[0]
    if offline is None:
        offline = build_diffusion_offline(vecs, n_trunc=n_trunc, kd=kd)
    scores = diffusion_online_scores(
        offline.trunc_ids, offline.scores, vecs, qvecs, k_query=k_query
    )
    R = min(truncation or n_trunc, N)
    _, ranks = jax.lax.top_k(scores, R)
    return ranks, offline
