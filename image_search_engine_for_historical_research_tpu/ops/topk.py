"""Streaming exact nearest-neighbour search: fused score + running top-k.

TPU-native replacement for the reference's brute-force matcher
(``matching_L2``, ``/root/reference/src/utils/nnsearch.py:687-706``), which loops
per query on the host and does a full ``argsort`` per query. Here the database is
streamed through the MXU in chunks under ``lax.scan`` with a running top-k carry,
so peak memory is ``O(Q * (k + chunk))`` instead of ``O(Q * N)`` and the score
matrix is never materialized.

Metrics:
- ``"ip"``: inner product (== cosine when rows are pre-normalized; the reference
  normalizes then ranks by L2, which is the same ordering).
- ``"l2"``: ranks by squared L2 distance via ``||x||^2 - 2 q.x`` (the ``||q||^2``
  constant cannot change per-query ordering). Returned scores are the *negated*
  squared distances so that "larger is better" holds for every metric.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def _pad_rows(x: jnp.ndarray, multiple: int):
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    return x, n


@partial(jax.jit, static_argnames=("k", "metric", "chunk", "matmul_dtype"))
def exact_topk(
    queries: jnp.ndarray,
    db: jnp.ndarray,
    k: int,
    *,
    metric: str = "ip",
    chunk: int = 131072,
    matmul_dtype=None,
):
    """Top-k search of ``queries (Q, D)`` against ``db (N, D)``.

    Returns ``(scores, idx)`` of shape ``(Q, k)``, scores descending. ``chunk``
    bounds the score-tile width held in memory; ``matmul_dtype`` (e.g.
    ``jnp.bfloat16``) casts matmul inputs while accumulating in float32 on the MXU.
    """
    Q, D = queries.shape
    N = db.shape[0]
    k = min(k, N)
    # never use a chunk wider than the (lane-aligned) database
    chunk = max(128, min(chunk, ((N + 127) // 128) * 128))

    db_p, n_real = _pad_rows(db, chunk)
    nchunks = db_p.shape[0] // chunk
    db_c = db_p.reshape(nchunks, chunk, D)

    q = queries
    if matmul_dtype is not None:
        q = q.astype(matmul_dtype)
        db_c = db_c.astype(matmul_dtype)

    if metric == "l2":
        # per-chunk ||x||^2, computed in f32 for stability
        xn2 = jnp.sum(db_p.astype(jnp.float32) ** 2, axis=-1).reshape(nchunks, chunk)
    elif metric == "ip":
        xn2 = jnp.zeros((nchunks, chunk), jnp.float32)
    else:
        raise ValueError(f"unknown metric: {metric}")

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def step(carry, inp):
        best_s, best_i = carry
        x, x2, cidx = inp
        s = jax.lax.dot_general(
            q, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Q, chunk)
        if metric == "l2":
            s = 2.0 * s - x2[None, :]
        base = cidx * chunk
        gidx = row_iota + base  # (1, chunk) broadcasting over Q
        valid = gidx < n_real
        s = jnp.where(valid, s, NEG_INF)
        cand_s = jnp.concatenate([best_s, s], axis=1)
        cand_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(gidx, (Q, chunk))], axis=1
        )
        new_s, sel = jax.lax.top_k(cand_s, k)
        new_i = jnp.take_along_axis(cand_i, sel, axis=1)
        return (new_s, new_i), None

    init = (
        jnp.full((Q, k), NEG_INF, jnp.float32),
        jnp.zeros((Q, k), jnp.int32),
    )
    (scores, idx), _ = jax.lax.scan(
        step,
        init,
        (db_c, xn2, jnp.arange(nchunks, dtype=jnp.int32)),
    )
    return scores, idx


@partial(jax.jit, static_argnames=("metric", "chunk", "matmul_dtype"))
def exact_scores(
    queries: jnp.ndarray,
    db: jnp.ndarray,
    *,
    metric: str = "ip",
    chunk: int = 131072,
    matmul_dtype=None,
):
    """Full dense score matrix ``(Q, N)`` (for full-ranking mAP protocols).

    The reference's mAP mode ranks the whole database (``test_rOP1m.py:144-154``
    with ``K = n_database``); materializing ``(Q, N)`` is fine at benchmark sizes.
    """
    q, x = queries, db
    if matmul_dtype is not None:
        q, x = q.astype(matmul_dtype), x.astype(matmul_dtype)
    s = jax.lax.dot_general(
        q, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if metric == "l2":
        xn2 = jnp.sum(db.astype(jnp.float32) ** 2, axis=-1)
        s = 2.0 * s - xn2[None, :]
    elif metric != "ip":
        raise ValueError(f"unknown metric: {metric}")
    return s


def exact_ranks(queries, db, *, metric="ip", matmul_dtype=None):
    """Full ranking ``(Q, N)`` by descending score — the reference's
    ``np.argsort(dist)`` per query (nnsearch.py:699-703), batched on device."""
    s = exact_scores(queries, db, metric=metric, matmul_dtype=matmul_dtype)
    return jnp.argsort(-s, axis=1)
