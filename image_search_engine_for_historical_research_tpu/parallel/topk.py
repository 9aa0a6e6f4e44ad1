"""Database-sharded exact top-k: per-shard scan + all-gather merge.

The framework's "long axis" is the database dimension N (SURVEY.md section 5):
the TPU-native counterpart of sequence parallelism is sharding the descriptor
matrix across the mesh, running the streaming top-k per shard, and merging the
per-shard candidates with one small ``all_gather`` over ICI — the collective
replacement for FAISS's multi-GPU shard merge.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.topk import exact_topk


@lru_cache(maxsize=None)
def _sharded_topk_fn(mesh, axis, n_shards, shard_rows, N, k, metric, chunk,
                     matmul_dtype, approximate, recall_target):
    """Compiled driver cache: index builds call this once per row batch —
    a per-call ``jax.jit(closure)`` would retrace every batch (~250 times at
    1M), each compile costing ~35 s through the remote-compile tunnel."""
    k_local = min(k, shard_rows)
    k_out = min(k, N)

    def local(q, db_shard):
        # db_shard arrives (shard_rows, D); global offset from the axis index
        s, i = exact_topk(
            q, db_shard, k_local, metric=metric, chunk=chunk,
            matmul_dtype=matmul_dtype, approximate=approximate,
            recall_target=recall_target,
        )
        i = i + jax.lax.axis_index(axis) * shard_rows
        # gather all shards' candidates: (n_shards, Q, k_local)
        s_all = jax.lax.all_gather(s, axis)
        i_all = jax.lax.all_gather(i, axis)
        Q = q.shape[0]
        s_cat = jnp.transpose(s_all, (1, 0, 2)).reshape(Q, n_shards * k_local)
        i_cat = jnp.transpose(i_all, (1, 0, 2)).reshape(Q, n_shards * k_local)
        top_s, sel = jax.lax.top_k(s_cat, k_out)
        top_i = jnp.take_along_axis(i_cat, sel, axis=1)
        return top_s, top_i

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,  # scan carry in exact_topk starts unvarying by design
    )
    return jax.jit(fn)


def sharded_exact_topk(
    queries: jnp.ndarray,
    db: jnp.ndarray,
    k: int,
    mesh: Mesh,
    *,
    metric: str = "ip",
    chunk: int = 131072,
    matmul_dtype=None,
    axis: str = "data",
    approximate: bool = False,
    recall_target: float = 0.95,
):
    """Top-k over a row-sharded database.

    ``db (N, D)`` is sharded over its rows (N divisible by the mesh size);
    ``queries`` are replicated. Each device scans its shard with the fused
    streaming kernel, then per-shard ``(scores, local_idx)`` are all-gathered and
    merged with one final ``top_k`` — O(devices * k) per query on the wire, never
    the raw scores.
    """
    n_shards = mesh.shape[axis]
    N = db.shape[0]
    if N % n_shards:
        raise ValueError(f"db rows {N} not divisible by mesh axis {n_shards}")
    fn = _sharded_topk_fn(
        mesh, axis, n_shards, N // n_shards, N, k, metric, chunk, matmul_dtype,
        approximate, recall_target,
    )
    return fn(queries, db)
