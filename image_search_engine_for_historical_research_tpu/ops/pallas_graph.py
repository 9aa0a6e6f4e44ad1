"""Pallas TPU kernel: HBM-resident HNSW level-0 beam search.

The TPU-native answer to SURVEY.md section 7's hard part (ii): data-dependent
graph traversal on a SIMD machine. The XLA version (``ops.graph_search``) keeps
a (Q, N) visited buffer in HBM and routes every hop through jit scatters; this
kernel keeps the entire per-query search state on-chip:

- a **visited bitset in VMEM** (ceil(N/4096) x 128 uint32 lanes = 128 KB at 1M
  nodes),
- the beam as fixed (1, ef) VMEM vectors (ids / distances / expanded flags),
- neighbor ids and vectors fetched with **async DMA** from HBM, all ``m0`` row
  fetches in flight together before the distance matvec.

One grid step = one query, so a batch of Q queries pipelines Q independent
traversals. Upper-layer greedy descent stays in XLA (cheap, tiny state) and
provides each query's entry point. Distances are squared L2 accumulated in f32
(same ordering as the reference's ``np.linalg.norm``, nnsearch.py:63-65).

Termination matches ``_search_graph`` (nnsearch.py:321-350): expand the best
unexpanded beam entry until none remains (candidates worse than the current
worst never enter the beam), with a hard ``max_steps`` compiler bound.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.4e38  # plain python float: jnp constants would be captured tracers


def _beam_kernel(
    # scalar prefetch
    starts_ref,            # (Q,) int32 SMEM
    # inputs
    q_ref,                 # (1, D) f32 VMEM (this query)
    db_ref,                # (N, D) HBM
    nbr_ref,               # (N, m0) int32 HBM
    # outputs
    out_ids_ref,           # (1, EF) int32
    out_d_ref,             # (1, EF) f32
    # scratch
    visited_ref,           # (VW, 128) uint32 VMEM bitset
    beam_id_ref,           # (1, EF) int32
    beam_d_ref,            # (1, EF) f32
    expanded_ref,          # (1, EF) bool
    nbr_buf_ref,           # (1, m0) int32 VMEM
    fresh_ref,             # (1, m0) bool VMEM
    vec_buf_ref,           # (m0, D) VMEM
    nbr_sem,               # DMA sem
    vec_sems,              # DMA sems (m0,)
    *,
    m0: int,
    ef: int,
    max_steps: int,
):
    qid = pl.program_id(0)
    start = starts_ref[qid]

    q = q_ref[0:1, :].astype(jnp.float32)                # (1, D)
    q2 = jnp.sum(q * q)

    visited_ref[:, :] = jnp.zeros_like(visited_ref)
    beam_id_ref[0:1, :] = jnp.full((1, ef), -1, jnp.int32)
    beam_d_ref[0:1, :] = jnp.full((1, ef), INF, jnp.float32)
    expanded_ref[0:1, :] = jnp.zeros((1, ef), jnp.bool_)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def test_and_set(node):
        """Return whether ``node`` was visited; mark it visited."""
        word = node // 32
        r, c, b = word // 128, word % 128, node % 32
        row = visited_ref[pl.ds(r, 1), :]                 # (1, 128) uint32
        sel = lane == c
        w = jnp.sum(jnp.where(sel, row, 0).astype(jnp.uint32))
        mask = jnp.uint32(1) << b.astype(jnp.uint32)
        seen = (w & mask) != 0
        visited_ref[pl.ds(r, 1), :] = jnp.where(sel, w | mask, row)
        return seen

    def row_dists():
        """Squared L2 of every vec_buf row to q (m0, 1) f32."""
        v = vec_buf_ref[:, :].astype(jnp.float32)         # (m0, D)
        v2 = jnp.sum(v * v, axis=1, keepdims=True)        # (m0, 1)
        dots = jax.lax.dot_general(
            v, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                 # (m0, 1)
        return v2 - 2.0 * dots + q2

    # ---- seed the beam with the start node
    dma0 = pltpu.make_async_copy(
        db_ref.at[pl.ds(start, 1), :], vec_buf_ref.at[pl.ds(0, 1), :], vec_sems.at[0]
    )
    dma0.start()
    dma0.wait()
    d_seed = row_dists()[0, 0]
    beam_id_ref[0, 0] = start
    beam_d_ref[0, 0] = d_seed
    _ = test_and_set(start)

    def body(state):
        step, _ = state

        # 1. pop the best unexpanded entry
        d_mask = jnp.where(expanded_ref[0:1, :], INF, beam_d_ref[0:1, :])
        i_star = jnp.argmin(d_mask.reshape(-1))
        node = beam_id_ref[0, i_star]
        expanded_ref[0, i_star] = True

        # 2. fetch its neighbor row
        dma = pltpu.make_async_copy(
            nbr_ref.at[pl.ds(node, 1), :], nbr_buf_ref, nbr_sem
        )
        dma.start()
        dma.wait()

        # 3. visited-filter + launch all fresh-vector DMAs
        for j in range(m0):
            nid = nbr_buf_ref[0, j]
            ok = nid >= 0
            safe = jnp.where(ok, nid, 0)
            seen = test_and_set(safe)
            fresh = jnp.logical_and(ok, jnp.logical_not(seen))
            fresh_ref[0, j] = fresh

            @pl.when(fresh)
            def _():
                pltpu.make_async_copy(
                    db_ref.at[pl.ds(safe, 1), :],
                    vec_buf_ref.at[pl.ds(j, 1), :],
                    vec_sems.at[j],
                ).start()

        for j in range(m0):
            @pl.when(fresh_ref[0, j])
            def _():
                # wait on sem j (descriptor only supplies the expected size)
                pltpu.make_async_copy(
                    db_ref.at[pl.ds(0, 1), :],
                    vec_buf_ref.at[pl.ds(j, 1), :],
                    vec_sems.at[j],
                ).wait()

        # 4. distances (stale rows masked out)
        d = row_dists()                                   # (m0, 1)

        # 5. insert candidates: replace the current worst when better
        for j in range(m0):
            worst = jnp.argmax(beam_d_ref[0:1, :].reshape(-1))
            dj = d[j, 0]
            take = jnp.logical_and(fresh_ref[0, j], dj < beam_d_ref[0, worst])

            @pl.when(take)
            def _():
                beam_id_ref[0, worst] = nbr_buf_ref[0, j]
                beam_d_ref[0, worst] = dj
                expanded_ref[0, worst] = False

        frontier = jnp.logical_and(
            jnp.logical_not(expanded_ref[0:1, :]), beam_id_ref[0:1, :] >= 0
        )
        return step + 1, jnp.any(frontier)

    def cond(state):
        step, cont = state
        return jnp.logical_and(step < max_steps, cont)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(True)))

    out_ids_ref[0:1, :] = beam_id_ref[0:1, :]
    out_d_ref[0:1, :] = beam_d_ref[0:1, :]


def pallas_beam_search(
    db: jnp.ndarray,        # (N, D)
    nbr0: jnp.ndarray,      # (N, m0) int32, -1 padded
    queries: jnp.ndarray,   # (Q, D)
    starts: jnp.ndarray,    # (Q,) int32 entry points
    ef: int = 100,
    max_steps: int = 0,
    interpret: bool = False,
):
    """Per-query beam search; returns (scores desc = -distance, ids), (Q, ef)."""
    N, D = db.shape
    m0 = nbr0.shape[1]
    Q = queries.shape[0]
    max_steps = max_steps or 4 * ef
    ef_pad = max(ef, 8)
    vw = -(-N // (128 * 32))  # bitset rows

    kernel = partial(_beam_kernel, m0=m0, ef=ef_pad, max_steps=max_steps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q,),
        in_specs=[
            pl.BlockSpec((1, D), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, ef_pad), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ef_pad), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((vw, 128), jnp.uint32),
            pltpu.VMEM((1, ef_pad), jnp.int32),
            pltpu.VMEM((1, ef_pad), jnp.float32),
            pltpu.VMEM((1, ef_pad), jnp.bool_),
            pltpu.VMEM((1, m0), jnp.int32),
            pltpu.VMEM((1, m0), jnp.bool_),
            pltpu.VMEM((m0, D), db.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((m0,)),
        ],
    )

    out_ids, out_d = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Q, ef_pad), jnp.int32),
            jax.ShapeDtypeStruct((Q, ef_pad), jnp.float32),
        ],
        interpret=interpret,
    )(starts.astype(jnp.int32), queries.astype(jnp.float32), db, nbr0)

    order = jnp.argsort(out_d, axis=1)
    d_sorted = jnp.take_along_axis(out_d, order, axis=1)[:, :ef]
    i_sorted = jnp.take_along_axis(out_ids, order, axis=1)[:, :ef]
    return -d_sorted, i_sorted
