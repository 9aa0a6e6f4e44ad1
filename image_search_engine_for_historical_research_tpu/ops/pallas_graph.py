"""Pallas TPU kernel: HBM-resident HNSW level-0 beam search.

The TPU-native answer to SURVEY.md section 7's hard part (ii): data-dependent
graph traversal on a SIMD machine. The XLA version (``ops.graph_search``)
routes every hop through jit gathers/scatters over (Q, N) buffers and measured
unusable at 1M scale; this kernel keeps the entire per-query search state
on-chip and reads only the graph rows it touches (~hops * m0 * row bytes vs
the exact scan's full-database pass — the >=10M / small-batch regime,
BASELINE.md).

Semantics match the reference's ``_search_graph`` (nnsearch.py:321-350):
best-first expansion from an entry point, squared-L2 ordering
(``np.linalg.norm`` at nnsearch.py:63-65), bounded by ``max_steps``.

Design (v2 — the round-1 kernel was DMA-latency-bound at ~20 ms/query):

- **Row-tiled database**: the caller reshapes the (N, D) database to
  (N * T, 128) with T = D/128 sublane-tiles per row. Row ``n`` is then the
  slice [n*T, (n+1)*T) whose start is a multiple of T — sublane-aligned for
  every n (T is a multiple of the 8/16-row f32/bf16 tile). The round-1 kernel
  had to copy aligned 8-row *windows* (64 KB per neighbor at D=2048); this
  fetches exactly one 8 KB row per neighbor — 8x less HBM traffic.
- **Neighbor-row prefetch**: the next node to expand is known at the end of
  the merge, so its neighbor-table row is DMA'd *before* the loop comes back
  around — the fetch rides the merge's compute instead of serializing.
- **Fresh-row DMAs in flight together**: all visited-filter survivors start
  their row copies before any is waited on; the visited-set updates for later
  neighbors execute while earlier rows stream.
- **MXU distance pipeline**: per-row dots against the (T, 128) query tile are
  one ``dot_general`` + masked diagonal reduction + one (m0, m0*T) grouping
  matmul — no per-neighbor matvec loop.

Real-TPU Mosaic constraints retained from round 1 (each discovered on
hardware): no scalar VMEM stores (beam lives in the while-carry as (1, ef)
lane vectors updated by masked selects); the visited bitset is VMEM int32
rows updated by masked (1, 128) writes (no unsigned reductions); DMA slice
starts must be provably tile-aligned (``pl.multiple_of`` hints); no i1 vector
select/reduce (flags are int32 0/1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.4e38  # plain python float: jnp constants would be captured tracers
NBR_W = 8     # neighbor-table fetch window (int32 sublane tile)


def _beam_kernel(
    starts_ref,            # (Q,) int32 SMEM (scalar prefetch)
    qt_ref,                # (Q * T, 128) f32 VMEM (row-tiled queries)
    db_ref,                # (N * T, 128) HBM (row-tiled database)
    nbr_ref,               # (N, 128) int32 HBM (lane-padded neighbor table)
    out_ids_ref,           # (Q, EF) int32
    out_d_ref,             # (Q, EF) f32
    visited_ref,           # (VW, 128) uint32 VMEM bitset
    nbr_buf_ref,           # (NBR_W, 128) int32 VMEM
    vec_buf_ref,           # (m0 * T, 128) VMEM (db dtype)
    nbr_sem,
    vec_sems,              # (m0,)
    *,
    m0: int,
    ef: int,
    max_steps: int,
    T: int,
    N: int,
    n_nbr: int,
):
    qid = pl.program_id(0)
    start = starts_ref[qid]

    qt = qt_ref[pl.ds(qid * T, T), :].astype(jnp.float32)   # (T, 128)
    q2 = jnp.sum(qt * qt)

    visited_ref[:, :] = jnp.zeros_like(visited_ref)
    # uninitialized scratch can hold NaNs; the grouping matmul in all_dists
    # computes 0 * NaN = NaN across groups, so garbage rows would poison
    # every distance (including the seed's) — zero the buffer once per query
    vec_buf_ref[:, :] = jnp.zeros_like(vec_buf_ref)

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    lane_ef = jax.lax.broadcasted_iota(jnp.int32, (1, ef), 1)
    lane_m0 = jax.lax.broadcasted_iota(jnp.int32, (1, m0), 1)
    sub_nbr = jax.lax.broadcasted_iota(jnp.int32, (NBR_W, 128), 0)
    # diagonal mask for the per-row dot extraction: row i of the (m0*T, T)
    # partial-dot matrix contributes column i % T
    diag = (
        jax.lax.broadcasted_iota(jnp.int32, (m0 * T, T), 0) % T
        == jax.lax.broadcasted_iota(jnp.int32, (m0 * T, T), 1)
    )
    # grouping matmul: G[j, r] = 1 where r // T == j sums T tile-rows per node
    G = (
        jax.lax.broadcasted_iota(jnp.int32, (m0, m0 * T), 1) // T
        == jax.lax.broadcasted_iota(jnp.int32, (m0, m0 * T), 0)
    ).astype(jnp.float32)

    # n_nbr is the row-padded neighbor-table height (multiple of NBR_W), so
    # node // NBR_W <= n_nbr/NBR_W - 1 for every real node: each window fetch
    # is in-bounds and noff always lands inside [0, NBR_W)
    max_nidx = max(n_nbr // NBR_W - 1, 0)

    def test_and_set(node, ok):
        """Visited check + conditional mark, in int32 (no unsigned reductions).

        ``ok`` gates the write-back so padding (-1) neighbors mapped to the
        safe node 0 don't spuriously mark node 0 visited (a round-1 recall
        leak)."""
        word = node // 32
        r, c, b = word // 128, word % 128, node % 32
        row = visited_ref[pl.ds(r, 1), :].astype(jnp.int32)
        sel = lane128 == c
        w = jnp.sum(jnp.where(sel, row, 0))
        mask = jnp.left_shift(jnp.int32(1), b)
        seen = (w & mask) != 0
        write = jnp.logical_and(sel, ok)
        visited_ref[pl.ds(r, 1), :] = jnp.where(write, w | mask, row).astype(
            jnp.uint32
        )
        return seen

    def all_dists():
        """Squared L2 of every vec_buf row-tile group to q: (1, m0) f32."""
        v = vec_buf_ref[:, :].astype(jnp.float32)            # (m0*T, 128)
        dots_p = jax.lax.dot_general(
            v, qt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                    # (m0*T, T)
        dots_r = jnp.sum(
            jnp.where(diag, dots_p, 0.0), axis=1, keepdims=True
        )                                                    # (m0*T, 1)
        sq = jnp.sum(v * v, axis=1, keepdims=True)           # (m0*T, 1)
        both = jnp.concatenate([dots_r, sq], axis=1)         # (m0*T, 2)
        grouped = jax.lax.dot_general(
            G, both, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )                                                    # (m0, 2)
        d = grouped[:, 1:2] - 2.0 * grouped[:, 0:1] + q2     # (m0, 1)
        return d.reshape(1, m0)

    def start_row(node, slot):
        """Async-copy node's T-row tile into vec_buf slot (always aligned:
        node * T and slot * T are multiples of the T-row tile)."""
        base = pl.multiple_of(jnp.clip(node, 0, N - 1) * T, T)
        dst = pl.multiple_of(slot * T, T)
        pltpu.make_async_copy(
            db_ref.at[pl.ds(base, T), :],
            vec_buf_ref.at[pl.ds(dst, T), :],
            vec_sems.at[slot],
        ).start()

    def wait_row(slot):
        dst = pl.multiple_of(slot * T, T)
        pltpu.make_async_copy(
            db_ref.at[pl.ds(0, T), :],
            vec_buf_ref.at[pl.ds(dst, T), :],
            vec_sems.at[slot],
        ).wait()

    def start_nbr(node):
        nbase = pl.multiple_of(
            jnp.minimum(node // NBR_W, max_nidx) * NBR_W, NBR_W
        )
        pltpu.make_async_copy(
            nbr_ref.at[pl.ds(nbase, NBR_W), :], nbr_buf_ref, nbr_sem
        ).start()

    def wait_nbr():
        pltpu.make_async_copy(
            nbr_ref.at[pl.ds(0, NBR_W), :], nbr_buf_ref, nbr_sem
        ).wait()

    # ---- seed the beam with the start node
    start_row(start, 0)
    wait_row(0)
    d_all0 = all_dists()
    d_seed = jnp.sum(jnp.where(lane_m0 == 0, d_all0, 0.0))
    _ = test_and_set(start, jnp.bool_(True))

    beam_ids0 = jnp.where(lane_ef == 0, start, -1)
    beam_d0 = jnp.where(lane_ef == 0, d_seed, INF)
    expanded0 = (lane_ef == 0).astype(jnp.int32)  # start is pre-popped
    start_nbr(start)                              # prefetch its neighbor row

    def body(state):
        beam_ids, beam_d, expanded, step, _, node = state

        # 1. neighbor row for `node` was prefetched last iteration
        wait_nbr()
        noff = node - jnp.minimum(node // NBR_W, max_nidx) * NBR_W
        nbr_vals = jnp.sum(
            jnp.where(sub_nbr == noff, nbr_buf_ref[:, :], 0),
            axis=0, keepdims=True,
        )                                                 # (1, 128) int32

        # 2. visited-filter; fresh rows start their DMAs immediately so the
        # remaining filter scalar work overlaps the copies. Python-unrolled:
        # an in-kernel fori_loop around DMA starts/waits measured ~60 ms/hop
        # on hardware (~1000x the unrolled cost)
        fresh_scalars = []
        nids = []
        for j in range(m0):
            nid = jnp.sum(jnp.where(lane128 == j, nbr_vals, 0))
            ok = nid >= 0
            safe = jnp.where(ok, nid, 0)
            seen = test_and_set(safe, ok)
            fresh = jnp.logical_and(ok, jnp.logical_not(seen))
            fresh_scalars.append(fresh)
            nids.append(nid)

            @pl.when(fresh)
            def _(safe=safe, j=j):
                start_row(safe, j)

        for j in range(m0):
            @pl.when(fresh_scalars[j])
            def _(j=j):
                wait_row(j)

        # 3. distances for all fetched rows
        d_all = all_dists()                               # (1, m0)

        # 4. insert candidates (python unroll; serial greedy replace-worst)
        for j in range(m0):
            worst = jnp.argmax(beam_d.reshape(-1))
            worst_d = jnp.max(beam_d)
            dj = jnp.sum(jnp.where(lane_m0 == j, d_all, 0.0))
            dj = jnp.where(fresh_scalars[j], dj, INF)
            take = dj < worst_d
            sel = jnp.logical_and(lane_ef == worst, take)
            beam_ids = jnp.where(sel, nids[j], beam_ids)
            beam_d = jnp.where(sel, dj, beam_d)
            expanded = jnp.where(sel, 0, expanded)

        # 5. pop the next node now and prefetch its neighbor row, so the
        # DMA flies while the loop comes back around
        d_mask = jnp.where(expanded == 1, INF, beam_d)
        i_star = jnp.argmin(d_mask.reshape(-1))
        cont = jnp.min(d_mask) < INF
        nxt = jnp.sum(jnp.where(lane_ef == i_star, beam_ids, 0))
        expanded = jnp.where(
            jnp.logical_and(lane_ef == i_star, cont), 1, expanded
        )

        @pl.when(jnp.logical_and(cont, step + 1 < max_steps))
        def _():
            start_nbr(nxt)

        return beam_ids, beam_d, expanded, step + 1, cont, nxt

    def cond(state):
        _, _, _, step, cont, _ = state
        return jnp.logical_and(step < max_steps, cont)

    # DMA balance invariant: a neighbor prefetch is started at the end of a
    # body iteration iff `cont && step+1 < max_steps` — exactly the loop's
    # continuation predicate — so every started copy is waited by the next
    # iteration and nothing is in flight when the loop exits. The seed
    # prefetch is consumed by the guaranteed first iteration (max_steps >= 1).
    beam_ids, beam_d, _, _, _, _ = jax.lax.while_loop(
        cond, body,
        (beam_ids0, beam_d0, expanded0, jnp.int32(0), jnp.bool_(True),
         jnp.int32(start)),
    )

    out_ids_ref[pl.ds(qid, 1), :] = beam_ids
    out_d_ref[pl.ds(qid, 1), :] = beam_d


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
    # lane-pad the neighbor table to 128 columns (DMA lane-tiling requirement)
    if nbr0.shape[1] < 128:
        nbr0 = jnp.concatenate(
            [
                nbr0.astype(jnp.int32),
                jnp.full((N, 128 - nbr0.shape[1]), -1, jnp.int32),
            ],
            axis=1,
        )
    else:
        nbr0 = nbr0.astype(jnp.int32)
    # row-pad the neighbor table to a multiple of NBR_W with -1 rows: without
    # it the last N % NBR_W nodes' window offsets land past the window (their
    # rows read as node 0) and for N < NBR_W the window DMA reads OOB
    n_nbr = ((N + NBR_W - 1) // NBR_W) * NBR_W
    if n_nbr != N:
        nbr0 = jnp.concatenate(
            [nbr0, jnp.full((n_nbr - N, 128), -1, jnp.int32)], axis=0
        )

    # row-tile the database: pad D so each row is a whole number of aligned
    # sublane tiles (8 rows f32 / 16 rows bf16 per tile of 128 lanes)
    t_align = 16 if db.dtype == jnp.bfloat16 else 8
    lane_d = 128 * t_align
    d_pad = ((D + lane_d - 1) // lane_d) * lane_d
    if d_pad != D:
        db = jnp.concatenate(
            [db, jnp.zeros((N, d_pad - D), db.dtype)], axis=1
        )
        queries = jnp.concatenate(
            [queries, jnp.zeros((Q, d_pad - D), queries.dtype)], axis=1
        )
    T = d_pad // 128
    db_flat = db.reshape(N * T, 128)
    qt = queries.astype(jnp.float32).reshape(Q * T, 128)

    max_steps = max_steps or 4 * ef
    ef_pad = max(((ef + 127) // 128) * 128, 128)  # lane-aligned beam
    vw = -(-N // (128 * 32))  # bitset rows

    kernel = partial(
        _beam_kernel, m0=m0, ef=ef_pad, max_steps=max_steps, T=T, N=N,
        n_nbr=n_nbr,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q,),
        in_specs=[
            # full arrays: Mosaic requires (8, 128)-aligned blocks; each
            # program dynamic-indexes its own query/output row instead
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((vw, 128), jnp.uint32),
            pltpu.VMEM((NBR_W, 128), jnp.int32),
            pltpu.VMEM((m0 * T, 128), db.dtype),
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
    )(starts.astype(jnp.int32), qt, db_flat, nbr0)

    order = jnp.argsort(out_d, axis=1)
    d_sorted = jnp.take_along_axis(out_d, order, axis=1)[:, :ef]
    i_sorted = jnp.take_along_axis(out_ids, order, axis=1)[:, :ef]
    return -d_sorted, i_sorted
