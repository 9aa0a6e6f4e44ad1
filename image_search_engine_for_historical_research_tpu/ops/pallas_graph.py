"""Pallas TPU kernel: HBM-resident HNSW level-0 beam search.

The TPU-native answer to SURVEY.md section 7's hard part (ii): data-dependent
graph traversal on a SIMD machine. The XLA version (``ops.graph_search``)
routes every hop through jit gathers/scatters over (Q, N) buffers and measured
unusable at 1M scale; this kernel keeps the entire per-query search state
on-chip.

Real-TPU Mosaic constraints shaped the design (each discovered on hardware):

- no scalar VMEM stores -> the beam lives in the ``while_loop`` carry as
  (1, ef) vectors (ids / distances / expanded flags) updated by lane-masked
  selects; the visited bitset is the only VMEM scratch, updated by masked
  (1, 128) row writes in int32 (no unsigned reductions);
- DMA slices must be sublane-aligned -> vector/neighbor fetches copy aligned
  row *windows* (16 rows for bf16, 8 for f32/int32) and the wanted row is
  extracted with iota masks;
- no i1 vector select/reduce -> all flags are int32 0/1.

One grid step = one query; async row-window DMAs for all ``m0`` neighbors are
in flight together before the distance matvec. Entry points come from the
caller (coarse-level matmul seeds — ``HNSWIndex.search_pallas``). Distances are
squared L2 in f32 (ordering matches the reference's ``np.linalg.norm``,
nnsearch.py:63-65); termination matches ``_search_graph`` (nnsearch.py:321-350)
with a hard ``max_steps`` bound.
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
    q_ref,                 # (Q, D) f32 VMEM
    db_ref,                # (N, D) HBM
    nbr_ref,               # (N, m0) int32 HBM
    out_ids_ref,           # (Q, EF) int32
    out_d_ref,             # (Q, EF) f32
    visited_ref,           # (VW, 128) uint32 VMEM bitset
    nbr_buf_ref,           # (NBR_W, 128) int32 VMEM (lane-padded nbr rows)
    vec_buf_ref,           # (m0 * W, D) VMEM
    nbr_sem,
    vec_sems,              # (m0,)
    *,
    m0: int,
    ef: int,
    max_steps: int,
    W: int,
    N: int,
):
    qid = pl.program_id(0)
    start = starts_ref[qid]

    q = q_ref[pl.ds(qid, 1), :].astype(jnp.float32)      # (1, D)
    q2 = jnp.sum(q * q)

    visited_ref[:, :] = jnp.zeros_like(visited_ref)

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    lane_ef = jax.lax.broadcasted_iota(jnp.int32, (1, ef), 1)
    lane_m0 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)  # padded width
    lane_mw = jax.lax.broadcasted_iota(jnp.int32, (1, m0 * W), 1)
    sub_nbr = jax.lax.broadcasted_iota(jnp.int32, (NBR_W, 128), 0)

    # window bases are computed as (index * W) and hinted with
    # pl.multiple_of: Mosaic must *prove* dynamic slice starts are
    # tile-aligned (failed-to-prove errors on hardware otherwise)
    max_widx = max(N // W - 1, 0)
    max_nidx = max(N // NBR_W - 1, 0)

    def test_and_set(node):
        """Visited check + mark, in int32 (no unsigned reductions)."""
        word = node // 32
        r, c, b = word // 128, word % 128, node % 32
        row = visited_ref[pl.ds(r, 1), :].astype(jnp.int32)
        sel = lane128 == c
        w = jnp.sum(jnp.where(sel, row, 0))
        mask = jnp.left_shift(jnp.int32(1), b)
        seen = (w & mask) != 0
        visited_ref[pl.ds(r, 1), :] = jnp.where(sel, w | mask, row).astype(
            jnp.uint32
        )
        return seen

    def all_dists():
        """Squared L2 of every vec_buf row to q: (1, m0 * W) f32."""
        v = vec_buf_ref[:, :].astype(jnp.float32)
        v2 = jnp.sum(v * v, axis=1, keepdims=True)
        dots = jax.lax.dot_general(
            v, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        return (v2 - 2.0 * dots + q2).reshape(1, m0 * W)

    def start_window(node, slot):
        """Async-copy the aligned W-row window containing ``node`` into
        vec_buf slot; returns the in-window offset."""
        base = pl.multiple_of(jnp.minimum(node // W, max_widx) * W, W)
        off = node - base
        pltpu.make_async_copy(
            db_ref.at[pl.ds(base, W), :],
            vec_buf_ref.at[pl.ds(slot * W, W), :],
            vec_sems.at[slot],
        ).start()
        return off

    def wait_window(slot):
        pltpu.make_async_copy(
            db_ref.at[pl.ds(0, W), :],
            vec_buf_ref.at[pl.ds(slot * W, W), :],
            vec_sems.at[slot],
        ).wait()

    # ---- seed the beam with the start node
    off0 = start_window(start, 0)
    wait_window(0)
    d_all0 = all_dists()
    d_seed = jnp.sum(jnp.where(lane_mw == off0, d_all0, 0.0))
    _ = test_and_set(start)

    beam_ids0 = jnp.where(lane_ef == 0, start, -1)
    beam_d0 = jnp.where(lane_ef == 0, d_seed, INF)
    expanded0 = jnp.zeros((1, ef), jnp.int32)

    def body(state):
        beam_ids, beam_d, expanded, step, _ = state

        # 1. pop the best unexpanded entry
        d_mask = jnp.where(expanded == 1, INF, beam_d)
        i_star = jnp.argmin(d_mask.reshape(-1))
        node = jnp.sum(jnp.where(lane_ef == i_star, beam_ids, 0))
        expanded = jnp.maximum(expanded, (lane_ef == i_star).astype(jnp.int32))

        # 2. fetch its neighbor row (aligned NBR_W-row window)
        nbase = pl.multiple_of(
            jnp.minimum(node // NBR_W, max_nidx) * NBR_W, NBR_W
        )
        noff = node - nbase
        dma = pltpu.make_async_copy(
            nbr_ref.at[pl.ds(nbase, NBR_W), :], nbr_buf_ref, nbr_sem
        )
        dma.start()
        dma.wait()
        nbr_vals = jnp.sum(
            jnp.where(sub_nbr == noff, nbr_buf_ref[:, :], 0),
            axis=0, keepdims=True,
        )                                                 # (1, 128) int32

        # 3. visited-filter + launch all fresh window DMAs (static unroll)
        fresh_scalars = []
        offs = []
        for j in range(m0):
            nid = jnp.sum(jnp.where(lane_m0 == j, nbr_vals, 0))
            ok = nid >= 0
            safe = jnp.where(ok, nid, 0)
            seen = test_and_set(safe)
            fresh = jnp.logical_and(ok, jnp.logical_not(seen))
            fresh_scalars.append(fresh)
            base = pl.multiple_of(jnp.minimum(safe // W, max_widx) * W, W)
            offs.append(safe - base)

            @pl.when(fresh)
            def _(base=base, j=j):
                pltpu.make_async_copy(
                    db_ref.at[pl.ds(base, W), :],
                    vec_buf_ref.at[pl.ds(j * W, W), :],
                    vec_sems.at[j],
                ).start()

        for j in range(m0):
            @pl.when(fresh_scalars[j])
            def _(j=j):
                wait_window(j)

        # 4. distances for all fetched windows
        d_all = all_dists()                               # (1, m0 * W)

        # 5. insert candidates (python unroll: offs are per-j scalars)
        for j in range(m0):
            worst = jnp.argmax(beam_d.reshape(-1))
            worst_d = jnp.max(beam_d)
            dj = jnp.sum(jnp.where(lane_mw == j * W + offs[j], d_all, 0.0))
            dj = jnp.where(fresh_scalars[j], dj, INF)
            nid = jnp.sum(jnp.where(lane_m0 == j, nbr_vals, 0))
            take = jnp.logical_and(dj < worst_d, nid >= 0)
            sel = jnp.logical_and(lane_ef == worst, take)
            beam_ids = jnp.where(sel, nid, beam_ids)
            beam_d = jnp.where(sel, dj, beam_d)
            expanded = jnp.where(sel, 0, expanded)

        frontier = (1 - expanded) * (beam_ids >= 0).astype(jnp.int32)
        return beam_ids, beam_d, expanded, step + 1, jnp.max(frontier) > 0

    def cond(state):
        _, _, _, step, cont = state
        return jnp.logical_and(step < max_steps, cont)

    beam_ids, beam_d, expanded, _, _ = jax.lax.while_loop(
        cond, body, (beam_ids0, beam_d0, expanded0, jnp.int32(0), jnp.bool_(True))
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
    max_steps = max_steps or 4 * ef
    ef_pad = max(((ef + 127) // 128) * 128, 128)  # lane-aligned beam
    vw = -(-N // (128 * 32))  # bitset rows
    W = 16 if db.dtype == jnp.bfloat16 else 8

    kernel = partial(
        _beam_kernel, m0=m0, ef=ef_pad, max_steps=max_steps, W=W, N=N
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q,),
        in_specs=[
            # full arrays: Mosaic requires (8, 128)-aligned blocks; each
            # program dynamic-indexes its own query/output row instead
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((vw, 128), jnp.uint32),
            pltpu.VMEM((NBR_W, 128), jnp.int32),
            pltpu.VMEM((m0 * W, D), db.dtype),
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
