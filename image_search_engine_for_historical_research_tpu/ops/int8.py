"""Int8-quantized exact search: halve the HBM bytes of the flat scan.

The 1M x 2048 exact scan is memory-bound (BASELINE.md: the bf16 matmul+reduce
alone sits at 84% of the v5e HBM roofline), so the only remaining lever on the
metric of record is reading fewer bytes per database row. Symmetric per-row
int8 quantization stores the gallery at 1 byte/dim (2 GB at 1M x 2048 — half
of bf16, a quarter of f32) and scores it with a native int8 x int8 -> int32
MXU matmul (v5e int8 throughput is 2x bf16 on top of the bandwidth win).

Scoring model (inner-product / cosine metric): with per-row scales
``x_j ~= s_j * c_j`` and a per-row quantized query ``q_i ~= t_i * u_i``
(``c, u`` int8), the exact score factors as

    q_i . x_j  ~=  t_i * s_j * (u_i . c_j)

where ``u_i . c_j`` is the int32 MXU dot. The scale product is a rank-1
elementwise correction XLA fuses into the top-k consumer. Quantization noise
for L2-normalized 2048-d descriptors is ~1e-3 relative — measured recall@100
equals the shipped bf16 scan's (both are limited by 8-bit-mantissa input
rounding; tests/test_int8.py); for strict shortlist quality the index keeps
an optional bf16 copy and re-ranks a small gathered shortlist (``ops.pq``'s
adc+rerank pattern).

Memory discipline (CLAUDE.md HBM rules): quantization streams the input in
row blocks (host arrays are uploaded block-wise, device arrays sliced
block-wise — no full-size f32 temporary), and the scan chunks over N with the
same byte-budget logic as ``ops.topk.exact_topk``, counting the int32 dot and
f32 score planes that coexist per chunk.

No reference counterpart: the reference's flat scan is float64 numpy on CPU
(``/root/reference/src/utils/nnsearch.py:687-706``); int8 here plays the role
faiss's ``IndexScalarQuantizer(QT_8bit)`` plays in that ecosystem.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# one-shot score budget (bytes of the per-chunk int32 + f32 score planes),
# matching ops.topk's ONESHOT_SCORE_BYTES discipline
ONESHOT_SCORE_BYTES = 2 << 30
SCORE_BYTES_PER_ELT = 8  # int32 dot plane + f32 scaled plane coexist
QBLOCK = 8192
QUANT_CHUNK = 131072


def _quantize_block(x: jnp.ndarray):
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    codes = jnp.clip(jnp.round(x * inv[:, None]), -127, 127).astype(jnp.int8)
    return codes, scale


_quantize_block_jit = jax.jit(_quantize_block)


def _iter_blocks(x, chunk: int):
    """Yield ``(start, device_block)`` row blocks of ``x``.

    Host (numpy) inputs are uploaded one block at a time; device arrays are
    sliced one block at a time (``lax.slice_in_dim`` copies only the block).
    Neither path materializes a second full-size array.
    """
    N = x.shape[0]
    on_host = isinstance(x, np.ndarray)
    for start in range(0, N, chunk):
        stop = min(start + chunk, N)
        if on_host:
            yield start, jnp.asarray(x[start:stop])
        else:
            yield start, jax.lax.slice_in_dim(x, start, stop)


def quantize_rows_int8(x, chunk: int = QUANT_CHUNK):
    """Per-row symmetric int8 quantization.

    Returns ``(codes int8 (N, D), scales f32 (N,))`` with
    ``x ~= scales[:, None] * codes``. All-zero rows get scale 0 (codes 0).
    Streams ``chunk``-row blocks so the f32 working set stays O(chunk x D)
    — at 1M x 2048 a whole-array f32 temp alone is 8 GB (CLAUDE.md HBM
    rule). Accepts device arrays or host numpy (uploaded block-wise).
    """
    N = x.shape[0]
    if not isinstance(x, np.ndarray) and N <= chunk:
        return _quantize_block_jit(jnp.asarray(x))
    parts = [ _quantize_block_jit(blk) for _, blk in _iter_blocks(x, chunk) ]
    if len(parts) == 1:
        return parts[0]
    codes = jnp.concatenate([c for c, _ in parts], axis=0)
    scales = jnp.concatenate([s for _, s in parts], axis=0)
    return codes, scales


@partial(jax.jit, static_argnames=("k", "approximate", "recall_target"))
def _int8_scan(qc, qs, codes, scales, k, approximate, recall_target):
    """Fused int8 scan + top-k over all of ``codes``, N-chunked to budget."""
    Q, D = qc.shape
    N = codes.shape[0]

    def score_block(qc_b, qs_b, codes_b, scales_b):
        d = jax.lax.dot_general(
            qc_b, codes_b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return d.astype(jnp.float32) * (qs_b[:, None] * scales_b[None, :])

    def top(s):
        kk = min(k, s.shape[1])
        if approximate:
            return jax.lax.approx_max_k(s, kk, recall_target=recall_target)
        return jax.lax.top_k(s, kk)

    if Q * N * SCORE_BYTES_PER_ELT <= ONESHOT_SCORE_BYTES:
        return top(score_block(qc, qs, codes, scales))

    # N-chunked path (the exact_topk pattern): per-chunk top-k, one merge.
    per_chunk_budget = ONESHOT_SCORE_BYTES // 4
    chunk = max(per_chunk_budget // (Q * SCORE_BYTES_PER_ELT), 512)
    chunk = max(128, min((chunk // 128) * 128, ((N + 127) // 128) * 128))
    pad = (-N) % chunk
    codes_p = (
        jnp.concatenate([codes, jnp.zeros((pad, D), codes.dtype)], 0)
        if pad else codes
    )
    scales_p = (
        jnp.concatenate([scales, jnp.zeros((pad,), scales.dtype)], 0)
        if pad else scales
    )
    nchunks = codes_p.shape[0] // chunk
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    k_local = min(k, chunk)

    def one_chunk(inp):
        cb, sb, cidx = inp
        s = score_block(qc, qs, cb, sb)
        gidx = row_iota + cidx * chunk
        s = jnp.where(gidx < N, s, -jnp.inf)
        ts, sel = jax.lax.top_k(s, k_local)
        return ts, sel + cidx * chunk

    top_s, top_i = jax.lax.map(
        one_chunk,
        (
            codes_p.reshape(nchunks, chunk, D),
            scales_p.reshape(nchunks, chunk),
            jnp.arange(nchunks, dtype=jnp.int32),
        ),
    )
    cand_s = jnp.transpose(top_s, (1, 0, 2)).reshape(Q, nchunks * k_local)
    cand_i = jnp.transpose(top_i, (1, 0, 2)).reshape(Q, nchunks * k_local)
    final_s, sel = jax.lax.top_k(cand_s, min(k, N))
    return final_s, jnp.take_along_axis(cand_i, sel, axis=1)


def _qblocked(fn, queries, k, *arrays):
    """Run ``fn(q_block, *arrays)`` over QBLOCK-row query blocks (host loop:
    each block's outputs are (QBLOCK, k) — tiny — and the block programs hit
    the jit cache after the first)."""
    Q = queries.shape[0]
    outs_s, outs_i = [], []
    for start in range(0, Q, QBLOCK):
        stop = min(start + QBLOCK, Q)
        qb = jax.lax.slice_in_dim(queries, start, stop)
        s, i = fn(qb, *arrays)
        outs_s.append(s)
        outs_i.append(i)
    return jnp.concatenate(outs_s, 0), jnp.concatenate(outs_i, 0)


def int8_topk(
    queries: jnp.ndarray,
    codes: jnp.ndarray,
    scales: jnp.ndarray,
    k: int,
    *,
    approximate: bool = False,
    recall_target: float = 0.95,
):
    """Top-k inner-product search over an int8-quantized gallery.

    ``queries (Q, D) f32`` (need not be normalized — they are quantized
    per-row here), ``codes (N, D) int8``, ``scales (N,) f32``. Returns
    ``(scores, idx)`` of shape ``(Q, k)``, scores descending in the
    dequantized approximation of the inner product. Large query batches
    (gallery self-kNN) are processed in QBLOCK-row blocks; within a block
    the scan chunks over N to the score-byte budget.
    """
    queries = jnp.asarray(queries)
    Q = queries.shape[0]
    N = codes.shape[0]
    k = min(k, N)

    def run(qb):
        qc, qs = _quantize_block_jit(qb)
        return _int8_scan(qc, qs, codes, scales, k, approximate, recall_target)

    if Q > QBLOCK:
        return _qblocked(lambda qb: run(qb), queries, k)
    return run(queries)


# module-level jit, arrays passed as ARGUMENTS (never closed over: captured
# device arrays serialize into the remote-compile payload — CLAUDE.md trap)
@partial(jax.jit, static_argnames=("k", "shortlist", "approximate"))
def _rerank_block(qb, codes, scales, rerank_vectors, k, shortlist, approximate):
    qc, qs = _quantize_block(qb)
    _, cand = _int8_scan(qc, qs, codes, scales, shortlist, approximate, 0.95)
    g = jnp.take(rerank_vectors, cand, axis=0)  # (q, shortlist, D)
    s = jnp.einsum(
        "qd,qcd->qc", qb.astype(g.dtype), g,
        preferred_element_type=jnp.float32,
    )
    ts, sel = jax.lax.top_k(s, k)
    return ts, jnp.take_along_axis(cand, sel, axis=1)


def int8_topk_rerank(
    queries: jnp.ndarray,
    codes: jnp.ndarray,
    scales: jnp.ndarray,
    rerank_vectors: jnp.ndarray,
    k: int,
    *,
    shortlist: int = 512,
    approximate: bool = True,
):
    """Int8 scan shortlist + exact re-rank against ``rerank_vectors``.

    The int8 scan ranks a ``shortlist``-deep candidate set (approx_max_k by
    default — it fuses into the producing matmul); the candidates' rows are
    gathered from ``rerank_vectors (N, D)`` (bf16 or f32) and re-scored
    exactly, restoring full-precision ordering within the shortlist. Gather
    traffic is Q x shortlist x D — O(1e-3) of the full scan per query; large
    Q is QBLOCK-blocked so the gather buffer stays bounded.
    """
    queries = jnp.asarray(queries)
    Q = queries.shape[0]
    N = codes.shape[0]
    k = min(k, N)
    shortlist = min(max(shortlist, k), N)

    def run(qb):
        return _rerank_block(
            qb, codes, scales, rerank_vectors, k, shortlist, approximate
        )

    if Q > QBLOCK:
        return _qblocked(run, queries, k)
    return run(queries)
