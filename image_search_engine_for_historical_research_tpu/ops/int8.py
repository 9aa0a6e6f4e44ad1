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
vs the exact f32 scan is ~1.0 at 1M (see BASELINE.md int8 rows); for strict
exactness the index keeps an optional bf16 copy and re-ranks a small gathered
shortlist (``ops.pq``'s adc+rerank pattern).

No reference counterpart: the reference's flat scan is float64 numpy on CPU
(``/root/reference/src/utils/nnsearch.py:687-706``); int8 here plays the role
faiss's ``IndexScalarQuantizer(QT_8bit)`` plays in that ecosystem.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# one-shot (Q, N) f32 score-matrix budget, matching ops.topk
ONESHOT_SCORE_BYTES = 2 << 30
QBLOCK = 8192


def _quantize_block(x: jnp.ndarray):
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    codes = jnp.clip(jnp.round(x * inv[:, None]), -127, 127).astype(jnp.int8)
    return codes, scale


def quantize_rows_int8(x: jnp.ndarray, chunk: int = 131072):
    """Per-row symmetric int8 quantization.

    Returns ``(codes int8 (N, D), scales f32 (N,))`` with
    ``x ~= scales[:, None] * codes``. All-zero rows get scale 0 (codes 0).
    Rows are processed in ``chunk``-row blocks so the f32 working copy stays
    O(chunk x D) — at 1M x 2048 a whole-array f32 temp alone is 8 GB
    (CLAUDE.md HBM rule).
    """
    x = jnp.asarray(x)
    N, D = x.shape
    if N <= chunk:
        return _quantize_block(x)
    pad = (-N) % chunk
    xp = jnp.concatenate([x, jnp.zeros((pad, D), x.dtype)], 0) if pad else x
    codes, scales = jax.lax.map(
        _quantize_block, xp.reshape(-1, chunk, D)
    )
    return codes.reshape(-1, D)[:N], scales.reshape(-1)[:N]


@partial(jax.jit, static_argnames=("k", "approximate", "recall_target"))
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
    dequantized approximation of the inner product.
    """
    Q, D = queries.shape
    N = codes.shape[0]
    k = min(k, N)
    qc, qs = quantize_rows_int8(queries)

    def scan_block(qc_b, qs_b):
        d = jax.lax.dot_general(
            qc_b, codes, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s = d.astype(jnp.float32) * (qs_b[:, None] * scales[None, :])
        if approximate:
            return jax.lax.approx_max_k(s, k, recall_target=recall_target)
        return jax.lax.top_k(s, k)

    if Q > QBLOCK and Q * N * 4 > ONESHOT_SCORE_BYTES:
        pad = (-Q) % QBLOCK
        qc_p = jnp.concatenate([qc, jnp.zeros((pad, D), jnp.int8)], 0) if pad else qc
        qs_p = jnp.concatenate([qs, jnp.zeros((pad,), jnp.float32)], 0) if pad else qs
        s, i = jax.lax.map(
            lambda args: scan_block(*args),
            (qc_p.reshape(-1, QBLOCK, D), qs_p.reshape(-1, QBLOCK)),
        )
        return s.reshape(-1, k)[:Q], i.reshape(-1, k)[:Q]

    return scan_block(qc, qs)


@partial(jax.jit, static_argnames=("k", "shortlist", "approximate"))
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
    exactly, restoring exact ordering with probability -> 1 in the shortlist
    depth. Gather traffic is Q x shortlist x D — O(1e-3) of the full scan.
    """
    Q, D = queries.shape
    N = codes.shape[0]
    k = min(k, N)
    shortlist = min(max(shortlist, k), N)
    _, cand = int8_topk(
        queries, codes, scales, shortlist, approximate=approximate
    )
    g = jnp.take(rerank_vectors, cand, axis=0)  # (Q, shortlist, D)
    s = jnp.einsum(
        "qd,qcd->qc", queries.astype(g.dtype), g,
        preferred_element_type=jnp.float32,
    )
    ts, sel = jax.lax.top_k(s, k)
    return ts, jnp.take_along_axis(cand, sel, axis=1)
