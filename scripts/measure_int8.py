"""Hardware measurement: int8 exact scan vs the bf16 scan at 1M x 2048.

The exact scan is HBM-bound (BASELINE.md: bf16 matmul+reduce = 84% of the
v5e roofline), so int8 storage should land near 2x: half the bytes per row
plus double MXU throughput. Timed with the in-scan slope protocol
(CLAUDE.md tunnel caveats). Recall of both int8 modes is checked against
the f32-input exact scan on the low-rank clustered synthetic gallery.

Usage: python scripts/measure_int8.py [--n 1000000] [--q 70]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(x):
    return np.asarray(x.ravel()[:1])


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def _slope(make_loop, args, rs=(2, 10), tries=3):
    times = {}
    for R in rs:
        loop = make_loop(R)
        _force(loop(*args))
        times[R] = min(_timed(lambda: _force(loop(*args))) for _ in range(tries))
    return (times[rs[1]] - times[rs[0]]) / (rs[1] - rs[0])


def main():
    import jax
    import jax.numpy as jnp

    from image_search_engine_for_historical_research_tpu.ops.int8 import (
        int8_topk,
        int8_topk_rerank,
        quantize_rows_int8,
    )
    from image_search_engine_for_historical_research_tpu.ops.topk import exact_topk

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=2048)
    p.add_argument("--q", type=int, default=70)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--shortlist", type=int, default=512)
    args = p.parse_args()

    from synth_data import clustered_db

    # generate straight to bf16 (rows already unit-norm): bf16 4 GB +
    # int8 2 GB fits; an f32 stage would put 8 GB more on a 16 GB chip
    key = jax.random.PRNGKey(0)
    db_bf16 = clustered_db(key, args.n, args.d, dtype=jnp.bfloat16)
    _force(db_bf16)
    codes, scales = quantize_rows_int8(db_bf16)
    _force(codes)
    queries = db_bf16[: args.q].astype(jnp.float32)
    _force(queries)

    Q, k = args.q, args.k

    # --- recall vs the bf16 exact scan (the shipped FlatIndex default) ---
    _, i_bf = exact_topk(queries, db_bf16, k, matmul_dtype=jnp.bfloat16)
    i_bf = np.asarray(i_bf)
    _, i_i8 = int8_topk(queries, codes, scales, k)
    i_i8 = np.asarray(i_i8)
    _, i_rr = int8_topk_rerank(
        queries, codes, scales, db_bf16, k, shortlist=args.shortlist
    )
    i_rr = np.asarray(i_rr)
    rec = lambda a, b: float(
        np.mean([len(set(a[q]) & set(b[q])) / k for q in range(Q)])
    )
    print(
        json.dumps(
            {
                "stage": "recall_vs_bf16_scan",
                "int8": round(rec(i_i8, i_bf), 4),
                "int8_rerank": round(rec(i_rr, i_bf), 4),
            }
        ),
        flush=True,
    )

    # --- timing: slope of R chained iterations inside one jitted scan ---
    def make_bf16_loop(R):
        @jax.jit
        def loop(q, x):
            def body(c, _):
                s, i = exact_topk(c, x, k, matmul_dtype=jnp.bfloat16)
                return c + (s[:, :1] + i[:, :1].astype(jnp.float32)) * 1e-12, None

            c, _ = jax.lax.scan(body, q, None, length=R)
            return c

        return loop

    def make_i8_loop(R):
        @jax.jit
        def loop(q, cds, scl):
            def body(c, _):
                s, i = int8_topk(c, cds, scl, k)
                return c + (s[:, :1] + i[:, :1].astype(jnp.float32)) * 1e-12, None

            c, _ = jax.lax.scan(body, q, None, length=R)
            return c

        return loop

    def make_rr_loop(R):
        @jax.jit
        def loop(q, cds, scl, rr):
            def body(c, _):
                s, i = int8_topk_rerank(
                    c, cds, scl, rr, k, shortlist=args.shortlist
                )
                return c + (s[:, :1] + i[:, :1].astype(jnp.float32)) * 1e-12, None

            c, _ = jax.lax.scan(body, q, None, length=R)
            return c

        return loop

    for name, mk, a in (
        ("bf16_scan", make_bf16_loop, (queries, db_bf16)),
        ("int8_scan", make_i8_loop, (queries, codes, scales)),
        ("int8_rerank", make_rr_loop, (queries, codes, scales, db_bf16)),
    ):
        per_iter = _slope(mk, a)
        print(
            json.dumps(
                {
                    "stage": name,
                    "N": args.n,
                    "Q": Q,
                    "ms_per_query": round(per_iter / Q * 1e3, 4),
                    "ms_per_batch": round(per_iter * 1e3, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
