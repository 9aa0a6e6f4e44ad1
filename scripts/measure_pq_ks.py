"""Measure PQ at the reference driver's operating point (Ks=2^13).

The reference's offline/online drivers run PQ with N_books=16 and
N_words=2**13 (/root/reference/src/offline.py:109,116), not nanopq's 8-bit
default. Two questions are measured here on the real chip:

1. ``adc`` mode — the onehot-vs-gather ADC crossover: the one-hot MXU
   formulation pays FLOPs linear in Ks, the row-gather path pays a
   scalar-unit-bound gather per (row, subspace) independent of Ks. Timed with
   the in-scan slope protocol (CLAUDE.md: the tunnel adds ~33 ms per call and
   block_until_ready is unreliable).
2. ``build`` mode — train + encode wall time at 1M x 2048 with Ks=8192
   (subsampled bf16 Lloyd, see ops.pq.pq_train) and shortlist recall vs the
   exact scan on clustered synthetic data.

Usage:  python scripts/measure_pq_ks.py adc|build [--n 1000000]
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


def _slope_time(fn, *args, rs=(2, 8), tries=3):
    """Per-iteration seconds via the two-R scan-slope protocol."""
    times = {}
    for R in rs:
        loop = fn(R)
        _force(loop(*args))  # compile
        best = min(
            _timed(lambda: _force(loop(*args))) for _ in range(tries)
        )
        times[R] = best
    return (times[rs[1]] - times[rs[0]]) / (rs[1] - rs[0])


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def measure_adc(n, ks_list, q=70, m=16, k=100):
    import jax
    import jax.numpy as jnp

    from image_search_engine_for_historical_research_tpu.ops.pq import (
        PQCodebook, pq_search,
    )

    ds = 2048 // m
    key = jax.random.PRNGKey(0)
    kq, kc, kw = jax.random.split(key, 3)
    queries = jax.random.normal(kq, (q, 2048), jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)

    results = []
    for ks in ks_list:
        codes = jax.random.randint(
            kc, (n, m), 0, ks, jnp.int32
        ).astype(jnp.uint16 if ks <= 65536 else jnp.int32)
        cw = jax.random.normal(kw, (m, ks, ds), jnp.float32) * ds ** -0.5
        for method in ("onehot", "gather"):
            def make_loop(R, method=method, cw=cw, codes=codes):
                @jax.jit
                def loop(qv):
                    def body(carry, _):
                        s, i = pq_search(
                            PQCodebook(cw), codes, carry, k, method=method
                        )
                        return carry + (
                            s[:, :1] + i[:, :1].astype(jnp.float32)
                        ) * 1e-12, None

                    c, _ = jax.lax.scan(body, qv, None, length=R)
                    return c

                return loop

            per_iter = _slope_time(make_loop, queries)
            row = {
                "Ks": ks, "method": method, "N": n,
                "ms_per_query": per_iter / q * 1e3,
                "ms_per_batch": per_iter * 1e3,
            }
            print(json.dumps(row), flush=True)
            results.append(row)
    return results


def measure_build(n, ks=8192, m=16, q=70, k=100):
    import jax
    import jax.numpy as jnp

    from synth_data import clustered_db

    from image_search_engine_for_historical_research_tpu.ops.pq import (
        pq_encode, pq_search, pq_train,
    )
    from image_search_engine_for_historical_research_tpu.ops.topk import exact_topk

    d = 2048
    db = clustered_db(jax.random.PRNGKey(1), n, d)
    _force(db)
    queries = db[:q]

    t_train = _timed(lambda: _force(pq_train(db, M=m, Ks=ks).codewords))
    cb = pq_train(db, M=m, Ks=ks)  # cached compile; rerun for the handle
    t_encode = _timed(lambda: _force(pq_encode(cb, db)))
    codes = pq_encode(cb, db)

    s_exact, i_exact = exact_topk(queries, db, k, matmul_dtype=jnp.bfloat16)
    s_pq, i_pq = pq_search(cb, codes, queries, k)
    ie, ip = np.asarray(i_exact), np.asarray(i_pq)
    top1_in_10 = float(np.mean([ie[i, 0] in ip[i, :10] for i in range(q)]))
    top10_in_100 = float(np.mean([
        len(set(ie[i, :10]) & set(ip[i])) / 10 for i in range(q)
    ]))
    out = {
        "N": n, "Ks": ks, "M": m,
        "train_s": round(t_train, 1), "encode_s": round(t_encode, 1),
        "recall_top1_in_10": top1_in_10,
        "recall_top10_in_100": top10_in_100,
        "code_bytes": int(np.asarray(codes).nbytes),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["adc", "build"])
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--ks", type=int, nargs="*", default=[256, 1024, 2048, 4096, 8192])
    args = p.parse_args()
    if args.mode == "adc":
        measure_adc(args.n, args.ks)
    else:
        measure_build(args.n, ks=args.ks[-1] if args.ks else 8192)
