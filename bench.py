"""Benchmark of record: exact top-k query latency over a 1M x 2048 index.

Mirrors the reference's headline configuration (BASELINE.md: rOx/rPar + 1M
distractors, top-100, per-query matching time excluding index build —
``/root/reference/src/utils/nnsearch.py:699-706`` timing protocol). The
reference's CPU numpy loop does a full argsort per query; here the database is
HBM-resident bfloat16 and one fused matmul + top-k serves the whole query batch.

Measurement notes: this environment reaches the TPU through a tunnel with ~33 ms
per-call round-trip and an unreliable ``block_until_ready``, so the kernel is
iterated R times *inside one jitted scan* (data-dependent chaining defeats CSE)
and the per-iteration time is the scan total divided by R, with one round-trip
subtracted via a calibration no-op.

Prints ONE JSON line. ``vs_baseline`` is the north-star target ratio (target:
< 2 ms p50 per query on TPU; BASELINE.json) — values > 1 mean faster than target.
"""

import json
import time

import numpy as np


def _force(x):
    """Force completion through the tunnel (tiny host transfer)."""
    return np.asarray(x if getattr(x, "ndim", 0) == 0 else x.ravel()[:1])


def main():
    import jax
    import jax.numpy as jnp

    N, D, Q, K, R = 1_000_000, 2048, 70, 100, 20
    key = jax.random.PRNGKey(0)
    kd, kq = jax.random.split(key)
    db = jax.random.normal(kd, (N, D), jnp.bfloat16)
    db = db / jnp.linalg.norm(db.astype(jnp.float32), axis=1, keepdims=True).astype(
        jnp.bfloat16
    )
    q0 = jax.random.normal(kq, (Q, D), jnp.float32)
    q0 = q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)

    from image_search_engine_for_historical_research_tpu.ops import exact_topk

    @jax.jit
    def bench_loop(q, db):
        def body(carry, _):
            qc = carry
            s, i = exact_topk(qc, db, K, metric="ip", matmul_dtype=jnp.bfloat16)
            # fold the result back into the query so iterations chain (no CSE)
            delta = (s[:, :1] + i[:, :1].astype(jnp.float32)) * 1e-12
            return qc + delta, (s[0, 0], i[0, 0])

        carry, outs = jax.lax.scan(body, q, None, length=R)
        return outs[0][-1], outs[1][-1]

    @jax.jit
    def calib(q):
        return jnp.sum(q)

    _force(calib(q0))
    t0 = time.perf_counter()
    _force(calib(q0))
    roundtrip = time.perf_counter() - t0

    _force(bench_loop(q0, db))  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _force(bench_loop(q0, db))
        times.append(time.perf_counter() - t0)
    total = float(np.median(times)) - roundtrip
    per_query_ms = max(total, 0.0) / R / Q * 1e3

    target_ms = 2.0  # north-star p50 target (BASELINE.json)
    print(
        json.dumps(
            {
                "metric": "p50_exact_search_latency_1Mx2048_top100",
                "value": round(per_query_ms, 4),
                "unit": "ms/query",
                "vs_baseline": round(target_ms / per_query_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
