"""Benchmark of record: exact top-k query latency over a 1M x 2048 index.

Mirrors the reference's headline configuration (BASELINE.md: rOx/rPar + 1M
distractors, top-100, per-query matching time excluding index build --
``/root/reference/src/utils/nnsearch.py:699-706`` timing protocol). The
reference's CPU numpy loop does a full argsort per query; here the database is
HBM-resident bfloat16 and one fused matmul + top-k serves the whole query batch.

Measurement: this environment reaches the TPU through a tunnel with ~33 ms
per-call round-trip and an unreliable ``block_until_ready``, so the kernel is
iterated R times inside one jitted scan (data-dependent chaining defeats CSE)
for two values of R; the slope (t(R2) - t(R1)) / (R2 - R1) is the pure device
per-iteration time, with all fixed overheads cancelled.

Prints ONE JSON line. ``vs_baseline`` is the north-star target ratio (target:
< 2 ms p50 per query on TPU; BASELINE.json) -- values > 1 mean faster than
target. Measured on v5e: ~7.4 ms per 70-query batch = ~0.105 ms/query exact.
"""

import json
import time

import numpy as np


def _force(x):
    return np.asarray(x.ravel()[:1])


def main():
    import jax
    import jax.numpy as jnp

    from image_search_engine_for_historical_research_tpu.ops import exact_topk

    N, D, Q, K = 1_000_000, 2048, 70, 100
    key = jax.random.PRNGKey(0)
    kd, kq = jax.random.split(key)
    db = jax.random.normal(kd, (N, D), jnp.bfloat16)
    q0 = jax.random.normal(kq, (Q, D), jnp.float32)
    q0 = q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)

    def make_loop(R):
        @jax.jit
        def loop(q, db):
            def body(carry, _):
                s, i = exact_topk(
                    carry, db, K, metric="ip", matmul_dtype=jnp.bfloat16
                )
                return carry + (s[:, :1] + i[:, :1].astype(jnp.float32)) * 1e-12, None

            c, _ = jax.lax.scan(body, q, None, length=R)
            return c

        return loop

    timings = {}
    for R in (5, 50):
        loop = make_loop(R)
        _force(loop(q0, db))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(loop(q0, db))
            ts.append(time.perf_counter() - t0)
        timings[R] = min(ts)

    per_iter = (timings[50] - timings[5]) / 45.0
    per_query_ms = per_iter / Q * 1e3

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
