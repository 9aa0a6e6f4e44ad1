"""Hardware measurement: Pallas beam-search kernel vs exact scan.

Produces the crossover study VERDICT round 1 asked for: at what database
size / batch size does graph traversal beat the MXU exact scan? Timed with
the in-scan slope protocol (CLAUDE.md tunnel caveats). Recall is checked
against the exact scan at ef=100, k=10/100.

Usage: python scripts/measure_pallas.py --n 100000 [--q 70 1]
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


def _slope(make_loop, args, rs=(2, 6), tries=3):
    times = {}
    for R in rs:
        loop = make_loop(R)
        _force(loop(*args))
        times[R] = min(_timed(lambda: _force(loop(*args))) for _ in range(tries))
    return (times[rs[1]] - times[rs[0]]) / (rs[1] - rs[0])


def main():
    import jax
    import jax.numpy as jnp

    from image_search_engine_for_historical_research_tpu.index.graph_build import (
        build_hnsw_tpu,
    )
    from image_search_engine_for_historical_research_tpu.ops.topk import exact_topk

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--d", type=int, default=2048)
    p.add_argument("--q", type=int, nargs="*", default=[70, 1])
    p.add_argument("--ef", type=int, default=100)
    p.add_argument("--skip-exact", action="store_true",
                   help="skip the exact-scan timing comparison (each jit "
                        "variant costs ~35 s of tunnel compile)")
    p.add_argument("--k-candidates", type=int, default=64,
                   help="builder kNN candidate count (graph quality knob)")
    args = p.parse_args()

    from synth_data import clustered_db

    key = jax.random.PRNGKey(0)
    kd, kq = jax.random.split(key)
    db = clustered_db(kd, args.n, args.d, dtype=jnp.bfloat16)
    _force(db)

    t0 = time.perf_counter()
    ix = build_hnsw_tpu(
        db, m=16, normalize=False, k_candidates=args.k_candidates
    )
    build_s = time.perf_counter() - t0
    print(json.dumps({"stage": "build", "N": args.n, "seconds": round(build_s, 1)}),
          flush=True)

    qmax = max(args.q)
    queries = db[:qmax].astype(jnp.float32)

    s_ex, i_ex = exact_topk(queries, ix.vectors, 100, matmul_dtype=jnp.bfloat16)
    i_ex = np.asarray(i_ex)

    from image_search_engine_for_historical_research_tpu.index.base import (
        normalize_rows,
    )
    from image_search_engine_for_historical_research_tpu.ops.pallas_graph import (
        pallas_beam_search,
    )

    # CRITICAL: vectors/nbr0/coarse_ids are jit ARGUMENTS, not closures — a
    # closed-over device array is embedded in the serialized module and the
    # tunnel's remote compile uploads it (400 MB at 100k: the HTTP 413 /
    # multi-minute "compiles" round 1 hit)
    def one_search(qq, vectors, nbr0, coarse):
        qn = normalize_rows(qq)
        cvecs = vectors[coarse].astype(qn.dtype)
        _, top = jax.lax.top_k(qn @ cvecs.T, 1)
        starts = coarse[top[:, 0]]
        return pallas_beam_search(vectors, nbr0, qn, starts, ef=args.ef)

    ix_args = (ix.vectors, ix.nbr0, ix.coarse_ids)

    for Q in args.q:
        qv = queries[:Q]

        # recall (one un-timed call; jitted — each eager op pays ~33 ms of
        # tunnel RTT, which dominates and corrupts naive timing entirely)
        _, ids = jax.jit(one_search)(qv, *ix_args)
        ids = np.asarray(ids)
        r10 = float(np.mean([
            len(set(i_ex[i, :10]) & set(ids[i, :10])) / 10 for i in range(Q)
        ]))
        r100 = float(np.mean([
            len(set(i_ex[i, :100]) & set(ids[i, :100])) / 100 for i in range(Q)
        ]))

        def make_loop(R, Q=Q):
            @jax.jit
            def loop(q, vectors, nbr0, coarse):
                def body(carry, _):
                    s, i = one_search(carry, vectors, nbr0, coarse)
                    return carry + (
                        s[:, :1] + i[:, :1].astype(jnp.float32)
                    ) * 1e-12, None

                c, _ = jax.lax.scan(body, q, None, length=R)
                return c

            return loop

        per_iter = _slope(make_loop, (qv, *ix_args))
        row = {
            "stage": "search", "N": args.n, "Q": Q, "ef": args.ef,
            "pallas_ms_per_query": round(per_iter / Q * 1e3, 3),
            "recall10": round(r10, 3), "recall100": round(r100, 3),
        }

        if not args.skip_exact:
            def make_exact(R, Q=Q):
                @jax.jit
                def loop(q, vectors):
                    def body(carry, _):
                        s, i = exact_topk(
                            carry, vectors, 100, matmul_dtype=jnp.bfloat16
                        )
                        return carry + (
                            s[:, :1] + i[:, :1].astype(jnp.float32)
                        ) * 1e-12, None

                    c, _ = jax.lax.scan(body, q, None, length=R)
                    return c

                return loop

            exact_iter = _slope(make_exact, (qv, ix.vectors))
            row["exact_ms_per_query"] = round(exact_iter / Q * 1e3, 3)

        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
