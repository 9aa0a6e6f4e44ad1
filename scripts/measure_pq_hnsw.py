"""PQ_HNSW at the reference driver config, 1M scale: build + search + recall.

offline.py:116 runs matching_HNSW_NanoPQ with N_books=16, N_words=2**13,
m=16, ef=100. At Ks=2^13 nearly every row is a unique code, so the graph
covers ~N nodes; the TPU graph builder replaces the single-thread C++ insert
(hours at 1M). Reports build stage times, per-query search latency through
the public index search (includes the host-side group expansion), and
shortlist recall vs the exact scan.

Usage: python scripts/measure_pq_hnsw.py --n 1000000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from synth_data import clustered_db

    from image_search_engine_for_historical_research_tpu.index.hnsw import (
        build_hnsw_pq,
    )
    from image_search_engine_for_historical_research_tpu.ops.topk import exact_topk

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--q", type=int, default=70)
    p.add_argument("--ks", type=int, default=2 ** 13)
    p.add_argument("--refine-m", type=int, default=16)
    p.add_argument("--opq", action="store_true",
                   help="learned orthogonal pre-rotation (OPQ) for both levels")
    p.add_argument("--opq-refine", action="store_true",
                   help="OPQ on the residual level only (coarse keeps dedup)")
    p.add_argument("--refine-only", action="store_true",
                   help="skip the non-refine methods (faster sweeps)")
    p.add_argument("--graph-sweep", action="store_true",
                   help="sweep ef/n_seeds/expand on graph+refine only")
    p.add_argument("--graph-k-candidates", type=int, default=96,
                   help="kNN candidate pool for the unique-code graph build "
                   "(VERDICT r4 #7 sweep)")
    p.add_argument("--graph-alpha", type=float, default=1.2,
                   help="neighbor-prune diversity relaxation")
    p.add_argument("--m0", type=int, default=None,
                   help="base-layer degree (default 2*m)")
    args = p.parse_args()

    db = clustered_db(jax.random.PRNGKey(1), args.n, 2048)
    np.asarray(db[:1, :1])
    queries = db[: args.q]  # fresh buffer (jnp slicing copies)
    _, i_ex = exact_topk(queries, db, 100, matmul_dtype=jnp.bfloat16)
    i_ex = np.asarray(i_ex)

    # donate the gallery to the builder (one-element list): it frees the
    # 8 GB buffer before the graph stage — the OPQ path OOMs otherwise.
    # clustered_db is deterministic, so the rerank config regenerates it.
    opq = "refine" if args.opq_refine else bool(args.opq)
    holder = [db]
    del db
    t0 = time.time()
    ix = build_hnsw_pq(
        holder, M=16, Ks=args.ks, m=16, m0=args.m0, normalize=False,
        refine_M=args.refine_m, opq=opq,
        graph_k_candidates=args.graph_k_candidates,
        graph_alpha=args.graph_alpha,
    )
    del holder
    build_s = time.time() - t0
    db = clustered_db(jax.random.PRNGKey(1), args.n, 2048)
    np.asarray(db[:1, :1])
    print(json.dumps({
        "stage": "build", "N": args.n, "Ks": args.ks,
        "refine_M": args.refine_m, "opq": opq,
        "graph_k_candidates": args.graph_k_candidates,
        "graph_alpha": args.graph_alpha, "m0": args.m0 or 32,
        "unique_codes": int(ix.unique_codes.shape[0]),
        "seconds": round(build_s, 1),
    }), flush=True)

    configs = [
        ("adc", {}),
        ("adc+rerank", {"vectors": db}),
        ("adc+refine", {}),
        ("adc+refine", {"expand": 8}),
        ("graph", {}),
        ("graph+refine", {"ef": 128, "n_seeds": 8}),
        ("graph+refine", {"ef": 200, "n_seeds": 16, "expand": 8}),
    ]
    if args.refine_only:
        configs = [c for c in configs if "refine" in c[0]]
    if args.graph_sweep:
        # round 5: centroid-ADC walk operating points (low ef — the point of
        # the centroid distance), plus coarse-walk rows for the before/after
        configs = [
            ("graph+refine", {"ef": 100, "n_seeds": 8, "expand": 8}),
            ("graph+refine", {"ef": 128, "n_seeds": 8, "expand": 8}),
            ("graph+refine", {"ef": 128, "n_seeds": 16, "expand": 8}),
            ("graph+refine", {"ef": 160, "n_seeds": 16, "expand": 8}),
            ("graph+refine", {"ef": 200, "n_seeds": 16, "expand": 8}),
            ("graph+refine", {"ef": 320, "n_seeds": 32, "expand": 8}),
            ("graph+refine",
             {"ef": 200, "n_seeds": 16, "expand": 8, "centroid_walk": False}),
            ("graph+refine",
             {"ef": 320, "n_seeds": 32, "expand": 8, "centroid_walk": False}),
        ]
    for method, kw in configs:
        t0 = time.time()
        s, ids = ix.search(queries, 100, method=method, **kw)
        ids = np.asarray(ids)
        t1 = time.time()
        s, ids2 = ix.search(queries, 100, method=method, **kw)
        np.asarray(ids2)
        t2 = time.time()
        r10 = float(np.mean([
            len(set(i_ex[i, :10]) & set(ids[i, :10])) / 10 for i in range(args.q)
        ]))
        r100 = float(np.mean([
            len(set(i_ex[i, :100]) & set(ids[i, :100])) / 100 for i in range(args.q)
        ]))
        print(json.dumps({
            "stage": "search", "method": method, "Q": args.q,
            **{k: v for k, v in kw.items() if k != "vectors"},
            "first_s": round(t1 - t0, 1),
            "ms_per_query": round((t2 - t1) / args.q * 1e3, 2),
            "recall10": round(r10, 3), "recall100": round(r100, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
