"""RP-forest recall-vs-memory curve vs the Annoy reference config.

VERDICT round 1: "RP-forest recall parity unproven at matched memory" — the
reference runs Annoy with 100 trees (offline.py:112, nnsearch.py:1041); our
balanced forest's recall is governed by n_trees x leaf_size. This measures
recall@10/@100 against the exact scan plus the index's memory footprint
across tree counts so the BASELINE table can state recall at matched memory.

Usage: python scripts/measure_rpforest.py --n 100000 --trees 8 16 32 64
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

    from image_search_engine_for_historical_research_tpu.index.rpforest import (
        build_rpforest,
    )
    from image_search_engine_for_historical_research_tpu.ops.topk import exact_topk

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--d", type=int, default=2048)
    p.add_argument("--q", type=int, default=70)
    p.add_argument("--trees", type=int, nargs="*", default=[8, 16, 32, 64])
    p.add_argument("--leaf", type=int, default=128)
    args = p.parse_args()

    db = clustered_db(jax.random.PRNGKey(0), args.n, args.d)
    np.asarray(db[:1, :1])
    queries = db[: args.q]
    _, i_ex = exact_topk(queries, db, 100, matmul_dtype=jnp.bfloat16)
    i_ex = np.asarray(i_ex)

    for t in args.trees:
        t0 = time.time()
        ix = build_rpforest(db, n_trees=t, leaf_size=args.leaf, normalize=False)
        build_s = time.time() - t0
        _, ids = ix.search(queries, 100)
        ids = np.asarray(ids)
        t1 = time.time()
        _, ids2 = ix.search(queries, 100)
        np.asarray(ids2)
        search_ms = (time.time() - t1) / args.q * 1e3
        r10 = float(np.mean([
            len(set(i_ex[i, :10]) & set(ids[i, :10])) / 10
            for i in range(args.q)
        ]))
        r100 = float(np.mean([
            len(set(i_ex[i, :100]) & set(ids[i, :100])) / 100
            for i in range(args.q)
        ]))
        # .nbytes on the device arrays — np.asarray would pull hundreds of
        # MB through the MB/s tunnel
        mem = ix.planes.nbytes + ix.thresholds.nbytes + ix.leaf_items.nbytes
        print(json.dumps({
            "N": args.n, "trees": t, "leaf": args.leaf,
            "build_s": round(build_s, 1),
            "search_ms_per_query": round(search_ms, 2),
            "recall10": round(r10, 3), "recall100": round(r100, 3),
            "index_mb": round(mem / 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
