"""IVF-PQ with refinement codes (IVFADC+R / faiss IndexIVFPQR) at 1M: recall + latency.

The reference's faiss ANN (knn.py:43-54) re-ranks by ADC alone; the refine
level adds refine_M bytes/vector of second-level codes so probed candidates
re-rank from exact two-level reconstructions — codes only, valid beyond-HBM
(the >= 10M regime this backend is kept for; BASELINE.md measures the
ADC-vs-IVF crossover there). This script measures what the refine level buys
at 1M where exact ground truth is computable on-chip.

Usage: python scripts/measure_ivfpqr.py --n 1000000
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

    from image_search_engine_for_historical_research_tpu.index.ivfpq import (
        build_ivfpq,
    )
    from image_search_engine_for_historical_research_tpu.ops.topk import exact_topk

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--q", type=int, default=70)
    p.add_argument("--nlist", type=int, default=4096)
    p.add_argument("--nprobe", type=int, default=64)
    p.add_argument("--m", type=int, default=16)
    p.add_argument("--refine-m", type=int, default=32)
    p.add_argument("--opq", action="store_true")
    args = p.parse_args()

    db = clustered_db(jax.random.PRNGKey(1), args.n, 2048)
    np.asarray(db[:1, :1])
    queries = db[: args.q]
    _, i_ex = exact_topk(queries, db, 100, matmul_dtype=jnp.bfloat16)
    i_ex = np.asarray(i_ex)

    t0 = time.time()
    ix = build_ivfpq(
        db, nlist=args.nlist, M=args.m, Ks=256, nprobe=args.nprobe,
        normalize=False, opq=args.opq, refine_M=args.refine_m,
    )
    build_s = time.time() - t0
    print(json.dumps({
        "stage": "build", "N": args.n, "nlist": args.nlist, "M": args.m,
        "refine_M": args.refine_m, "opq": bool(args.opq), "seg": ix.seg,
        "seconds": round(build_s, 1),
    }), flush=True)

    configs = [
        ("adc", {}),
        ("adc+refine", {}),
        ("adc+refine", {"expand": 8}),
        ("adc", {"nprobe": 128}),
        ("adc+refine", {"nprobe": 128}),
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
            len(set(i_ex[i, :100]) & set(ids[i, :100])) / 100
            for i in range(args.q)
        ]))
        print(json.dumps({
            "stage": "search", "method": method, "Q": args.q, **kw,
            "first_s": round(t1 - t0, 1),
            "ms_per_query": round((t2 - t1) / args.q * 1e3, 2),
            "recall10": round(r10, 3), "recall100": round(r100, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
