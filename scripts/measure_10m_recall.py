"""The >= 10M beyond-HBM regime with MEASURED RECALL, not just timing.

Round 3 measured 10M-scale *timing* on synthetic codes (value-independent,
scripts/measure_10m.py); this script closes the recall gap: a 10M x 2048
clustered gallery (80 GB f32 — bigger than HBM and never materialized
anywhere) is regenerated deterministically chunk-by-chunk on device
(synth_data.clustered_db_chunks), ground truth comes from a streaming exact
bf16 top-k merge over the same chunks, and the IVF-PQ index is built with
the streaming ``build_ivfpq(chunks_fn, n=...)`` path. Search then runs
codes-only (`adc` / `adc+refine`) — the regime the reference keeps its faiss
ANN for (/root/reference/src/utils/knn.py:43-54, auto-chosen at N >= 110k,
diffusion.py:47) but can only reach through host RAM.

Usage: python scripts/measure_10m_recall.py [--n 10000000] [--opq]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from synth_data import clustered_db_chunks

    from image_search_engine_for_historical_research_tpu.index.ivfpq import (
        build_ivfpq,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=10_000_000)
    p.add_argument("--q", type=int, default=70)
    p.add_argument("--chunk", type=int, default=125_000)
    p.add_argument("--nlist", type=int, default=8192)
    p.add_argument("--nprobe", type=int, default=64)
    p.add_argument(
        "--nprobes", type=lambda s: [int(x) for x in s.split(",")],
        default=[64, 128],
        help="adc+refine nprobe sweep (one build, several searches) — "
        "separates probe-coverage misses (recall climbs with nprobe) from "
        "code-noise misses (recall saturates)",
    )
    p.add_argument(
        "--expands", type=lambda s: [int(x) for x in s.split(",")] if s
        else [], default=[],
        help="extra adc+refine sweeps at max(nprobes) varying the expand*k "
        "refine shortlist — separates ADC-ordering dropouts (recall climbs "
        "with expand) from probe-coverage misses",
    )
    p.add_argument("--m", type=int, default=16)
    p.add_argument("--refine-m", type=int, default=32)
    p.add_argument("--train-fraction", type=float, default=0.02)
    p.add_argument("--opq", action="store_true")
    p.add_argument(
        "--index", choices=["ivfpq", "hnswpq", "pq"], default="ivfpq",
        help="hnswpq = streaming build_hnsw_pq at the driver operating "
        "point (Ks=2^13, hybrid opq='refine') — the recommended codes-only "
        "route where dedup holds; pq = streaming build_pq(refine_M=...) "
        "(faiss IndexPQR): the FULL-COVERAGE codes-only route for the "
        "scale-matched 10M density where IVF probing is coverage-bound and "
        "PQ dedup collapses (round 5)",
    )
    p.add_argument("--ks", type=int, default=8192)
    p.add_argument(
        "--centers", type=int, default=0,
        help="synthetic cluster count; 0 = scale-matched to the 1M "
        "benchmark's density (n // 122 — the 1M BASELINE runs use 8192 "
        "centers = 122 points/center). A FIXED 8192 at 10M instead measures "
        "within-cluster tie-breaking among ~1220 near-duplicates per center "
        "— a duplication regime, reported separately in BASELINE.md",
    )
    args = p.parse_args()

    n_centers = args.centers or max(8192, args.n // 122)
    chunks_fn, n = clustered_db_chunks(
        jax.random.PRNGKey(1), args.n, 2048, chunk=args.chunk,
        n_centers=n_centers,
    )
    print(json.dumps({"stage": "setup", "n": n, "chunk": args.chunk,
                      "n_centers": n_centers}), flush=True)

    # queries: rows of the first chunk (same protocol as measure_ivfpqr.py)
    first = next(chunks_fn())
    queries = first[: args.q]
    del first

    # streaming exact ground truth: per-chunk f32 scores + running merge
    # (f32, not the bench bf16 scan: clustered points are near-ties and the
    # recall denominator should not inherit bf16 rounding noise)
    @jax.jit
    def merge_chunk(best_s, best_i, chunk, base):
        s = jnp.einsum(
            "qd,nd->qn", queries, chunk,
            preferred_element_type=jnp.float32,
        )
        top_s, top_j = jax.lax.top_k(s, 100)
        cand_s = jnp.concatenate([best_s, top_s], axis=1)
        cand_i = jnp.concatenate([best_i, top_j + base], axis=1)
        top_s, sel = jax.lax.top_k(cand_s, 100)
        return top_s, jnp.take_along_axis(cand_i, sel, axis=1)

    t0 = time.time()
    best_s = jnp.full((args.q, 100), -jnp.inf, jnp.float32)
    best_i = jnp.full((args.q, 100), -1, jnp.int32)
    base = 0
    for chunk in chunks_fn():
        best_s, best_i = merge_chunk(best_s, best_i, chunk, base)
        base += chunk.shape[0]
    i_ex = np.asarray(best_i)
    print(json.dumps({
        "stage": "ground_truth", "seconds": round(time.time() - t0, 1),
    }), flush=True)

    t0 = time.time()
    if args.index == "pq":
        from image_search_engine_for_historical_research_tpu.index.pq import (
            build_pq,
        )

        ix = build_pq(
            chunks_fn, n=n, M=args.m, Ks=args.ks, normalize=False,
            refine_M=args.refine_m, opq=bool(args.opq),
        )
        build_s = time.time() - t0
        code_bytes = (
            int(np.asarray(ix.codes).nbytes)
            + (int(np.asarray(ix.refine_codes).nbytes)
               if ix.refine_codes is not None else 0)
        )
        print(json.dumps({
            "stage": "build", "index": "pq", "N": n, "Ks": args.ks,
            "M": args.m, "refine_M": args.refine_m, "opq": bool(args.opq),
            "index_mb": round(code_bytes / 2**20, 1),
            "seconds": round(build_s, 1),
        }), flush=True)
        sweeps = [("adc", {}), ("adc+refine", {}),
                  ("adc+refine", {"expand": 8})]
    elif args.index == "hnswpq":
        from image_search_engine_for_historical_research_tpu.index.hnsw import (
            build_hnsw_pq,
        )

        ix = build_hnsw_pq(
            chunks_fn, n=n, M=args.m, Ks=args.ks, m=16, normalize=False,
            refine_M=args.refine_m, opq=(True if args.opq else "refine"),
        )
        build_s = time.time() - t0
        code_bytes = (
            int(np.asarray(ix.unique_codes).nbytes)
            + int(np.asarray(ix.group_members).nbytes)
            + int(np.asarray(ix.nbr0).nbytes)
            + (int(np.asarray(ix.refine_codes).nbytes)
               if ix.refine_codes is not None else 0)
        )
        print(json.dumps({
            "stage": "build", "index": "hnswpq", "N": n, "Ks": args.ks,
            "M": args.m, "refine_M": args.refine_m,
            "opq": "full" if args.opq else "refine",
            "unique_codes": int(ix.unique_codes.shape[0]),
            "index_mb": round(code_bytes / 2**20, 1),
            "seconds": round(build_s, 1),
        }), flush=True)
        sweeps = [("adc", {}), ("adc+refine", {}),
                  ("adc+refine", {"expand": 8}),
                  # the designated > HBM-codes route, at the centroid-walk
                  # operating points (VERDICT r4 #1/#7)
                  ("graph+refine", {"ef": 128, "n_seeds": 16, "expand": 8}),
                  ("graph+refine", {"ef": 200, "n_seeds": 16, "expand": 8})]
    else:
        ix = build_ivfpq(
            chunks_fn, n=n, nlist=args.nlist, M=args.m, Ks=256,
            nprobe=args.nprobe, normalize=False, opq=args.opq,
            refine_M=args.refine_m, train_fraction=args.train_fraction,
        )
        build_s = time.time() - t0
        code_bytes = (
            int(np.asarray(ix.flat_codes).nbytes)
            + int(np.asarray(ix.flat_ids).nbytes)
            + (int(np.asarray(ix.flat_refine).nbytes)
               if ix.flat_refine is not None else 0)
            + (int(np.asarray(ix.flat_list).nbytes)
               if ix.flat_list is not None else 0)
        )
        print(json.dumps({
            "stage": "build", "N": n, "nlist": args.nlist, "M": args.m,
            "refine_M": args.refine_m, "opq": bool(args.opq), "seg": ix.seg,
            "virtual_lists": int(ix.coarse_centers.shape[0]),
            "index_mb": round(code_bytes / 2**20, 1),
            "seconds": round(build_s, 1),
        }), flush=True)
        sweeps = [("adc", {})] + [
            ("adc+refine", {"nprobe": p}) for p in args.nprobes
        ] + [
            ("adc+refine", {"nprobe": max(args.nprobes), "expand": e})
            for e in args.expands
        ]

    for method, kw in sweeps:
        t0 = time.time()
        _, ids = ix.search(queries, 100, method=method, **kw)
        ids = np.asarray(ids)
        t1 = time.time()
        _, ids2 = ix.search(queries, 100, method=method, **kw)
        np.asarray(ids2)
        t2 = time.time()
        r10 = float(np.mean([
            len(set(i_ex[i, :10]) & set(ids[i, :10])) / 10
            for i in range(args.q)
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
