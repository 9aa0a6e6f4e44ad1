"""Diffusion offline build + online pass at the reference's regime boundary.

The reference runs graph diffusion only below its 120k regime switch
(Reranking.py:212: larger galleries get alphaQE only), so the honest
"at-scale" diffusion number is N=120k — the largest gallery the semantics
ever diffuse. Stages timed separately: Laplacian (self-kNN + mutual mask),
the batched truncated-CG sweep, and the online query pass.

Usage: python scripts/measure_diffusion.py --n 120000
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

    from image_search_engine_for_historical_research_tpu.rerank.diffusion import (
        build_diffusion_offline, diffusion_online_scores,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=120_000)
    p.add_argument("--d", type=int, default=2048)
    p.add_argument("--q", type=int, default=70)
    p.add_argument("--kd", type=int, default=50)
    p.add_argument("--trunc", type=int, default=2000)
    p.add_argument("--batch", type=int, default=None,
                   help="CG batch rows (default 256, 1024 beyond-regime)")
    p.add_argument("--budget-gb", type=float, default=3.0,
                   help="artifact memory budget for the beyond-regime path")
    p.add_argument("--host-artifact", action="store_true",
                   help="stream the artifact to host f16 instead of keeping "
                        "the budgeted (N, T) arrays in HBM")
    args = p.parse_args()

    large = args.n > 120_000
    batch = args.batch or (1024 if large else 256)
    # beyond-regime galleries must be bf16: an f32 1M x 2048 copy is half of
    # HBM before the bf16 working set and the (N, T) artifact even exist
    db = clustered_db(
        jax.random.PRNGKey(0), args.n, args.d,
        dtype=jnp.bfloat16 if large else None,
    )
    np.asarray(db[:1, :1])
    queries = db[: args.q]

    t0 = time.time()
    off = build_diffusion_offline(
        db, n_trunc=args.trunc, kd=args.kd, batch=batch,
        allow_large=large,
        memory_budget_bytes=int(args.budget_gb * 2**30) if large else None,
        host_out=(True if args.host_artifact else (False if large else None)),
        score_dtype=np.float16 if large else None,
        progress_every=64 if large else 0,
    )
    if not off.on_host:
        # dispatch is async through the tunnel: force the concatenated
        # artifact (one element forces the whole dependency chain)
        np.asarray(off.scores.ravel()[-1:])
    build_s = time.time() - t0
    print(json.dumps({
        "stage": "offline", "N": args.n, "kd": args.kd,
        "T": int(off.trunc_ids.shape[1]),
        "seconds": round(build_s, 1), "host_artifact": bool(off.on_host),
    }), flush=True)

    if off.on_host:
        from image_search_engine_for_historical_research_tpu.rerank.diffusion import (
            diffusion_online_scores_hosted,
        )

        def online():
            return diffusion_online_scores_hosted(off, db, queries, k_query=3)
    else:
        ids = jnp.asarray(off.trunc_ids)
        sc = jnp.asarray(off.scores)

        def online():
            return diffusion_online_scores(ids, sc, db, queries, k_query=3)

    t0 = time.time()
    np.asarray(online()[:1, :1])
    t1 = time.time()
    np.asarray(online()[:1, :1])
    t2 = time.time()
    print(json.dumps({
        "stage": "online", "Q": args.q,
        "first_s": round(t1 - t0, 2),
        "ms_per_query": round((t2 - t1) / args.q * 1e3, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
