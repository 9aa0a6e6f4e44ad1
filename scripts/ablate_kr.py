"""Stage-by-stage device cost of the chunked k-reciprocal re-rank at 100k.

VERDICT r4 #4: "make it fast or prove it algorithmically bound." The chunked
program (`rerank/kr.py:_kr_chunked_program`) runs five stages — distance
passes (colmax + top-(k1+1)), reciprocity tests, set expansion + V weights,
the dense query-side scatter, and the query-expanded Jaccard scan. Each
`--stage` early-out returns a rank matrix that depends on every prior stage
(DCE-blocked), so differencing consecutive stages isolates each stage's
device cost on the real chip.

Usage: python scripts/ablate_kr.py [--n 100000]
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


def _force(x):
    return np.asarray(np.ravel(np.asarray(x))[:1])


def main():
    import jax

    from synth_data import clustered_db

    from image_search_engine_for_historical_research_tpu.rerank.kr import (
        kr_rerank_chunked,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--q", type=int, default=70)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    db = clustered_db(jax.random.PRNGKey(0), args.n, 2048, n_centers=2048)
    _force(db)
    queries = db[: args.q]

    prev = 0.0
    for stage in ("dist", "recip", "expand", "vq", "full",
                  "jacc_nosort", "jacc_nogather"):
        r = kr_rerank_chunked(queries, db, stage=stage)
        _force(r)  # compile + first run
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = kr_rerank_chunked(queries, db, stage=stage)
            _force(r)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "stage": stage, "N": args.n, "Q": args.q,
            "total_s": round(best, 2),
            "stage_s": round(best - prev, 2),
            "ms_per_query_cum": round(best / args.q * 1e3, 2),
        }), flush=True)
        prev = best


if __name__ == "__main__":
    main()
