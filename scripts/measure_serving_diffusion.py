"""Serving e2e with the diffusion re-rank mode at 1M: extract -> search ->
random-walk re-rank, one program.

Counterpart row to scripts/measure_serving.py's alphaQE pipeline, exercising
the round-3 serving mode (`serving.app SearchService(rerank="diffusion")`):
the index shortlist's top-3 seed the online diffusion combination against the
budgeted device-resident offline artifact (seed rows gathered + scatter-added
dense, then top-K). The reference never serves diffusion at all — its online
path is qge1-only (online.py:148) and its evaluation path refuses galleries
above 120k (Reranking.py:212).

The offline artifact is rebuilt in-run (~9 min at 1M — persisting a 3 GB
device artifact through the tunnel would take longer than rebuilding it).

Usage: python scripts/measure_serving_diffusion.py [--n 1000000]
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


def main():
    import jax
    import jax.numpy as jnp

    from synth_data import clustered_db

    from image_search_engine_for_historical_research_tpu.models import init_network
    from image_search_engine_for_historical_research_tpu.models.extract import (
        multiscale_descriptor,
    )
    from image_search_engine_for_historical_research_tpu.ops.topk import exact_topk
    from image_search_engine_for_historical_research_tpu.rerank.diffusion import (
        build_diffusion_offline,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--kd", type=int, default=50)
    p.add_argument("--budget-gb", type=float, default=3.0)
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=1024)
    args = p.parse_args()

    model = init_network({"architecture": "resnet101"}, rng=jax.random.PRNGKey(0))
    db = clustered_db(jax.random.PRNGKey(1), args.n, 2048, dtype=jnp.bfloat16)
    _force(db)
    image = jax.random.uniform(
        jax.random.PRNGKey(2), (1, args.height, args.width, 3), jnp.float32
    )

    t0 = time.time()
    off = build_diffusion_offline(
        db, kd=args.kd, batch=1024, allow_large=True,
        memory_budget_bytes=int(args.budget_gb * 2**30),
        host_out=False, score_dtype=np.float16, progress_every=256,
    )
    _force(off.scores)
    print(json.dumps({
        "stage": "offline", "N": args.n, "T": int(off.trunc_ids.shape[1]),
        "seconds": round(time.time() - t0, 1),
    }), flush=True)

    def serve(params, img, vecs, oi, os_):
        # mirrors serving.app SearchService.query_image(rerank="diffusion"):
        # extract -> index shortlist (top-10) -> top-3 seeds -> gathered
        # offline rows scatter-added dense -> top-K
        desc = multiscale_descriptor(model.module, params, img, scales=(1.0,))
        _, ranks0 = exact_topk(desc, vecs, 10, matmul_dtype=jnp.bfloat16)
        seeds = ranks0[0, :3]
        sims = (vecs[seeds] @ desc[0].astype(vecs.dtype)).astype(jnp.float32)
        w = jnp.clip(sims, min=0.0) ** 3
        rows_v = os_[seeds].astype(jnp.float32) * w[:, None]
        dense = jnp.zeros((vecs.shape[0],), jnp.float32)
        dense = dense.at[oi[seeds].ravel()].add(rows_v.ravel())
        _, top = jax.lax.top_k(dense[None, :], args.k)
        return top

    def make_loop(R):
        @jax.jit
        def loop(params, img, vecs, oi, os_):
            def body(carry, _):
                r = serve(params, carry, vecs, oi, os_)
                return carry + jnp.mean(r.astype(carry.dtype)) * 1e-12, None

            c, _ = jax.lax.scan(body, img, None, length=R)
            return c

        return loop

    times = {}
    for R in (1, 3):
        loop = make_loop(R)
        _force(loop(model.params, image, db, off.trunc_ids, off.scores))
        times[R] = min(
            _timed(lambda: _force(loop(model.params, image, db, off.trunc_ids, off.scores)))
            for _ in range(3)
        )
    per_query = (times[3] - times[1]) / 2
    print(json.dumps({
        "stage": "online_e2e_diffusion", "N": args.n, "scales": "ss",
        "ms_per_query": round(per_query * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
