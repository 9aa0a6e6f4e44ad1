"""End-to-end online-query latency: extract -> search -> alphaQE, one program.

The reference's serving path (online.py POST /) runs query extraction on GPU,
a matcher, then qge1 — three host-orchestrated stages. Here the whole online
protocol is ONE jitted program (offline/online kernel identity, SURVEY §7
north star): descriptor forward, exact top-k against the HBM-resident 1M
database, single-iteration alphaQE (k=3, the reference's >120k regime), and
the final full re-rank. Timed with the scan-slope protocol.

Usage: python scripts/measure_serving.py [--n 1000000]
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

    from image_search_engine_for_historical_research_tpu.models import init_network
    from image_search_engine_for_historical_research_tpu.models.extract import (
        DEFAULT_SCALES, multiscale_descriptor,
    )
    from image_search_engine_for_historical_research_tpu.ops.topk import exact_topk
    from image_search_engine_for_historical_research_tpu.rerank.qe import qge1

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=1024)
    args = p.parse_args()

    model = init_network({"architecture": "resnet101"}, rng=jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    db = jax.random.normal(key, (args.n, 2048), jnp.bfloat16)
    image = jax.random.uniform(
        jax.random.PRNGKey(2), (1, args.height, args.width, 3), jnp.float32
    )

    for scales, sname in (((1.0,), "ss"), (DEFAULT_SCALES, "ms3")):
        def serve(params, img, vecs, scales=scales):
            desc = multiscale_descriptor(model.module, params, img, scales=scales)
            _, ranks0 = exact_topk(desc, vecs, 10, matmul_dtype=jnp.bfloat16)
            # reference large-gallery regime: k=3, one iteration (:273-280);
            # out_k top-k instead of a full 1M argsort (serving returns top-K)
            return qge1(ranks0, desc, vecs, k=3, out_k=args.k)

        def make_loop(R):
            @jax.jit
            def loop(params, img, vecs):
                def body(carry, _):
                    r = serve(params, carry, vecs)
                    return carry + jnp.mean(r).astype(carry.dtype) * 1e-12, None

                c, _ = jax.lax.scan(body, img, None, length=R)
                return c

            return loop

        times = {}
        for R in (1, 3):
            loop = make_loop(R)
            _force(loop(model.params, image, db))
            times[R] = min(
                _timed(lambda: _force(loop(model.params, image, db)))
                for _ in range(3)
            )
        per_query = (times[3] - times[1]) / 2
        print(json.dumps({
            "stage": "online_e2e", "N": args.n, "scales": sname,
            "ms_per_query": round(per_query * 1e3, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
