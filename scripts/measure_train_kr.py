"""Training-step throughput and k-reciprocal re-rank latency on the chip.

- Train step: ResNet101-SOLAR contrastive step over (q, p, 5 negatives)
  tuples at the reference's training crop regime (362px = 1024//2.83 ~ the
  GL18 imsize//3 batched-mining scale), timed by scan-slope.
- kr re-rank: the reference's CVPR'17 k-reciprocal re-ranking at its memory
  envelope (the O(n^2) working-set guard caps it; measured at 20k gallery).

Usage: python scripts/measure_train_kr.py [--mode train|kr|both]
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
    return np.asarray(np.ravel(np.asarray(x))[:1])


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def measure_train(tuple_size=7, n_tuples=5, imsize=362):
    import jax
    import jax.numpy as jnp
    import optax

    from image_search_engine_for_historical_research_tpu.models import init_network
    from image_search_engine_for_historical_research_tpu.train.step import (
        init_train_state, make_train_step,
    )

    model = init_network({"architecture": "resnet101"}, rng=jax.random.PRNGKey(0))
    tx = optax.adam(1e-6)
    state = init_train_state(model.params, tx)
    B = tuple_size * n_tuples
    images = jax.random.uniform(
        jax.random.PRNGKey(1), (B, imsize, imsize, 3), jnp.float32
    )
    # label layout per tuple: -1 query, 1 positive, 0 negatives
    labels = jnp.tile(
        jnp.asarray([-1, 1] + [0] * (tuple_size - 2), jnp.int32), n_tuples
    )
    step = make_train_step(model.module, tx, S=tuple_size)

    def make_loop(R):
        @jax.jit
        def loop(state, images, labels):
            def body(carry, _):
                st, im = carry
                st, loss = step(st, im, labels)
                return (st, im + loss * 1e-12), None

            (st, im), _ = jax.lax.scan(body, (state, images), None, length=R)
            # returning only the step counter lets XLA DCE the whole
            # computation — anchor on updated params AND images
            leaf = jax.tree_util.tree_leaves(st.params)[0]
            return jnp.sum(leaf) + jnp.mean(im)

        return loop

    times = {}
    for R in (1, 3):
        loop = make_loop(R)
        _force(loop(state, images, labels))
        times[R] = min(
            _timed(lambda: _force(loop(state, images, labels))) for _ in range(3)
        )
    per_step = (times[3] - times[1]) / 2
    print(json.dumps({
        "stage": "train_step", "tuples": n_tuples, "tuple_size": tuple_size,
        "imsize": imsize, "sec_per_step": round(per_step, 3),
        "img_per_s": round(B / per_step, 1),
    }), flush=True)


def measure_kr(n=20000, q=70):
    import jax
    import jax.numpy as jnp

    from synth_data import clustered_db

    from image_search_engine_for_historical_research_tpu.rerank.kr import kr_rerank

    db = clustered_db(jax.random.PRNGKey(0), n, 2048, n_centers=2048)
    np.asarray(db[:1, :1])
    queries = db[:q]
    t0 = time.time()
    ranks = kr_rerank(queries, db)
    _force(ranks)
    t1 = time.time()
    ranks = kr_rerank(queries, db)
    _force(ranks)
    t2 = time.time()
    print(json.dumps({
        "stage": "kr_rerank", "N": n, "Q": q,
        "first_s": round(t1 - t0, 1),
        "ms_per_query": round((t2 - t1) / q * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["train", "kr", "both"], default="both")
    args = p.parse_args()
    if args.mode in ("train", "both"):
        measure_train()
    if args.mode in ("kr", "both"):
        measure_kr()
