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


V5E_BF16_PEAK = 197e12  # TPU v5e peak bf16 FLOP/s (MFU denominator)


def measure_train(tuple_size=7, n_tuples=5, imsize=362, variants=None):
    """Step time / img/s / MFU per throughput variant (VERDICT r3 #2+#6).

    ``baseline`` reproduces round 3 (optimizer mask only — the backward runs
    through conv1-4); ``frozen`` adds the stop_gradient boundary (the
    reference's no_grad, networks.py:194-198); ``+bf16`` runs the backbone in
    bfloat16 with the f32 head; ``+remat`` rematerializes bottlenecks;
    ``big`` doubles the tuple batch under bf16+remat. MFU is
    cost-analysis FLOPs / step time / v5e bf16 peak.
    """
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
    all_variants = {
        "baseline": (dict(), 1),
        "frozen": (dict(frozen_stages=3), 1),
        "frozen+bf16": (dict(frozen_stages=3, compute_dtype=jnp.bfloat16), 1),
        "frozen+bf16+remat": (
            dict(frozen_stages=3, compute_dtype=jnp.bfloat16, remat=True), 1),
        "frozen+bf16+remat_x2batch": (
            dict(frozen_stages=3, compute_dtype=jnp.bfloat16, remat=True), 2),
    }
    for name in variants or all_variants:
        overrides, bmul = all_variants[name]
        nt = n_tuples * bmul
        B = tuple_size * nt
        images = jax.random.uniform(
            jax.random.PRNGKey(1), (B, imsize, imsize, 3), jnp.float32
        )
        labels = jnp.tile(
            jnp.asarray([-1, 1] + [0] * (tuple_size - 2), jnp.int32), nt
        )
        module = model.module.clone(**overrides) if overrides else model.module
        step = make_train_step(module, tx, S=tuple_size)
        try:
            flops = jax.jit(step).lower(
                state, images, labels
            ).compile().cost_analysis()["flops"]
        except Exception:
            flops = float("nan")

        def make_loop(R):
            @jax.jit
            def loop(state, images, labels):
                def body(carry, _):
                    st, im = carry
                    st, loss = step(st, im, labels)
                    return (st, im + loss * 1e-12), None

                (st, im), _ = jax.lax.scan(body, (state, images), None, length=R)
                leaf = jax.tree_util.tree_leaves(st.params)[0]
                return jnp.sum(leaf) + jnp.mean(im)

            return loop

        times = {}
        for R in (1, 3):
            loop = make_loop(R)
            _force(loop(state, images, labels))
            times[R] = min(
                _timed(lambda: _force(loop(state, images, labels)))
                for _ in range(3)
            )
        per_step = (times[3] - times[1]) / 2
        print(json.dumps({
            "stage": "train_step", "variant": name, "tuples": nt,
            "tuple_size": tuple_size, "imsize": imsize,
            "sec_per_step": round(per_step, 3),
            "img_per_s": round(B / per_step, 1),
            "tflops_per_step": round(flops / 1e12, 2),
            "mfu_vs_bf16_peak": round(flops / per_step / V5E_BF16_PEAK, 3),
        }), flush=True)


def measure_kr(sizes=(13000, 100000), q=70):
    """kr re-rank latency: the old dense envelope (13k) and the chunked
    >=100k envelope (VERDICT r3 #5; no O(n^2) buffer)."""
    import jax

    from synth_data import clustered_db

    from image_search_engine_for_historical_research_tpu.rerank.kr import kr_rerank

    for n in sizes:
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
        chunked = 24 * (n + q) ** 2 > (8 << 30)
        print(json.dumps({
            "stage": "kr_rerank", "N": n, "Q": q,
            "method": "chunked" if chunked else "dense",
            "first_s": round(t1 - t0, 1),
            "ms_per_query": round((t2 - t1) / q * 1e3, 2),
        }), flush=True)
        if chunked:
            # bf16 distance passes: rank agreement vs the f32 run + speed
            import jax.numpy as jnp

            rf = np.asarray(ranks)[:, :100]
            t0 = time.time()
            ranks = kr_rerank(queries, db, matmul_dtype=jnp.bfloat16)
            _force(ranks)
            t1 = time.time()
            ranks = kr_rerank(queries, db, matmul_dtype=jnp.bfloat16)
            _force(ranks)
            t2 = time.time()
            rb = np.asarray(ranks)[:, :100]
            overlap = float(np.mean([
                len(set(rf[i]) & set(rb[i])) / 100 for i in range(q)
            ]))
            print(json.dumps({
                "stage": "kr_rerank", "N": n, "Q": q, "method": "chunked_bf16",
                "first_s": round(t1 - t0, 1),
                "ms_per_query": round((t2 - t1) / q * 1e3, 2),
                "top100_overlap_vs_f32": round(overlap, 4),
            }), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["train", "kr", "both"], default="both")
    args = p.parse_args()
    if args.mode in ("train", "both"):
        measure_train()
    if args.mode in ("kr", "both"):
        measure_kr()
