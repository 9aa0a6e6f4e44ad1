"""LoFTR training-step throughput on the real chip (train/loftr.py).

The reference vendors a Lightning+DDP harness it never invokes
(`/root/reference/src/utils/src/lightning/lightning_loftr.py`); our TPU
counterpart is one jitted homography-supervised step. This measures
sec/step, pairs/s and MFU (XLA cost-analysis FLOPs vs the v5e 197 TFLOP/s
bf16 peak) at the re-rank resolution.

Usage: python scripts/measure_loftr_train.py [--hw 480 640] [--batch 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12


def _force(x):
    return np.asarray(np.ravel(np.asarray(x))[:1])


def main():
    import jax
    import jax.numpy as jnp

    from image_search_engine_for_historical_research_tpu import train as T
    from image_search_engine_for_historical_research_tpu.models import loftr

    from dataclasses import replace

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    p.add_argument("--batches", type=lambda s: [int(x) for x in s.split(",")],
                   default=[4])
    p.add_argument("--reps", type=int, default=5)
    p.add_argument(
        "--variants", default="baseline,bf16,bf16+remat,bf16+remat+accum4",
        help="comma list of: baseline | bf16 | bf16+remat | "
        "bf16+remat+accumK (VERDICT r4 #6: the retrieval trainer's ladder "
        "applied to the LoFTR step)",
    )
    args = p.parse_args()
    H, W = args.hw

    m, variables = loftr.init_matcher(image_shape=(H, W))
    tx = T.make_loftr_optimizer()
    rng = np.random.RandomState(0)

    for B in args.batches:
        imgs = jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32))
        Hmats = jnp.stack([
            jnp.asarray(T.random_homography(rng, H, W, jitter=0.1))
            for _ in range(B)
        ])
        for variant in args.variants.split(","):
            accum = None
            if "accum" in variant:
                accum = int(variant.split("accum")[1])
                if B % accum:
                    continue
            mod = (
                m.clone(config=replace(m.config, remat=True))
                if "remat" in variant else m
            )
            cd = jnp.bfloat16 if "bf16" in variant else None
            state = T.init_loftr_train_state(variables, tx)
            step = T.make_loftr_train_step(
                mod, tx, compute_dtype=cd, accum=accum
            )

            lowered = step.lower(state, imgs, Hmats)
            compiled = lowered.compile()
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0)) if ca else 0.0

            state, loss = step(state, imgs, Hmats)
            _force(loss)
            best = np.inf
            for _ in range(args.reps):
                t0 = time.perf_counter()
                state, loss = step(state, imgs, Hmats)
                _force(loss)
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({
                "stage": "loftr_train_step", "hw": [H, W], "batch_pairs": B,
                "variant": variant,
                "sec_per_step": round(best, 4),
                "pairs_per_s": round(B / best, 2),
                "loss": round(float(loss), 4),
                "tflops_per_step": round(flops / 1e12, 2),
                "mfu_vs_bf16_peak": round(flops / best / V5E_BF16_PEAK, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
