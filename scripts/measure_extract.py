"""Extraction throughput: ResNet101-SOLAR descriptors, f32 vs bf16.

The reference's dominant compute sink is 1M-distractor extraction
(extract_1m.py, bs=1 GPU loop: "days"). Measures img/s on the real chip at
the reference resolution (1024x768) for single-scale and the 3-scale
multiscale default, in f32 and with ``compute_dtype=bfloat16`` (the MXU
fast path added round 2). Scan-slope protocol per CLAUDE.md.

Usage: python scripts/measure_extract.py [--batch 4]
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


def main():
    import jax
    import jax.numpy as jnp

    from image_search_engine_for_historical_research_tpu.models import init_network
    from image_search_engine_for_historical_research_tpu.models.extract import (
        DEFAULT_SCALES, multiscale_descriptor, _cast_floats,
    )

    V5E_BF16_PEAK = 197e12

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--batches", type=lambda s: [int(x) for x in s.split(",")],
        default=[4],
        help="canvas-batch sweep (VERDICT r4 #9: 4 -> 16 with MFU per point)",
    )
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=1024)
    args = p.parse_args()

    model = init_network({"architecture": "resnet101"}, rng=jax.random.PRNGKey(0))

    for B in args.batches:
        images = jax.random.uniform(
            jax.random.PRNGKey(1), (B, args.height, args.width, 3), jnp.float32
        )
        for scales, sname in (((1.0,), "ss"), (DEFAULT_SCALES, "ms3")):
            for dtype, dname in ((None, "f32"), (jnp.bfloat16, "bf16")):
                # FLOPs of one extraction application (XLA cost analysis), for
                # the MFU column — the roofline lens VERDICT r4 #9 asks for
                def one_apply(variables, imgs, scales=scales, dtype=dtype):
                    if dtype is not None:
                        variables = _cast_floats(variables, dtype)
                    return multiscale_descriptor(
                        model.module, variables, imgs, scales=scales,
                        compute_dtype=dtype,
                    )

                try:
                    ca = jax.jit(one_apply).lower(
                        model.params, images
                    ).compile().cost_analysis()
                    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                    flops = float(ca.get("flops", 0.0))
                except Exception:
                    flops = float("nan")

                def make_loop(R, scales=scales, dtype=dtype):
                    @jax.jit
                    def loop(variables, imgs):
                        if dtype is not None:
                            variables = _cast_floats(variables, dtype)

                        def body(carry, _):
                            v = multiscale_descriptor(
                                model.module, variables, carry, scales=scales,
                                compute_dtype=dtype,
                            )
                            return carry + jnp.mean(v).astype(carry.dtype) * 1e-12, None

                        c, _ = jax.lax.scan(body, imgs, None, length=R)
                        return c

                    return loop

                times = {}
                for R in (2, 6):
                    loop = make_loop(R)
                    _force(loop(model.params, images))
                    times[R] = min(
                        _timed(lambda: _force(loop(model.params, images)))
                        for _ in range(3)
                    )
                per_iter = (times[6] - times[2]) / 4
                print(json.dumps({
                    "scales": sname, "dtype": dname, "batch": B,
                    "img_per_s": round(B / per_iter, 1),
                    "ms_per_img": round(per_iter / B * 1e3, 1),
                    "tflops_per_batch": round(flops / 1e12, 2),
                    "mfu_vs_bf16_peak": round(
                        flops / per_iter / V5E_BF16_PEAK, 3
                    ),
                }), flush=True)


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
