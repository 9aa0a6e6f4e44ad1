"""TPU SIFT extraction throughput at the reference operating point.

The reference resizes to 1000x1000 and runs host OpenCV SIFT per image
(Reranking.py:657-667), ~50 ms/image single-threaded — days for a 1M-gallery
SAHA offline store. This measures ops.sift.sift_program (whole batch as one
jitted program) on the chip: scan-slope device time + end-to-end wall time
through the tunnel, plus a host cv2 baseline on the same images.

Usage: python scripts/measure_sift.py [--hw 1000 1000] [--batches 1 4 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(x):
    return np.asarray(np.ravel(np.asarray(x))[:1])


def main():
    import jax
    import jax.numpy as jnp

    from image_search_engine_for_historical_research_tpu.ops import sift

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--hw", type=int, nargs=2, default=[1000, 1000])
    p.add_argument("--batches", type=int, nargs="*", default=[1, 4, 8])
    p.add_argument("--max-kpts", type=int, default=1024)
    p.add_argument("--octaves", type=int, default=4)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    H, W = args.hw

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (H // 8, W // 8))
    # smooth texture (pure noise has keypoints at every pixel of octave 0 only)
    img = np.kron(base, np.ones((8, 8))).astype(np.float32)[:H, :W]
    from scipy import ndimage

    img = ndimage.gaussian_filter(img, 2.0).astype(np.float32)
    img = (img - img.min()) / (np.ptp(img) + 1e-9)

    budgets = sift.default_budgets(args.max_kpts, args.octaves)

    for B in args.batches:
        imgs = jnp.asarray(np.stack([img] * B))

        def make_loop(R):
            @jax.jit
            def loop(x):
                def body(c, _):
                    out = sift.sift_program(c, args.octaves, budgets)
                    anchor = (jnp.sum(out["desc"][:, :1, :1])
                              + jnp.sum(out["xy"][:, :1]))
                    return c + anchor.astype(c.dtype) * 1e-12, None

                c, _ = jax.lax.scan(body, x, None, length=R)
                return c

            return loop

        ts = {}
        for R in (1, 3):
            loop = make_loop(R)
            _force(loop(imgs))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                _force(loop(imgs))
                best = min(best, time.perf_counter() - t0)
            ts[R] = best
        per_iter = (ts[3] - ts[1]) / 2
        print(json.dumps({
            "stage": "tpu_sift", "B": B, "H": H, "W": W,
            "ms_per_image_device": round(per_iter / B * 1e3, 2),
            "img_per_s_device": round(B / per_iter, 1),
        }), flush=True)

    # host cv2 baseline (the reference's path)
    try:
        import cv2

        im8 = (img * 255).astype(np.uint8)
        s = cv2.SIFT_create(nfeatures=args.max_kpts)
        s.detectAndCompute(im8, None)  # warm
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            s.detectAndCompute(im8, None)
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "stage": "cv2_sift", "H": H, "W": W,
            "ms_per_image": round(dt * 1e3, 2),
        }), flush=True)
    except ImportError:
        pass


if __name__ == "__main__":
    main()
