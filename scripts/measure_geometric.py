"""Geometric re-ranker throughput on TPU: batched AdaLAM + batched LoFTR.

VERDICT r2 weak #6 asked for measured ms/query rows for the SAHA (AdaLAM)
and LoFTR re-rank paths. Both now dispatch pair BATCHES (one jitted vmapped
program) instead of one device call per pair; this script measures ms/pair
at realistic shapes across batch sizes.

- SAHA: K=1024 keypoints/image (MAX_KPTS), 128-d SIFT descriptors, full
  AdaLAM filter (128 RANSAC iters, refit) — the per-query cost is
  b=30 pairs (Reranking.py:37-116).
- LoFTR: reference-exact architecture at 480x640 grayscale (random weights —
  timing only), per-query cost is b=60 pairs (Reranking.py:126-185).

Usage: python scripts/measure_geometric.py [--skip-loftr]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_reps(fn, reps=3):
    """Median wall time of reps calls; forces completion via a tiny transfer
    (block_until_ready can return early through the tunnel — CLAUDE.md)."""
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        np.asarray(np.ravel(np.asarray(out))[:1])
        ts.append(time.time() - t0)
    return float(np.median(ts))


def synth_features(seed, n=900, imsize=1000.0, K=1024):
    from image_search_engine_for_historical_research_tpu.rerank.geometric import (
        LocalFeatures,
    )

    rng = np.random.default_rng(seed)
    k1 = rng.uniform(40, imsize - 40, (n, 2)).astype(np.float32)
    d = rng.standard_normal((n, 128)).astype(np.float32)
    f = LocalFeatures(
        xy=np.zeros((K, 2), np.float32),
        scale=np.ones((K,), np.float32),
        angle=np.zeros((K,), np.float32),
        desc=np.zeros((K, 128), np.float32),
        count=n, shape=(int(imsize), int(imsize)),
    )
    f.xy[:n] = k1
    f.desc[:n] = d / np.linalg.norm(d, axis=1, keepdims=True)
    f.scale[:n] = rng.uniform(2, 6, n)
    f.angle[:n] = rng.uniform(0, 2 * np.pi, n)
    return f


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--skip-loftr", action="store_true")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax

    from image_search_engine_for_historical_research_tpu.rerank.geometric import (
        adalam_count_pairs,
    )

    feats = [synth_features(s) for s in range(8)]
    for B in (8, 16, 32):
        fq = [feats[i % 8] for i in range(B)]
        fc = [feats[(i + 1) % 8] for i in range(B)]
        adalam_count_pairs(fq, fc, pair_batch=B)  # warmup/compile
        dt = _time_reps(lambda: adalam_count_pairs(fq, fc, pair_batch=B),
                        args.reps)
        print(json.dumps({
            "stage": "adalam", "pair_batch": B, "K": 1024,
            "ms_per_pair": round(dt / B * 1e3, 2),
            "ms_per_query_b30": round(dt / B * 1e3 * 30, 1),
        }), flush=True)

    # --- production SAHA path (VERDICT r3 #4): Q queries x b=30 candidate
    # pairs from a device bank, comparing the per-block host loop with the
    # one-dispatch scanned program (the Q x b re-rank as ONE device call)
    Q, b = 8, 30
    bank = [synth_features(s) for s in range(40)]
    fq, fc = [], []
    for qi in range(Q):
        for j in range(b):
            fq.append(bank[qi])
            fc.append(bank[(qi + j + 1) % len(bank)])
    for dispatch in ("loop", "scan"):
        adalam_count_pairs(fq, fc, pair_batch=8, dispatch=dispatch)  # compile
        dt = _time_reps(
            lambda: adalam_count_pairs(fq, fc, pair_batch=8, dispatch=dispatch),
            args.reps,
        )
        print(json.dumps({
            "stage": "adalam_production", "dispatch": dispatch,
            "Q": Q, "b": b, "pair_batch": 8,
            "s_per_query": round(dt / Q, 3),
            "ms_per_pair": round(dt / (Q * b) * 1e3, 2),
        }), flush=True)

    if args.skip_loftr:
        return

    from image_search_engine_for_historical_research_tpu.models import loftr

    m, variables = loftr.init_matcher(image_shape=(480, 640))
    count_fn = loftr.make_batched_count_fn(m, variables)
    rng = np.random.default_rng(0)
    for B in (1, 2, 4):
        i0 = rng.uniform(0, 1, (B, 480, 640, 1)).astype(np.float32)
        i1 = rng.uniform(0, 1, (B, 480, 640, 1)).astype(np.float32)
        count_fn(i0, i1)  # warmup/compile
        dt = _time_reps(lambda: count_fn(i0, i1), args.reps)
        print(json.dumps({
            "stage": "loftr", "pair_batch": B, "resolution": "480x640",
            "ms_per_pair": round(dt / B * 1e3, 2),
            "ms_per_query_b60": round(dt / B * 1e3 * 60, 1),
        }), flush=True)

    # banked one-dispatch LoFTR: 12 pairs from a 13-image bank as one scan
    import jax.numpy as jnp

    banked_fn = loftr.make_banked_count_fn(m, variables)
    P, B = 12, 4
    imgs = jnp.asarray(
        rng.uniform(0, 1, (P + 1, 480, 640, 1)).astype(np.float32)
    )
    iq = jnp.zeros((P // B, B), jnp.int32)
    ic = jnp.asarray(np.arange(1, P + 1, dtype=np.int32).reshape(P // B, B))
    banked_fn(imgs, iq, ic)  # warmup/compile
    dt = _time_reps(lambda: banked_fn(imgs, iq, ic), args.reps)
    counts_f32 = np.asarray(banked_fn(imgs, iq, ic)).ravel()
    print(json.dumps({
        "stage": "loftr_banked_scan", "pairs": P, "pair_batch": B,
        "ms_per_pair": round(dt / P * 1e3, 2),
        "s_per_query_b60": round(dt / P * 60, 2),
    }), flush=True)

    # bf16 fast path: params+activations cast, match counts compared vs f32
    banked_bf16 = loftr.make_banked_count_fn(
        m, variables, compute_dtype=jnp.bfloat16
    )
    banked_bf16(imgs, iq, ic)
    dt16 = _time_reps(lambda: banked_bf16(imgs, iq, ic), args.reps)
    counts_bf16 = np.asarray(banked_bf16(imgs, iq, ic)).ravel()
    denom = np.maximum(counts_f32, 1)
    print(json.dumps({
        "stage": "loftr_banked_scan_bf16", "pairs": P, "pair_batch": B,
        "ms_per_pair": round(dt16 / P * 1e3, 2),
        "s_per_query_b60": round(dt16 / P * 60, 2),
        "count_rel_err_vs_f32": round(
            float(np.mean(np.abs(counts_bf16 - counts_f32) / denom)), 4
        ),
    }), flush=True)


if __name__ == "__main__":
    main()
