"""Quick-ADC geometry on TPU: 4-bit subquantizers vs the classic 8-bit PQ.

Quick ADC (Andre et al., arXiv:1704.07355) speeds CPU PQ scanning by
shrinking codebooks to 16 entries so LUTs fit SIMD shuffle registers. The
TPU analogue is different but rhymes: the one-hot MXU ADC's FLOPs scale with
Ks, so at the SAME 128-bit code budget, M=32 x Ks=16 costs 8x fewer MXU
FLOPs per code than M=16 x Ks=256 — and the scalar-unit gather path is
avoided entirely at tiny Ks.

Stages:
  1. timing — full-scan ADC over N synthetic codes (value-independent),
     geometries (M=16, Ks=256), (M=32, Ks=16), (M=64, Ks=16).
  2. recall — fit both geometries on a 1M clustered gallery and measure
     ADC-shortlist recall vs the exact scan (the quantization-distortion
     price of 4-bit subquantizers at equal code bytes).

Usage: python scripts/measure_quick_adc.py [--n 10000000] [--recall-n 1000000]
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


def _slope(make_loop, args, rs=(1, 3), tries=3):
    ts = {}
    for R in rs:
        loop = make_loop(R)
        _force(loop(*args))
        best = np.inf
        for _ in range(tries):
            t0 = time.perf_counter()
            _force(loop(*args))
            best = min(best, time.perf_counter() - t0)
        ts[R] = best
    return (ts[rs[1]] - ts[rs[0]]) / (rs[1] - rs[0])


def main():
    import jax
    import jax.numpy as jnp

    from image_search_engine_for_historical_research_tpu.ops.pq import (
        PQCodebook, pq_encode, pq_pack4, pq_search, pq_train,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=10_000_000)
    p.add_argument("--recall-n", type=int, default=1_000_000)
    p.add_argument("--q", type=int, default=70)
    p.add_argument("--d", type=int, default=2048)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--skip-recall", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    Q, D, K = args.q, args.d, args.k

    # ---- stage 1: full-scan ADC timing on synthetic codes ------------------
    for M, Ks, packed in ((16, 256, False), (32, 16, False), (32, 16, True),
                          (64, 16, False)):
        ds = D // M
        codes = jax.random.randint(
            jax.random.PRNGKey(M), (args.n, M), 0, Ks, dtype=jnp.int32
        ).astype(jnp.uint8)
        if packed:
            codes = pq_pack4(codes)
        cb = PQCodebook(
            codewords=jnp.asarray(
                rng.standard_normal((M, Ks, ds)).astype(np.float32)
            )
        )
        qv = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))

        def make_loop(R, cb=cb, packed=packed):
            @jax.jit
            def loop(q, codes):
                def body(c, _):
                    s, i = pq_search(cb, codes, c, K, method="onehot",
                                     packed4=packed)
                    return c + (s[:, :1] + i[:, :1].astype(jnp.float32)) * 1e-12, None

                cc, _ = jax.lax.scan(body, q, None, length=R)
                return cc

            return loop

        per_iter = _slope(make_loop, (qv, codes))
        print(json.dumps({
            "stage": "adc_timing", "N": args.n, "M": M, "Ks": Ks,
            "packed4": packed,
            "bits_per_code": int(M * np.log2(Ks)),
            "code_bytes_resident": int(codes.shape[0] * codes.shape[1]),
            "ms_per_query": round(per_iter / Q * 1e3, 3),
        }), flush=True)
        del codes

    if args.skip_recall:
        return

    # ---- stage 2: recall at equal code budget on clustered data ------------
    from synth_data import clustered_db

    from image_search_engine_for_historical_research_tpu.ops.topk import (
        exact_topk,
    )

    db = clustered_db(jax.random.PRNGKey(1), args.recall_n, D,
                      dtype=jnp.bfloat16)
    qv = db[: Q].astype(jnp.float32)
    _, exact_ids = exact_topk(qv, db, K, matmul_dtype=jnp.bfloat16)
    exact_ids = np.asarray(exact_ids)

    for M, Ks in ((16, 256), (32, 16)):
        t0 = time.perf_counter()
        cb = pq_train(db, M=M, Ks=Ks, iters=20, train_sample=262144)
        codes = pq_encode(cb, db)
        fit_s = time.perf_counter() - t0
        s, ids = pq_search(cb, codes, qv, K, method="onehot")
        ids = np.asarray(ids)
        r10 = float(np.mean([
            len(set(exact_ids[i, :10]) & set(ids[i, :10])) / 10
            for i in range(Q)
        ]))
        r100 = float(np.mean([
            len(set(exact_ids[i]) & set(ids[i])) / K for i in range(Q)
        ]))
        print(json.dumps({
            "stage": "adc_recall", "N": args.recall_n, "M": M, "Ks": Ks,
            "fit_encode_s": round(fit_s, 1),
            "recall10": round(r10, 3), "recall100": round(r100, 3),
        }), flush=True)
        del codes


if __name__ == "__main__":
    main()
