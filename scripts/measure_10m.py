"""Beyond-HBM regime at 10M: full-scan ADC vs IVF-PQ probing, measured.

VERDICT r2 weak #2: the ">= 10M" regime table was asserted from traffic
arithmetic, not measured. The raw 10M x 2048 vectors (80 GB) cannot exist on
one chip, but the compressed domain can: 10M PQ codes are 160 MB (Ks=256) /
320 MB (Ks=2^13). Codes are synthesized (timing is value-independent: the
gather/one-hot/top-k costs depend only on shapes), coarse structure balanced.

Measures, batch 70 queries at D=2048:
- full-scan ADC over 10M codes, Ks=256 (one-hot MXU path) and Ks=2^13
  (row-gather path) — the `method="auto"` operating points;
- IVF-PQ probing (nlist=4096, nprobe=64, balanced lists) over the same codes.

Usage: python scripts/measure_10m.py [--n 10000000]
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
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        np.asarray(np.ravel(np.asarray(out[0]))[:1])
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from image_search_engine_for_historical_research_tpu.index.ivfpq import (
        IVFPQIndex,
    )
    from image_search_engine_for_historical_research_tpu.ops.pq import (
        PQCodebook,
        pq_search,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=10_000_000)
    p.add_argument("--q", type=int, default=70)
    p.add_argument("--m", type=int, default=16)
    p.add_argument("--d", type=int, default=2048)
    args = p.parse_args()
    N, M, D, Q = args.n, args.m, args.d, args.q
    ds = D // M
    rng = np.random.default_rng(0)
    queries = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))

    # ---- full-scan ADC at both codebook sizes
    for Ks, dtype in ((256, np.uint8), (8192, np.uint16)):
        key = jax.random.PRNGKey(Ks)
        codes = jax.random.randint(key, (N, M), 0, Ks, dtype=jnp.int32).astype(
            jnp.uint8 if Ks <= 256 else jnp.uint16
        )
        cb = PQCodebook(jnp.asarray(
            rng.standard_normal((M, Ks, ds)).astype(np.float32)
        ))
        pq_search(cb, codes, queries, 100)  # warmup/compile
        dt = _time_reps(lambda: pq_search(cb, codes, queries, 100))
        print(json.dumps({
            "stage": "adc_full_scan", "N": N, "Ks": Ks,
            "ms_per_query": round(dt / Q * 1e3, 2),
            "codes_mb": round(codes.size * codes.dtype.itemsize / 2**20),
        }), flush=True)
        del codes, cb

    # ---- IVF-PQ probing (balanced synthetic lists)
    nlist, nprobe, Ks = 4096, 64, 256
    L = N // nlist
    seg = 1 << int(np.ceil(np.log2(L)))
    coarse = jnp.asarray(rng.standard_normal((nlist, D)).astype(np.float32))
    flat_codes = jax.random.randint(
        jax.random.PRNGKey(1), (nlist * seg, M), 0, Ks, dtype=jnp.int32
    ).astype(jnp.uint8)
    ids = np.full((nlist, seg), -1, np.int32)
    ids[:, :L] = np.arange(nlist * L, dtype=np.int32).reshape(nlist, L)
    ix = IVFPQIndex(
        coarse_centers=coarse,
        codewords=jnp.asarray(rng.standard_normal((M, Ks, ds)).astype(np.float32)),
        flat_codes=flat_codes,
        flat_ids=jnp.asarray(ids.reshape(-1)),
        offsets=jnp.arange(nlist, dtype=jnp.int32) * seg,
        lens=jnp.full((nlist,), L, jnp.int32),
        seg=seg, nprobe=nprobe, normalized=False,
    )
    ix.search(queries, 100)  # warmup/compile
    dt = _time_reps(lambda: ix.search(queries, 100))
    print(json.dumps({
        "stage": "ivfpq_probe", "N": N, "nlist": nlist, "nprobe": nprobe,
        "seg": seg, "ms_per_query": round(dt / Q * 1e3, 2),
        "scanned_fraction": round(nprobe * L / N, 4),
    }), flush=True)

    # ---- IVFADC+R: refine-code re-rank cost on top of the probe scan
    # (timing is value-independent; recall is measured at 1M against exact
    # ground truth by scripts/measure_ivfpqr.py where raw vectors fit HBM)
    refine_M = 32
    ix_r = IVFPQIndex(
        coarse_centers=ix.coarse_centers,
        codewords=ix.codewords,
        flat_codes=ix.flat_codes,
        flat_ids=ix.flat_ids,
        offsets=ix.offsets,
        lens=ix.lens,
        seg=seg, nprobe=nprobe, normalized=False,
        refine_codewords=jnp.asarray(
            rng.standard_normal((refine_M, 256, D // refine_M)).astype(np.float32)
        ),
        flat_refine=jax.random.randint(
            jax.random.PRNGKey(2), (nlist * seg, refine_M), 0, 256,
            dtype=jnp.int32,
        ).astype(jnp.uint8),
        flat_list=jnp.repeat(
            jnp.arange(nlist, dtype=jnp.int32), seg
        ),
    )
    ix_r.search(queries, 100)  # warmup/compile (auto -> adc+refine)
    dt = _time_reps(lambda: ix_r.search(queries, 100))
    print(json.dumps({
        "stage": "ivfpqr_probe_refine", "N": N, "nlist": nlist,
        "nprobe": nprobe, "refine_M": refine_M,
        "ms_per_query": round(dt / Q * 1e3, 2),
        "extra_bytes_per_vec": refine_M,
    }), flush=True)


if __name__ == "__main__":
    main()
