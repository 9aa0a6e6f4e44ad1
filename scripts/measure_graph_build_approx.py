"""Measure the graph build with the matmul-fused approx_max_k candidate pass.

Round-3 finding: with ``approximate=True`` the (Q, N) f32 score matrix fuses
into the producing matmul (never materializes in HBM), so the one-shot scan
is safe far beyond the exact-path budget and runs at the matmul floor:
36-45 us/query at 1M x 2048 bf16 vs 422 us/q for the exact chunked policy at
the old batch=4096 operating point (~10x). Candidate recall vs exact top-97
is 0.997 and final beam recall is identical (the pruner keeps m0 of ~k
candidates). This script measures:

1. per-batch kNN-pass cost, exact vs approx, at the build's operating shape;
2. full 100k builds both ways (build time + beam recall parity);
3. ONE full 1M build with the new defaults, with per-stage timings
   (build_hnsw_graph_tpu(verbose=True)) and beam recall vs exact.

Run on the real TPU chip (not under the CPU-forced test env):
    nohup python scripts/measure_graph_build_approx.py > /tmp/mgba.log 2>&1 &
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from synth_data import clustered_db

from image_search_engine_for_historical_research_tpu.ops.topk import exact_topk
from image_search_engine_for_historical_research_tpu.index import build_hnsw_tpu


def force(x):
    np.asarray(jax.device_get(x.ravel()[:1]))


def time_batches(db, q, k, approximate, iters=5):
    s, i = exact_topk(q, db, k, matmul_dtype=jnp.bfloat16,
                      approximate=approximate, recall_target=0.99)
    force(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s, i = exact_topk(q, db, k, matmul_dtype=jnp.bfloat16,
                          approximate=approximate, recall_target=0.99)
        force(s)
    return (time.perf_counter() - t0) / iters


def beam_recall(ix, q, eidx, k=100, ef=100):
    s, i = ix.search_pallas(q, k, ef=ef)
    i = np.asarray(i)
    r100 = np.mean([len(set(eidx[r]) & set(i[r])) / k
                    for r in range(i.shape[0])])
    r10 = np.mean([len(set(eidx[r, :10]) & set(i[r])) / 10.0
                   for r in range(i.shape[0])])
    return r10, r100


def main():
    key = jax.random.PRNGKey(0)
    print("devices:", jax.devices(), flush=True)

    # --- per-batch kNN-pass timing at the 1M operating shape (batch 8192) ---
    db = clustered_db(key, 1_000_000, 2048, dtype=jnp.bfloat16)
    force(db)
    q = db[:8192]
    t_exact = time_batches(db, q, 97, approximate=False, iters=3)
    t_approx = time_batches(db, q, 97, approximate=True, iters=3)
    n_batches = -(-1_000_000 // 8192)
    print(f"kNN pass per-batch (8192 x 1M, k=97): exact {t_exact:.3f} s, "
          f"approx {t_approx:.3f} s -> projected pass "
          f"{t_exact*n_batches/60:.2f} vs {t_approx*n_batches/60:.2f} min",
          flush=True)

    se, ie = exact_topk(q[:256], db, 97, matmul_dtype=jnp.bfloat16)
    sa, ia = exact_topk(q[:256], db, 97, matmul_dtype=jnp.bfloat16,
                        approximate=True, recall_target=0.99)
    ie, ia = np.asarray(ie), np.asarray(ia)
    inter = np.mean([
        len(set(ie[r]) & set(ia[r])) / 97.0 for r in range(ie.shape[0])
    ])
    print(f"candidate recall (approx vs exact, k=97): {inter:.4f}", flush=True)
    del q, se, ie, sa, ia

    # --- full 1M build with the new defaults, staged ---
    qsel = np.random.default_rng(0).integers(0, 1_000_000, 512)
    qv = db[jnp.asarray(qsel)].astype(jnp.float32)
    es, eidx = exact_topk(qv, db, 100, matmul_dtype=jnp.bfloat16)
    eidx = np.asarray(eidx)
    t0 = time.perf_counter()
    ix = build_hnsw_tpu(db, m=16, k_candidates=96, verbose=True)
    t_build = time.perf_counter() - t0
    r10, r100 = beam_recall(ix, qv, eidx)
    print(f"1M build (approximate=True, batch=8192): {t_build/60:.2f} min, "
          f"beam recall@10 {r10:.4f} recall@100 {r100:.4f}", flush=True)
    del ix, db, qv

    # --- full builds at 100k, both ways ---
    db = clustered_db(jax.random.PRNGKey(1), 100_000, 2048,
                      dtype=jnp.bfloat16)
    force(db)
    qsel = np.random.default_rng(1).integers(0, 100_000, 512)
    qv = db[jnp.asarray(qsel)].astype(jnp.float32)
    _, eidx = exact_topk(qv, db.astype(jnp.float32), 100,
                         matmul_dtype=jnp.bfloat16)
    eidx = np.asarray(eidx)
    for approx in (False, True):
        t0 = time.perf_counter()
        ix = build_hnsw_tpu(db, m=16, k_candidates=96, approximate=approx)
        t_build = time.perf_counter() - t0
        r10, r100 = beam_recall(ix, qv, eidx)
        print(f"build 100k approximate={approx}: {t_build:.1f} s, "
              f"beam recall@10 {r10:.4f} recall@100 {r100:.4f}", flush=True)


if __name__ == "__main__":
    main()
