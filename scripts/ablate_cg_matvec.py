"""Ablate the truncated-CG matvec formulation at the 1M operating point.

The offline diffusion sweep at 1M (T=512, kd=50, batch=1024) measured ~5 s
per batch with the gather matvec (``vpad[loc]``: 550M scalar-unit gathers per
batch across 21 CG iterations). Candidate: build each row's truncated
operator densely once (scatter T*kd values into a (T, T+1) matrix) and run
the 21 matvecs as batched MXU matmuls — trading 26M scattered elements per
batch for ~21 GB/s-friendly streaming reads.

Synthetic Laplacian tables reproduce the compute shape exactly (timing is
value-independent); stage components are timed by wall-clock around forced
completions, far above the 33 ms tunnel noise floor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from image_search_engine_for_historical_research_tpu.rerank.diffusion import (
        _batched_trunc_cg, CG_MAXITER, CG_TOL,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--kd", type=int, default=50)
    p.add_argument("--t", type=int, default=512)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()
    N, kd, T, B = args.n, args.kd, args.t, args.batch

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    lap_nbr = jax.random.randint(k1, (N, kd), 0, N, jnp.int32)
    lap_val = (-0.01) * jax.random.uniform(k2, (N, kd), jnp.float32)
    # supports: distinct-ish random ids per row (duplicates harmless for timing)
    trunc_ids = jax.random.randint(k3, (B, T), 0, N, jnp.int32)
    trunc_ids = trunc_ids.at[:, 0].set(jnp.arange(B))
    np.asarray(lap_val[:1, :1])

    @jax.jit
    def dense_cg(lap_nbr, lap_val, trunc_ids):
        def solve_one(support):
            order = jnp.argsort(support)
            ss = support[order]
            nbrs = lap_nbr[ss]
            vals = lap_val[ss]
            pos = jnp.clip(jnp.searchsorted(ss, nbrs), 0, T - 1)
            loc = jnp.where(ss[pos] == nbrs, pos, T)
            rows = jax.lax.broadcasted_iota(jnp.int32, (T, kd), 0)
            S = jnp.zeros((T, T + 1), jnp.float32).at[rows, loc].add(vals)
            S = S[:, :T]

            def matvec(v):
                return v + S @ v

            b = jnp.zeros((T,), jnp.float32)
            b = b.at[jnp.searchsorted(ss, support[0])].set(1.0)
            x, _ = jax.scipy.sparse.linalg.cg(
                matvec, b, tol=CG_TOL, maxiter=CG_MAXITER
            )
            return jnp.zeros((T,), jnp.float32).at[order].set(x)

        return jax.vmap(solve_one)(trunc_ids)

    gather_cg = jax.jit(_batched_trunc_cg)

    # vector-recompute variant: no adjacency tables at solve time — the
    # truncated operator is rebuilt from the support vectors by one batched
    # MXU matmul; mutuality via per-row kd-th-sim thresholds
    D = 2048
    kv, kt = jax.random.split(key)
    vecs = jax.random.normal(kv, (N, D), jnp.bfloat16)
    thresh = jax.random.uniform(kt, (N,), jnp.float32, 0.3, 0.6)
    dinv = jnp.ones((N,), jnp.float32)

    @jax.jit
    def recompute_cg(vecs, thresh, dinv, trunc_ids):
        def solve_one(support):
            V = vecs[support]
            G = jax.lax.dot_general(
                V, V, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            tau = thresh[support]
            mutual = (G >= tau[:, None]) & (G >= tau[None, :])
            mutual &= ~jnp.eye(T, dtype=bool)
            w = jnp.where(mutual, jnp.clip(G, min=0.0) ** 3, 0.0)
            di = dinv[support]
            S = (-0.99) * w * di[:, None] * di[None, :]

            def matvec(v):
                return v + S @ v

            b = jnp.zeros((T,), jnp.float32).at[0].set(1.0)
            x, _ = jax.scipy.sparse.linalg.cg(
                matvec, b, tol=CG_TOL, maxiter=CG_MAXITER
            )
            return x

        return jax.vmap(solve_one)(trunc_ids)

    def run_recompute(lap_nbr, lap_val, tids):
        return recompute_cg(vecs, thresh, dinv, tids)

    for name, fn in (
        ("gather", gather_cg), ("dense", dense_cg), ("recompute", run_recompute)
    ):
        out = fn(lap_nbr, lap_val, trunc_ids)
        np.asarray(out.ravel()[:1])  # compile + first run
        t0 = time.time()
        for _ in range(args.reps):
            out = fn(lap_nbr, lap_val, trunc_ids)
        np.asarray(out.ravel()[:1])
        dt = (time.time() - t0) / args.reps
        print(json.dumps({
            "matvec": name, "B": B, "T": T, "kd": kd,
            "s_per_batch": round(dt, 3),
            "s_total_1m": round(dt * (N / B), 1),
        }), flush=True)

    # numeric agreement of the two formulations
    a = np.asarray(gather_cg(lap_nbr, lap_val, trunc_ids))
    b = np.asarray(dense_cg(lap_nbr, lap_val, trunc_ids))
    print(json.dumps({"max_abs_diff": float(np.max(np.abs(a - b)))}), flush=True)


if __name__ == "__main__":
    main()
