"""Decompose LoFTR count-path device time by stage, f32 vs bf16.

The LoFTR re-rank row (BASELINE.md) measures 79 ms/pair at 480x640 through
the tunnel; this script attributes the device time across the three stages
that survive DCE in the count path (models/loftr.py make_batched_count_fn):

  backbone   ResNetFPN_8_2 on the stacked image pair
  coarse     8 linear-attention encoder layers at L=4800, d=256
  match      dual-softmax (L, L) conf + border + mutual max + count

and measures each in f32 and with params+inputs cast to bf16, to decide
whether a bf16 fast path is worth threading through the module tree. Timing
is scan-slope inside one jitted program (CLAUDE.md tunnel protocol).

Usage: python scripts/measure_loftr_stages.py [--hw 480 640] [--reps 3]
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


def _slope(loop_factory, args, rs=(2, 8), tries=3):
    ts = {}
    for R in rs:
        loop = loop_factory(R)
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

    from image_search_engine_for_historical_research_tpu.models import loftr

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--hw", type=int, nargs=2, default=[480, 640])
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    H, W = args.hw

    m, variables = loftr.init_matcher(image_shape=(H, W))
    cfg = m.config
    rng = np.random.default_rng(0)
    # structured pair (smoothed texture + shift) so the count is nonzero and
    # the f32-vs-bf16 agreement check is meaningful
    base = rng.uniform(0, 1, (H, W))
    for ax in (0, 1):
        for sh in (1, 2, 4, 8):
            base = 0.5 * base + 0.5 * np.roll(base, sh, axis=ax)
    base = (base - base.min()) / (np.ptp(base) + 1e-9)
    i0 = jnp.asarray(base[..., None], jnp.float32)
    i1 = jnp.asarray(np.roll(base, 16, axis=1)[..., None], jnp.float32)

    bb = loftr.ResNetFPN82(cfg.initial_dim, cfg.block_dims)
    vars_bb = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables["batch_stats"]["backbone"],
    }
    ct = loftr.LocalFeatureTransformer(
        cfg.d_coarse, cfg.nhead, tuple(cfg.coarse_layers)
    )
    vars_ct = {"params": variables["params"]["loftr_coarse"]}

    Hc, Wc = H // 8, W // 8
    L, d = Hc * Wc, cfg.d_coarse

    def cast_tree(tree, dt):
        return jax.tree.map(
            lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, tree
        )

    # ---- stage: backbone ---------------------------------------------------
    def bb_loop(R):
        @jax.jit
        def loop(v, imgs):
            def body(c, _):
                fc, ff = bb.apply(v, c)
                return c + (jnp.mean(fc) + jnp.mean(ff)).astype(c.dtype) * 1e-12, None

            c, _ = jax.lax.scan(body, imgs, None, length=R)
            return c

        return loop

    # ---- stage: coarse transformer ----------------------------------------
    def ct_loop(R):
        @jax.jit
        def loop(v, t0, t1):
            def body(c, _):
                o0, o1 = ct.apply(v, c, t1)
                return c + (jnp.mean(o0) + jnp.mean(o1)).astype(c.dtype) * 1e-12, None

            c, _ = jax.lax.scan(body, t0, None, length=R)
            return c

        return loop

    # ---- stage: dual-softmax match counting --------------------------------
    def match_count(t0, t1):
        n0 = (t0 / d**0.5).astype(jnp.float32)
        n1 = (t1 / d**0.5).astype(jnp.float32)
        sim = jnp.einsum("blc,bsc->bls", n0, n1) / cfg.temperature
        conf = (jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2))[0]
        keep = conf > cfg.thr
        b = cfg.border_rm
        row_ok = jnp.zeros((Hc, Wc), bool).at[b:-b, b:-b].set(True).reshape(L)
        keep = keep & row_ok[:, None] & row_ok[None, :]
        keep = (
            keep
            & (conf == jnp.max(conf, axis=1, keepdims=True))
            & (conf == jnp.max(conf, axis=0, keepdims=True))
        )
        return jnp.sum(jnp.any(keep, axis=1))

    def mc_loop(R):
        @jax.jit
        def loop(t0, t1):
            def body(c, _):
                n = match_count(c, t1)
                return c + n.astype(c.dtype) * 1e-12, None

            c, _ = jax.lax.scan(body, t0, None, length=R)
            return c

        return loop

    imgs = jnp.stack([i0, i1], axis=0)
    kt = jax.random.PRNGKey(3)
    t0 = jax.random.normal(kt, (1, L, d), jnp.float32)
    t1 = jax.random.normal(jax.random.PRNGKey(4), (1, L, d), jnp.float32)

    rows = []
    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        v_bb = cast_tree(vars_bb, dt)
        v_ct = cast_tree(vars_ct, dt)
        s_bb = _slope(bb_loop, (v_bb, imgs.astype(dt)))
        s_ct = _slope(ct_loop, (v_ct, t0.astype(dt), t1.astype(dt)))
        s_mc = _slope(mc_loop, (t0.astype(dt), t1.astype(dt)))
        rows.append({
            "dtype": dt_name, "H": H, "W": W,
            "backbone_ms": round(s_bb * 1e3, 2),
            "coarse_ms": round(s_ct * 1e3, 2),
            "match_ms": round(s_mc * 1e3, 2),
            "total_ms": round((s_bb + s_ct + s_mc) * 1e3, 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    # full count path, f32 vs the bf16 fast path (compute_dtype; TPU-only —
    # the CPU backend rejects bf16 x bf16 -> f32 dots): timing + agreement.
    # Random weights produce no matches at thr=0.2, so agreement is checked
    # at a permissive threshold where mutual maxima survive.
    import dataclasses

    m_lo, v_lo = loftr.init_matcher(image_shape=(H, W),
                                    config=dataclasses.replace(cfg, thr=1e-6))
    i0b = imgs[:1]
    i1b = imgs[1:]
    for dt_name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        fn = loftr.make_batched_count_fn(m_lo, v_lo, compute_dtype=dt)
        c = int(np.asarray(fn(i0b, i1b))[0])
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _force(fn(i0b, i1b))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "stage": "count_path", "dtype": dt_name, "count": c,
            "wall_ms_per_pair": round(best * 1e3, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
