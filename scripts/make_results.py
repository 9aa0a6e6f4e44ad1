"""Produce docs/RESULTS.md: ours-vs-reference-pipeline mAP on one shared corpus.

The cross-stack test suite (tests/test_cross_stack.py) proves parity pairwise;
this script turns that into a readable deliverable (VERDICT r3 #8): every
matcher x re-rank mode on a 10k synthetic revisited corpus, with the
REFERENCE'S OWN pipeline code (``/root/reference/src/utils/{nnsearch,
Reranking,diffusion}.py``, run via the faithful library stubs in
tests/reference_pipeline.py) producing the side-by-side column. Protocol:
``test_rOP1m.py:144-168`` (match -> revisited mAP -> QGE re-rank).

Timings: ours runs on the configured jax backend (TPU through the axon
tunnel when available — includes per-dispatch tunnel overhead), the reference
on host CPU (numpy/scipy/torch). The columns measure different hardware by
construction; the comparable quantity is mAP/recall.

Usage: python scripts/make_results.py [--out docs/RESULTS.md] [--d 512]
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
import time
from contextlib import redirect_stdout

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def make_corpus(seed=0, n_clusters=300, views=20, D=512, nq=300,
                n_distractors=4000, intrinsic=48,
                sig_easy=0.55, sig_hard=1.1, sig_query=0.65):
    """Hardened revisited corpus (VERDICT r4 #5): the round-4 version was so
    separable every method scored 100.00 mAP. This one discriminates:

    - clusters live on a low-dimensional subspace (``intrinsic``-d, like real
      descriptor manifolds; isotropic 2048-d noise is degenerate — see
      scripts/synth_data.py) with noise scales that OVERLAP neighbouring
      clusters: easy views at ``sig_easy``, hard views at ``sig_hard``
      (~cluster-separation scale, so hard positives genuinely confuse),
    - ``n_distractors`` unlabeled gallery rows drawn from midpoints of random
      cluster pairs (decision-boundary distractors — the revisitop1m role),
    - ``nq`` >= 300 queries so mAP differences of ~1 point resolve.

    gnd rows: easy/hard/junk disjoint member splits per query cluster
    (testdataset.py:6-55 schema). Distractors are in no gnd list — retrieving
    them costs precision, exactly like the 1M distractor protocol.
    """
    rng = np.random.default_rng(seed)
    basis = np.linalg.qr(rng.standard_normal((D, intrinsic)))[0]  # (D, r)
    centers = rng.standard_normal((n_clusters, intrinsic))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def emit(z):
        x = (z @ basis.T).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        return x

    # per-coordinate scale so the noise L2 norm ~= sig (unit-norm centers in
    # the intrinsic space sit ~sqrt(2) apart — sig_hard ~ 0.95 overlaps)
    def noise(count, sig):
        return sig / np.sqrt(intrinsic) * rng.standard_normal(
            (count, intrinsic)
        )

    n_e = views // 2
    n_h = views // 4
    n_j = views - n_e - n_h
    parts, labels, kinds = [], [], []
    for c in range(n_clusters):
        for count, sig, kind in ((n_e, sig_easy, 0), (n_h, sig_hard, 1),
                                 (n_j, sig_easy, 2)):
            parts.append(centers[c][None] + noise(count, sig))
            labels += [c] * count
            kinds += [kind] * count
    # boundary distractors: midpoints of random cluster pairs + easy noise
    a = rng.integers(0, n_clusters, n_distractors)
    b = rng.integers(0, n_clusters, n_distractors)
    zd = 0.5 * (centers[a] + centers[b]) + noise(n_distractors, sig_easy)
    parts.append(zd)
    labels += [-1] * n_distractors
    kinds += [-1] * n_distractors

    gal = emit(np.concatenate(parts, axis=0))
    labels = np.asarray(labels)
    kinds = np.asarray(kinds)
    # shuffle so cluster members are not contiguous (index-locality can mask
    # recall errors in segment-based methods)
    perm = rng.permutation(len(gal))
    gal, labels, kinds = gal[perm], labels[perm], kinds[perm]

    q = emit(centers + noise(n_clusters, sig_query))
    gnd = []
    for c in range(min(nq, n_clusters)):
        members = np.where(labels == c)[0]
        k = kinds[members]
        gnd.append({
            "easy": members[k == 0],
            "hard": members[k == 1],
            "junk": members[k == 2],
        })
    return gal, q[: len(gnd)], gnd


def recall_vs(exact, idx, k):
    exact, idx = np.asarray(exact), np.asarray(idx)
    n = min(len(exact), len(idx))  # ref fractional truncates rows to K
    return float(np.mean([
        len(set(exact[i, :k]) & set(idx[i, :k])) / k for i in range(n)
    ]))


def ref_printed_map(fn, *args, **kw):
    """Run a reference re-ranker that prints 'mAP E: .. M: .. H: ..'."""
    buf = io.StringIO()
    t0 = time.time()
    with redirect_stdout(buf):
        fn(*args, **kw)
    dt = time.time() - t0
    lines = [l for l in buf.getvalue().splitlines() if "mAP E" in l]
    e, m, h = map(float, re.findall(r"[\d.]+", lines[-1].split("mAP")[1]))
    return (e / 100, m / 100, h / 100), dt, buf.getvalue()


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=os.path.join(REPO, "docs", "RESULTS.md"))
    p.add_argument("--d", type=int, default=512)
    p.add_argument("--nq", type=int, default=70)
    p.add_argument("--clusters", type=int, default=200)
    p.add_argument("--views", type=int, default=50)
    p.add_argument("--workdir", default="/tmp/results_artifacts")
    p.add_argument("--skip-ref-graph", action="store_true",
                   help="skip the slow pure-python reference HNSW builds")
    args = p.parse_args()

    import jax

    if os.environ.get("RESULTS_CPU"):  # CPU smoke runs (TPU busy / CI)
        jax.config.update("jax_platforms", "cpu")

    import reference_pipeline as rp
    from test_cross_stack import _NumpyCompat, _SparseLinalgCompat

    from image_search_engine_for_historical_research_tpu.evaluation import (
        compute_map_revisited,
    )
    from image_search_engine_for_historical_research_tpu.index import build_flat
    from image_search_engine_for_historical_research_tpu.index.matchers import (
        MATCHERS,
    )
    from image_search_engine_for_historical_research_tpu import rerank

    gal, q, gnd = make_corpus(D=args.d, nq=args.nq, n_clusters=args.clusters, views=args.views)
    N, Q = gal.shape[0], q.shape[0]
    K = 100
    backend = jax.default_backend()
    os.makedirs(args.workdir, exist_ok=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)

    _, exact100 = build_flat(gal).search(q, K)
    exact100 = np.asarray(exact100)

    def our_map(idx):
        idx = np.asarray(idx)
        # the reference's matching_fractional_dis truncates the QUERY axis
        # to K (`np.argsort(dist)[:K]`, nnsearch.py:723) — a latent
        # reference bug invisible at Q <= 100; evaluate the rows it returned
        r = compute_map_revisited(idx, gnd[: idx.shape[0]])
        return (r.mapE, r.mapM, r.mapH)

    # ------------------------------------------------------------- matchers
    nn = rp.load_reference_nnsearch()
    nn.np = _NumpyCompat()
    rows = []

    def add_matcher(name, ours, ref, note=""):
        rows.append((name, ours, ref, note))
        print("done:", name, flush=True)

    def run_ours(method, **kw):
        t0 = time.time()
        idx, tpq = MATCHERS[method](K, gal.copy(), q.copy(), **kw)
        build_s = time.time() - t0
        return {
            "map": our_map(idx), "tpq_ms": tpq * 1e3,
            "recall": recall_vs(exact100, idx, K), "build_s": build_s,
        }

    def run_ref(fn, *a, **kw):
        cwd = os.getcwd()
        os.chdir(args.workdir)  # reference writes outputs/<ds>/*.pkl
        buf = io.StringIO()
        try:
            t0 = time.time()
            with redirect_stdout(buf):
                idx, tpq = fn(*a, **kw)
            build_s = time.time() - t0
        finally:
            os.chdir(cwd)
        idx = np.asarray(idx)[:, :K]
        return {
            "map": our_map(idx), "tpq_ms": float(tpq) * 1e3,
            "recall": recall_vs(exact100, idx, K), "build_s": build_s,
        }

    add_matcher("L2 (exact)", run_ours("L2"),
                run_ref(nn.matching_L2, K, gal.copy(), q.copy()))
    add_matcher("L2_int8", run_ours("L2_int8"), None,
                "no reference counterpart (int8 scan)")
    add_matcher("fractional (p=0.5)", run_ours("fractional"),
                run_ref(nn.matching_fractional_dis, K, gal.copy(), q.copy()),
                "ref column covers its first 100 queries only at Q > 100 "
                "(reference bug: argsort row-slice to K, nnsearch.py:723)")
    add_matcher("LSH (512-bit)", run_ours("LSH"), None,
                "reference uses faiss IndexLSH (GPU lib, not runnable here)")
    # Ks=2^8 for BOTH stacks here: the reference's scipy kmeans2 at its
    # driver point Ks=2^13 takes hours on this host CPU at 10k rows; the
    # 2^13 operating point is measured at 1M on TPU in BASELINE.md
    nb = 8
    while 2 ** nb > N:
        nb -= 1
    add_matcher(
        f"PQ / Nano_PQ (M=16, Ks=2^{nb})",
        run_ours("PQ", dataset="synth", outputs=args.workdir + "/ours",
                 n_bits_perbook=nb),
        run_ref(nn.matching_Nano_PQ, K, gal.copy(), q.copy(), "synth",
                N_books=16, n_bits_perbook=nb),
    )
    add_matcher(
        f"PQ + OPQ (M=16, Ks=2^{nb})",
        run_ours("PQ", dataset="synth_opq", outputs=args.workdir + "/ours",
                 n_bits_perbook=nb, opq=True),
        None,
        "learned orthogonal pre-rotation, beyond the reference (nanopq is "
        "plain PQ); 1M numbers in BASELINE.md",
    )
    add_matcher(
        "ANNOY / RP-forest (100 trees)",
        run_ours("ANNOY", dataset="synth", outputs=args.workdir + "/ours"),
        None, "annoy is a C++ lib, not runnable here; recall column vs exact",
    )
    if args.skip_ref_graph:
        ref_hnsw = None
        note_h = "reference pure-python build skipped (--skip-ref-graph)"
    else:
        import random as pyrandom

        pyrandom.seed(0)
        t0 = time.time()
        h = nn.HNSW("l2", m=16, ef=100)
        for row in gal:
            h.add(row)
        build_ref = time.time() - t0
        t0 = time.time()
        ref_idx = np.stack([
            np.array(h.search(q[i], K, ef=100))[:, 0].astype(np.int64)
            for i in range(Q)
        ])
        tq = (time.time() - t0) / Q
        ref_hnsw = {
            "map": our_map(ref_idx), "tpq_ms": tq * 1e3,
            "recall": recall_vs(exact100, ref_idx, K), "build_s": build_ref,
        }
        note_h = ""
    add_matcher(
        "HNSW (m=16, ef=100)",
        run_ours("HNSW", dataset="synth", outputs=args.workdir + "/ours"),
        ref_hnsw, note_h,
    )
    add_matcher(
        "PQ_HNSW (M=16, adc+refine)",
        run_ours("PQ_HNSW", dataset="synth", outputs=args.workdir + "/ours"),
        None,
        "reference build at Ks=2^13 over 10k unique codes is the same "
        "pure-python insert as HNSW above",
    )
    add_matcher(
        "PQ_HNSW + OPQ (M=16, adc+refine)",
        run_ours("PQ_HNSW", dataset="synth_opq",
                 outputs=args.workdir + "/ours", opq=True),
        None,
        "codes-only route with the learned rotation (recall@100 0.976 at 1M, "
        "BASELINE.md)",
    )
    add_matcher(
        "IVF-PQ (nlist=316, nprobe=64)",
        run_ours("IVFPQ", dataset="synth", outputs=args.workdir + "/ours"),
        None, "reference uses faiss IndexIVFPQ (knn.py:43)",
    )
    add_matcher(
        "IVF-PQ + OPQ residual rotation",
        run_ours("IVFPQ", dataset="synth_opq",
                 outputs=args.workdir + "/ours", opq=True),
        None, "faiss OPQMatrix arrangement, beyond the reference wrapper",
    )
    add_matcher(
        "IVF-PQ + refine (IVFADC+R, refine_M=16)",
        run_ours("IVFPQ", dataset="synth_r",
                 outputs=args.workdir + "/ours", refine_M=16),
        None,
        "codes-only two-level re-rank (faiss IndexIVFPQR); 1M numbers in "
        "BASELINE.md",
    )

    # ------------------------------------------------------------ re-rankers
    rr = rp.load_reference_reranking()
    rr.np = _NumpyCompat()
    df = rp.load_reference_diffusion()
    df.linalg = _SparseLinalgCompat()
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.empty_cache = lambda: None

    _, base_full = build_flat(gal).search(q, N)
    base_full = np.asarray(base_full)
    rr_rows = []

    def add_rerank(name, ours, ref, note=""):
        rr_rows.append((name, ours, ref, note))
        print("done:", name, flush=True)

    base_maps = our_map(base_full)
    add_rerank("(no re-rank baseline)",
               {"map": base_maps, "s_total": 0.0},
               {"map": base_maps, "s_total": 0.0},
               "same exact ranking feeds every re-ranker")

    # qge1 — the serving-path alphaQE (identical permutation, cross-stack)
    t0 = time.time()
    ours_qge1 = np.asarray(rerank.qge1(base_full, q, gal))
    s_ours = time.time() - t0
    t0 = time.time()
    ref_qge1 = rr.qge1(base_full.T.copy(), q.T.copy(), gal.T.copy(), N)
    s_ref = time.time() - t0
    add_rerank("qge1 (serving alphaQE)",
               {"map": our_map(ours_qge1), "s_total": s_ours},
               {"map": our_map(np.asarray(ref_qge1).T), "s_total": s_ref})

    # AQE
    t0 = time.time()
    q_aug, v_aug = rerank.average_query_expansion(q, gal)
    _, idx_aqe = build_flat(np.asarray(v_aug)).search(np.asarray(q_aug), N)
    s_ours = time.time() - t0
    ref_maps, s_ref, _ = ref_printed_map(
        rr.average_query_expansion, q.T.copy(), gal.T.copy(), N, "roxford5k", gnd
    )
    add_rerank("AQE (classic)",
               {"map": our_map(idx_aqe), "s_total": s_ours},
               {"map": ref_maps, "s_total": s_ref})

    # DBA
    t0 = time.time()
    q_aug, v_aug = rerank.database_augmentation(q, gal)
    _, idx_dba = build_flat(np.asarray(v_aug)).search(np.asarray(q_aug), N)
    s_ours = time.time() - t0
    ref_maps, s_ref, _ = ref_printed_map(
        rr.database_augmentation, q.T.copy(), gal.T.copy(), N, "roxford5k", gnd
    )
    add_rerank("DBA",
               {"map": our_map(idx_dba), "s_total": s_ours},
               {"map": ref_maps, "s_total": s_ref})

    # k-reciprocal — ours goes through the chunked >=100k-envelope path
    t0 = time.time()
    idx_kr = np.asarray(rerank.kr_rerank(q, gal, method="chunked"))
    s_ours = time.time() - t0
    t0 = time.time()
    with redirect_stdout(io.StringIO()):
        ref_kr = rr.kr_reranking(q.T.copy(), gal.T.copy())
    s_ref = time.time() - t0
    add_rerank("k-reciprocal (chunked)",
               {"map": our_map(idx_kr), "s_total": s_ours},
               {"map": our_map(np.asarray(ref_kr)), "s_total": s_ref})

    # alphaQE + diffusion: ours vs the reference's full QGE driver
    # (the reference's small-DB branch hardcodes truncation 2000 -> N > 2000)
    import pickle

    run_qge = N > 2000

    if not run_qge:
        print("skipping QGE row: N <= 2000 (reference branch hardcodes it)")
    else:
        gnd_path = os.path.join(args.workdir, "gnd_roxford5k.pkl")
        with open(gnd_path, "wb") as f:
            pickle.dump({"gnd": gnd}, f)
        t0 = time.time()
        q_enh, _ = rerank.feature_enhancement(
            q, gal, base_full, k=10, iterations=3
        )
        ranks_dfs, _ = rerank.diffusion_rerank(
            gal, np.asarray(q_enh), n_trunc=2000, kd=200, k_query=3,
            truncation=2000,
        )
        s_ours = time.time() - t0
        ranks_dfs = np.asarray(ranks_dfs)

        buf = io.StringIO()
        t0 = time.time()
        with redirect_stdout(buf):
            rr.QGE(base_full.T.copy(), q.T.copy(), gal.T.copy(), "roxford5k",
                   gnd, args.workdir, gnd_path, AQE=True)
        s_ref = time.time() - t0
        walk = buf.getvalue().split("Random Walk)")[1]
        line = [l for l in walk.splitlines() if "mAP E" in l][0]
        e, m, h = map(float, re.findall(r"[\d.]+", line.split("mAP")[1]))
        add_rerank(
            "QGE: alphaQE x3 + diffusion walk",
            {"map": our_map(ranks_dfs[:, :2000]), "s_total": s_ours},
            {"map": (e / 100, m / 100, h / 100), "s_total": s_ref},
            "mAP over the 2000-deep walk ranking (both stacks)",
        )

    # ------------------------------------------------------------- render
    def fmt_map(t):
        return f"{t[0]*100:.2f}/{t[1]*100:.2f}/{t[2]*100:.2f}"

    lines = [
        "# RESULTS — ours vs the reference pipeline on one shared corpus",
        "",
        "Produced by `python scripts/make_results.py` (re-runnable). Corpus: "
        f"{N} gallery x {args.d}-d clustered synthetic descriptors, {Q} queries, "
        "revisited-protocol gnd (easy/hard/junk per query). The reference "
        "column runs the reference's OWN code "
        "(`src/utils/nnsearch.py`, `Reranking.py`, `diffusion.py`) via the "
        "faithful library stubs of `tests/reference_pipeline.py`; mAP for both "
        "stacks is computed by our evaluator, which is bit-equal to the "
        "reference's (`tests/test_cross_stack.py`).",
        "",
        f"Hardware: ours = jax `{backend}` backend"
        + (" (TPU v5e through the axon tunnel: per-dispatch ~33 ms overhead "
           "included)" if backend not in ("cpu",) else "")
        + "; reference = host CPU (numpy/scipy/torch). Timing columns are "
        "therefore not hardware-comparable; mAP/recall are the parity "
        "columns. 1M-scale timings live in BASELINE.md.",
        "",
        f"## Matchers (top-{K}, mAP E/M/H %, recall@100 vs exact)",
        "",
        "| matcher | ours mAP | ours recall | 1M recall@100 | ours ms/q | "
        "ours build s | ref mAP | ref recall | ref ms/q | ref build s | note |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    # measured 1M operating points (BASELINE.md; clustered synthetic, the
    # recall each matcher actually delivers at scale at its default config)
    recall_1m = {
        "L2 (exact)": "1.000",
        "L2_int8": "0.999",
        "ANNOY / RP-forest (100 trees)": "0.90 (@10 0.977)",
        "HNSW (m=16, ef=100)": "0.998",
        "PQ_HNSW (M=16, adc+refine)": "0.920 (refine_M=64)",
        "PQ_HNSW + OPQ (M=16, adc+refine)": "0.951 (hybrid opq='refine')",
        "IVF-PQ (nlist=316, nprobe=64)": "0.893 (nlist=4096, +refine)",
        "IVF-PQ + OPQ residual rotation": "0.927",
        "IVF-PQ + refine (IVFADC+R, refine_M=16)": "0.893",
    }
    for name, ours, ref, note in rows:
        r = (
            [fmt_map(ref["map"]), f"{ref['recall']:.3f}",
             f"{ref['tpq_ms']:.2f}", f"{ref['build_s']:.1f}"]
            if ref else ["—", "—", "—", "—"]
        )
        lines.append(
            f"| {name} | {fmt_map(ours['map'])} | {ours['recall']:.3f} | "
            f"{recall_1m.get(name, '—')} | "
            f"{ours['tpq_ms']:.2f} | {ours['build_s']:.1f} | "
            + " | ".join(r) + f" | {note} |"
        )
    lines += [
        "",
        "## Re-rankers (over the exact full ranking, mAP E/M/H %)",
        "",
        "| re-ranker | ours mAP | ours s (total) | ref mAP | ref s (total) | note |",
        "|---|---|---|---|---|---|",
    ]
    for name, ours, ref, note in rr_rows:
        lines.append(
            f"| {name} | {fmt_map(ours['map'])} | {ours['s_total']:.2f} | "
            f"{fmt_map(ref['map'])} | {ref['s_total']:.2f} | {note} |"
        )
    lines += [
        "",
        "Notes:",
        "- Rank-identical paths (L2, qge1) agree to the tie-breaking of f32",
        "  scores; approximate paths (PQ, graphs, diffusion CG) agree at the",
        "  protocol-metric level — the same bounds the cross-stack suite",
        "  asserts on every run.",
        "- The SAHA/AdaLAM and LoFTR geometric re-rankers need image pairs,",
        "  not descriptors; their parity is established by torch-module",
        "  oracle tests (tests/test_adalam_oracle.py, test_loftr_oracle.py)",
        "  and their timings by scripts/measure_geometric.py (BASELINE.md).",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
