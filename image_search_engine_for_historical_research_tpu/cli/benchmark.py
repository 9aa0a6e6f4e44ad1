"""Benchmark reproduction: revisited Oxford/Paris (+1M distractors) protocol.

Counterpart of ``python -m src.test_rOP1m`` (``/root/reference/src/test_rOP1m.py``):
per dataset, extract database and query descriptors (queries with gnd bbx crops),
optionally concatenate pre-extracted 1M distractors, run the chosen matcher in
mAP mode (K = database size) or top-K timing mode, report revisited mAP, then
QGE re-ranking (alphaQE + diffusion) like test_rOP1m.py:156-168.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..data import configdataset, load_path_features, query_bbxs, save_path_feature
from ..evaluation import compute_map_revisited
from ..models.extract import extract_vectors
from .common import add_common_args, dispatch_matcher, load_network, parse_scales


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--datasets", default="roxford5k,rparis6k")
    p.add_argument("--data-root", required=True, help="dir containing <dataset>/jpg + gnd pkl")
    p.add_argument("--mode", default="mAP", help="'mAP' (K = db size) or an integer K")
    p.add_argument("--ifextracted", action="store_true")
    p.add_argument("--include1m", action="store_true",
                   help="concatenate stored revisitop1m distractor features")
    p.add_argument("--qge", action="store_true", help="run alphaQE + diffusion re-ranking")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    scales = parse_scales(args.multiscale)
    model = None

    for dataset in args.datasets.split(","):
        cfg = configdataset(dataset, args.data_root)
        if args.ifextracted:
            vecs, _ = load_path_features(dataset, root=args.outputs)
            qvecs, _ = load_path_features(dataset + "_queries", root=args.outputs)
        else:
            if model is None:
                model = load_network(args.network_path, args.arch)
            im_paths = [cfg["im_fname"](cfg, i) for i in range(cfg["n"])]
            qim_paths = [cfg["qim_fname"](cfg, i) for i in range(cfg["nq"])]
            print(f">> {dataset}: extracting {cfg['n']} database images...")
            vecs = extract_vectors(model, im_paths, args.image_size,
                                   scales=scales, batch_size=args.batch_size)
            print(f">> {dataset}: extracting {cfg['nq']} query images...")
            qvecs = extract_vectors(model, qim_paths, args.image_size,
                                    bbxs=query_bbxs(cfg), scales=scales,
                                    batch_size=args.batch_size)
            save_path_feature(dataset, vecs, cfg["imlist"], root=args.outputs)
            save_path_feature(dataset + "_queries", qvecs, cfg["qimlist"],
                              root=args.outputs)

        if args.include1m:
            d1m, _ = load_path_features("revisitop1m", root=args.outputs)
            vecs = np.concatenate([vecs, d1m], axis=0)

        K = vecs.shape[0] if args.mode == "mAP" else int(args.mode)
        idx, tpq = dispatch_matcher(
            args.matching_method, K, vecs, qvecs,
            **({} if args.matching_method in ("L2", "L2_int8", "fractional", "LSH")
               else {"dataset": dataset, "ifgenerate": args.ifgenerate,
                     "outputs": args.outputs}),
        )
        print(f">> {dataset}: {args.matching_method} time/query {tpq * 1e3:.3f} ms")
        res = compute_map_revisited(idx, cfg["gnd"], dataset)
        print(res.summary())

        if args.qge:
            import jax.numpy as jnp
            from ..rerank import diffusion_rerank, feature_enhancement

            big = vecs.shape[0] >= 120000  # Reranking.py:212,273 regime switch
            k, iters = (3, 1) if big else (10, 3)
            qe, ranks_qe = feature_enhancement(
                jnp.asarray(qvecs), jnp.asarray(vecs), jnp.asarray(idx),
                k=k, iterations=iters,
            )
            res_qe = compute_map_revisited(np.asarray(ranks_qe), cfg["gnd"], dataset)
            print("after alphaQE:")
            print(res_qe.summary())
            if not big:
                ranks_dfs, _ = diffusion_rerank(
                    jnp.asarray(vecs), qe,
                    n_trunc=min(2000, vecs.shape[0]), kd=min(200, vecs.shape[0]),
                )
                res_dfs = compute_map_revisited(
                    np.asarray(ranks_dfs), cfg["gnd"], dataset
                )
                print("after alphaQE + diffusion:")
                print(res_dfs.summary())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
