"""Re-ranking method comparison over stored features.

Counterpart of ``python -m src.test_reranking``
(``/root/reference/src/test_reranking.py``): load a dataset's stored features,
run the base matcher, then each requested re-ranking method, reporting revisited
mAP per method (the reference comments methods in/out; here it's a flag).

Usage:
  python -m image_search_engine_for_historical_research_tpu.cli.test_reranking \
      --dataset roxford5k --data-root data/test --methods qge,aqe,dba,kr
"""

from __future__ import annotations

import argparse

import numpy as np

from ..data import configdataset, load_path_features
from ..evaluation import compute_map_revisited
from .common import add_common_args, dispatch_matcher


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--dataset", required=True)
    p.add_argument("--data-root", required=True)
    p.add_argument("--methods", default="qge",
                   help="comma list: qge,aqe,dba,kr,diffusion,sift,loftr")
    p.add_argument("--sift-store", default=None)
    p.add_argument("--sift-backend", default="cv2", choices=["cv2", "tpu"],
                   help="tpu = batched device SIFT (ops.sift) instead of "
                        "per-image host OpenCV")
    p.add_argument("--loftr-ckpt", default=None,
                   help="released LoFTR ckpt (outdoor_ds.ckpt layout); random "
                        "weights with a warning if omitted")
    return p


def main(argv=None):
    import jax.numpy as jnp

    from .. import rerank

    args = build_parser().parse_args(argv)
    cfg = configdataset(args.dataset, args.data_root)
    vecs, _ = load_path_features(args.dataset, root=args.outputs)
    qvecs, _ = load_path_features(args.dataset + "_queries", root=args.outputs)

    K = vecs.shape[0]
    idx, _ = dispatch_matcher(args.matching_method, K, vecs, qvecs)
    base = compute_map_revisited(idx, cfg["gnd"], args.dataset)
    print("baseline:")
    print(base.summary())

    vj, qj = jnp.asarray(vecs), jnp.asarray(qvecs)
    for method in args.methods.split(","):
        if method == "qge":
            qe, ranks = rerank.feature_enhancement(qj, vj, jnp.asarray(idx))
            ranks2, _ = rerank.diffusion_rerank(
                vj, qe, n_trunc=min(2000, K), kd=min(200, K)
            )
            res = compute_map_revisited(np.asarray(ranks2), cfg["gnd"], args.dataset)
        elif method == "aqe":
            qa, va = rerank.average_query_expansion(qj, vj)
            from ..ops.topk import exact_ranks

            res = compute_map_revisited(
                np.asarray(exact_ranks(qa, va)), cfg["gnd"], args.dataset
            )
        elif method == "dba":
            qd, vd = rerank.database_augmentation(qj, vj)
            from ..ops.topk import exact_ranks

            res = compute_map_revisited(
                np.asarray(exact_ranks(qd, vd)), cfg["gnd"], args.dataset
            )
        elif method == "kr":
            ranks = rerank.kr_rerank(qj, vj)
            res = compute_map_revisited(np.asarray(ranks), cfg["gnd"], args.dataset)
        elif method == "diffusion":
            ranks, _ = rerank.diffusion_rerank(
                vj, qj, n_trunc=min(2000, K), kd=min(200, K)
            )
            res = compute_map_revisited(np.asarray(ranks), cfg["gnd"], args.dataset)
        elif method == "sift":
            qpaths = [cfg["qim_fname"](cfg, i) for i in range(cfg["nq"])]
            dpaths = [cfg["im_fname"](cfg, i) for i in range(cfg["n"])]
            ranks = rerank.sift_rerank(
                qpaths, dpaths, idx, b=min(30, K), store_dir=args.sift_store,
                backend=args.sift_backend,
            )
            res = compute_map_revisited(ranks, cfg["gnd"], args.dataset)
        elif method == "loftr":
            from ..models import loftr as loftr_mod

            if args.loftr_ckpt:
                variables = loftr_mod.load_loftr_checkpoint(args.loftr_ckpt)
                m = loftr_mod.LoFTRMatcher(config=loftr_mod.LoFTRConfig())
            else:
                print("warning: no --loftr-ckpt; LoFTR re-rank uses random "
                      "weights (structure-only run)")
                m, variables = loftr_mod.init_matcher((480, 640))
            count_fn = loftr_mod.make_batched_count_fn(m, variables)
            qpaths = [cfg["qim_fname"](cfg, i) for i in range(cfg["nq"])]
            dpaths = [cfg["im_fname"](cfg, i) for i in range(cfg["n"])]
            ranks = rerank.loftr_rerank(
                qpaths, dpaths, idx, count_fn=count_fn, b=min(60, K),
                resolution=(640, 480),
            )
            res = compute_map_revisited(ranks, cfg["gnd"], args.dataset)
        else:
            print(f"skipping unknown method {method!r}")
            continue
        print(f"after {method}:")
        print(res.summary())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
