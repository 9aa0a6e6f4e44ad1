"""Offline index build: extract gallery descriptors + build the search index.

Counterpart of ``python -m src.offline`` (``/root/reference/src/offline.py``):
walk self-made dataset folders, extract multiscale descriptors, persist the
feature store, then build the chosen index artifact with ``--ifgenerate``
semantics. Paths are flags instead of the reference's hard-coded home dirs
(imageretrievalnet.py:413,420).

Usage:
  python -m image_search_engine_for_historical_research_tpu.cli.offline \
      --datasets mycollection --data-root /data --matching-method HNSW --ifgenerate
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..data import path_all_jpg, save_path_feature, load_path_features
from ..models.extract import extract_vectors
from .common import add_common_args, dispatch_matcher, load_network, parse_scales


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--datasets", required=True,
                   help="comma-separated folder names under --data-root")
    p.add_argument("--data-root", required=True)
    p.add_argument("--ifextracted", action="store_true",
                   help="reuse stored features instead of re-extracting")
    p.add_argument("--K", type=int, default=100)
    p.add_argument("--loader", default="pil", choices=["pil", "native"],
                   help="native = threaded libjpeg batch decoding "
                        "(native/image_loader.cpp)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    scales = parse_scales(args.multiscale)
    datasets = args.datasets.split(",")

    model = None
    all_vecs, all_paths = [], []
    for ds in datasets:
        if args.ifextracted:
            vecs, rel_paths = load_path_features(ds, root=args.outputs)
        else:
            if model is None:
                model = load_network(args.network_path, args.arch)
            folder = os.path.join(args.data_root, ds)
            paths, rel_paths = path_all_jpg(folder, args.data_root)
            print(f">> {ds}: extracting {len(paths)} images...")
            vecs = extract_vectors(
                model, paths, args.image_size, scales=scales,
                batch_size=args.batch_size, loader=args.loader,
            )
            save_path_feature(ds, vecs, rel_paths, root=args.outputs)
        all_vecs.append(np.asarray(vecs))
        all_paths.extend(rel_paths)

    vecs = np.concatenate(all_vecs, axis=0)
    name = "_".join(d.replace("/", "_") for d in datasets)
    print(f">> building {args.matching_method} index over {vecs.shape[0]} vectors")
    # build with a self-query to validate the artifact end to end
    idx, tpq = dispatch_matcher(
        args.matching_method, min(args.K, len(vecs)), vecs, vecs[:1],
        **_matcher_kwargs(args, name),
    )
    print(f">> index ready; probe query time {tpq * 1e3:.2f} ms")
    return 0


def _matcher_kwargs(args, name):
    if args.matching_method in ("L2", "L2_int8", "fractional", "LSH", "Greedyhash"):
        return {}
    kw = {
        "dataset": name,
        "ifgenerate": args.ifgenerate,
        "outputs": args.outputs,
    }
    if args.matching_method in ("PQ", "Nano_PQ", "PQ_HNSW", "HNSW_NanoPQ", "IVFPQ"):
        kw["opq"] = getattr(args, "opq", False)
    if (getattr(args, "refine_m", None) is not None
            and args.matching_method in ("PQ", "Nano_PQ", "PQ_HNSW",
                                         "HNSW_NanoPQ", "IVFPQ")):
        kw["refine_M"] = args.refine_m
    return kw


if __name__ == "__main__":
    raise SystemExit(main())
