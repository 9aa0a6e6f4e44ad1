"""Online serving CLI: load features + index, start the query service.

Counterpart of ``python -m src.online`` (``/root/reference/src/online.py``).

Usage:
  python -m image_search_engine_for_historical_research_tpu.cli.online \
      --datasets mycollection --matching-method HNSW --port 8080
"""

from __future__ import annotations

import argparse

import numpy as np

from ..data import load_path_features
from ..index import build_flat, load_index
from ..serving.app import SearchService, serve
from .common import add_common_args, load_network, parse_scales


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--datasets", required=True)
    p.add_argument("--data-root", default=None,
                   help="base dir the stored relative image paths resolve "
                        "against (for result thumbnails)")
    p.add_argument("--K", type=int, default=10)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--no-rerank", action="store_true")
    p.add_argument("--loader", default="pil", choices=["pil", "native"],
                   help="batch image decoding: native = threaded libjpeg "
                        "(native/image_loader.cpp)")
    p.add_argument("--coalesce", type=int, default=0, metavar="MAX_BATCH",
                   help="micro-batch concurrent requests into one device "
                        "program (serving.batching; implies a threaded "
                        "server). 0 = off (the reference's one-query-at-a-"
                        "time behavior)")
    return p


def make_service(args) -> SearchService:
    datasets = args.datasets.split(",")
    vecs_l, paths = [], []
    for ds in datasets:
        v, p = load_path_features(ds, root=args.outputs)
        vecs_l.append(v)
        paths.extend(p)
    vecs = np.concatenate(vecs_l, axis=0)

    name = "_".join(d.replace("/", "_") for d in datasets)
    if args.matching_method == "L2":
        index = build_flat(vecs)
    else:
        kind = {
            "PQ": "pq", "Nano_PQ": "pq", "ANNOY": "rpforest", "HNSW": "hnsw",
            "PQ_HNSW": "hnsw_pq", "HNSW_NanoPQ": "hnsw_pq", "IVFPQ": "ivfpq",
        }[args.matching_method]
        index = load_index(f"{args.outputs}/{name}/{kind}")

    model = load_network(args.network_path, args.arch)
    return SearchService(
        model, index, vecs, paths, K=args.K,
        scales=parse_scales(args.multiscale), image_size=args.image_size,
        rerank=not args.no_rerank, image_root=args.data_root,
        loader=args.loader,
    )


def main(argv=None):
    args = build_parser().parse_args(argv)
    service = make_service(args)
    if args.coalesce:
        from ..serving.batching import CoalescingService

        service = CoalescingService(service, max_batch=args.coalesce)
    serve(service, args.host, args.port, threaded=bool(args.coalesce))


if __name__ == "__main__":
    main()
