"""Folder-labelled custom-dataset evaluation.

Counterpart of ``python -m src.test_custom`` (``/root/reference/src/test_custom.py``):
extract db + query descriptors from folder-structured datasets (folder name =
label), run the matcher, report the folder-label mAP protocol
(evaluate.py:157-174).
"""

from __future__ import annotations

import argparse
import os

from ..data import path_all_jpg
from ..evaluation import map_custom
from ..evaluation.ranks import save_ranked_results
from ..models.extract import extract_vectors
from .common import add_common_args, dispatch_matcher, load_network, parse_scales


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--db-dir", required=True, help="gallery root (label folders)")
    p.add_argument("--query-dir", required=True, help="query root (label folders)")
    p.add_argument("--K", type=int, default=10)
    p.add_argument(
        "--save-ranks", action="store_true",
        help="persist the full per-query ranking under <outputs>/ranks/ "
        "(json + npz; the reference pickles the same mapping, "
        "test_custom.py:38-44)",
    )
    p.add_argument(
        "--html-sheet", action="store_true",
        help="with --save-ranks: also write an HTML contact sheet "
        "(query | top-K thumbnails; the reference's matplotlib montage)",
    )
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    scales = parse_scales(args.multiscale)
    model = load_network(args.network_path, args.arch)

    db_paths, _ = path_all_jpg(args.db_dir)
    q_paths, _ = path_all_jpg(args.query_dir)
    print(f">> extracting {len(db_paths)} db + {len(q_paths)} query images")
    vecs = extract_vectors(model, db_paths, args.image_size, scales=scales,
                           batch_size=args.batch_size)
    qvecs = extract_vectors(model, q_paths, args.image_size, scales=scales,
                            batch_size=args.batch_size)

    K = min(args.K, len(db_paths))
    idx, tpq = dispatch_matcher(
        args.matching_method, K, vecs, qvecs,
        **({} if args.matching_method in ("L2", "L2_int8", "fractional", "LSH")
           else {"dataset": "custom", "ifgenerate": args.ifgenerate,
                 "outputs": args.outputs}),
    )
    m = map_custom(K, idx, q_paths, db_paths)
    print(f">> custom mAP@{K}: {m * 100:.2f} ({tpq * 1e3:.3f} ms/query)")

    if args.save_ranks:
        out = save_ranked_results(
            os.path.join(args.outputs, "ranks"),
            idx,
            q_paths,
            db_paths,
            html_sheet=args.html_sheet,
        )
        print(f">> ranked results: {out['json']}"
              + (f" + {out['html']}" if out["html"] else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
