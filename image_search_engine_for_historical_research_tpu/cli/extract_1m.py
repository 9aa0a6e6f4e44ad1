"""Distractor extraction at scale: the 1M-image offline descriptor sweep.

Counterpart of ``python -m src.extract_1m`` (``/root/reference/src/extract_1m.py``),
the reference's single biggest compute sink (bs=1, multi-day loop). Here the
sweep runs as masked canvas batches, optionally sharded over a device mesh, with
periodic npz checkpoints so the job is resumable (the reference restarts from
scratch).
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from ..data import configdataset, save_path_feature
from ..models.extract import extract_vectors, make_extract_fn
from .common import add_common_args, load_network, parse_scales


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--data-root", required=True)
    p.add_argument("--dataset", default="revisitop1m")
    p.add_argument("--checkpoint-every", type=int, default=50000)
    p.add_argument("--limit", type=int, default=0, help="cap image count (debug)")
    p.add_argument("--loader", default="pil", choices=["pil", "native"],
                   help="native = threaded libjpeg batch decoding "
                        "(native/image_loader.cpp)")
    p.add_argument("--mesh", action="store_true",
                   help="shard extraction batches over all local devices")
    p.add_argument("--bf16", action="store_true",
                   help="run the conv stack in bfloat16 (MXU fast path; "
                        "descriptors agree with f32 to ~1e-3 cosine)")
    p.add_argument("--shard-size", type=int, default=0,
                   help="write per-chunk shard files instead of one array "
                        "(data.store sharded format): the beyond-host-RAM "
                        "path — descriptors never assemble into one (N, D) "
                        "buffer, and data.chunked_feature_source feeds them "
                        "straight to the streaming index builders")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    scales = parse_scales(args.multiscale)
    cfg = configdataset(args.dataset, args.data_root)
    paths = [cfg["im_fname"](cfg, i) for i in range(cfg["n"])]
    if args.limit:
        paths = paths[: args.limit]

    model = load_network(args.network_path, args.arch)
    if args.mesh:
        import jax

        from ..models.extract import make_sharded_extract_fn
        from ..parallel import data_mesh

        mesh = data_mesh()
        fn = make_sharded_extract_fn(
            model.module, mesh, scales=scales,
            compute_dtype=jnp.bfloat16 if args.bf16 else None,
        )
        if args.batch_size % len(jax.devices()):
            raise SystemExit("--batch-size must divide evenly across devices")
    else:
        fn = make_extract_fn(
            model.module, scales=scales,
            compute_dtype=jnp.bfloat16 if args.bf16 else None,
        )

    if args.shard_size:
        # beyond-host-RAM mode: each extracted chunk persists as its own
        # atomic shard; resume = first row past the contiguous shard prefix
        from ..data import save_feature_shard, shard_resume_point

        start = shard_resume_point(args.dataset, root=args.outputs)
        if start:
            print(f">> resuming at {start}/{len(paths)} (complete shards)")
        for s in range(start, len(paths), args.shard_size):
            chunk = paths[s : s + args.shard_size]
            v = extract_vectors(
                model, chunk, args.image_size, scales=scales,
                batch_size=args.batch_size, extract_fn=fn,
                pad_batches=args.mesh, loader=args.loader,
            )
            save_feature_shard(
                args.dataset, s, np.asarray(v),
                cfg["imlist"][s : s + len(chunk)], root=args.outputs,
            )
            print(f">> {s + len(chunk)}/{len(paths)} done (sharded)")
        print(">> distractor feature shards stored; build indexes with "
              "data.chunked_feature_source + the streaming builders")
        return 0

    ckpt = os.path.join(args.outputs, f"{args.dataset}_partial.npz")
    start = 0
    vecs = np.zeros((len(paths), model.outputdim), np.float32)
    if os.path.exists(ckpt):
        z = np.load(ckpt)
        start = int(z["done"])
        vecs[:start] = z["vecs"][:start]
        print(f">> resuming at {start}/{len(paths)}")

    step = args.checkpoint_every
    for s in range(start, len(paths), step):
        chunk = paths[s : s + step]
        vecs[s : s + len(chunk)] = extract_vectors(
            model, chunk, args.image_size, scales=scales,
            batch_size=args.batch_size, extract_fn=fn,
            pad_batches=args.mesh, loader=args.loader,
        )
        os.makedirs(args.outputs, exist_ok=True)
        np.savez(ckpt, vecs=vecs, done=s + len(chunk))
        print(f">> {s + len(chunk)}/{len(paths)} done")

    save_path_feature(args.dataset, vecs, cfg["imlist"][: len(paths)],
                      root=args.outputs)
    if os.path.exists(ckpt):
        os.remove(ckpt)
    print(">> distractor features stored")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
