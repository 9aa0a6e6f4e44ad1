"""Closed-loop training demonstration: mine -> train -> retrieval-eval, measured.

The reference's regression check is its in-training ``test()`` loop
(``/root/reference/src/main_train.py:625-719``): every ``--test-freq`` epochs
it extracts the eval datasets with the current weights and reports revisited
mAP. No pretrained weights or real datasets can enter this environment (zero
egress), so this drives the identical loop end to end on *synthetic scenes*
(``data.synthetic.make_scene_sfm_dataset``): per-scene random canvases whose
crops share spatial structure but whose color statistics are identical across
scenes — a random-init network starts imperfect and contrastive training with
hard-negative re-mining has to earn the mAP.

Everything is the production path: ``tuples_from_db_pickle`` ingestion,
``Trainer.fit`` (per-epoch re-mining, grad steps, validation,
``make_retrieval_eval`` hook on a held-out scene set, orbax checkpoints,
metrics.jsonl). Prints one JSON line per epoch plus a final summary.

Usage: python scripts/train_closed_loop.py [--epochs 8] [--arch resnet50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from image_search_engine_for_historical_research_tpu.data.synthetic import (
        make_scene_revisited, make_scene_sfm_dataset,
    )
    from image_search_engine_for_historical_research_tpu.models import init_network
    from image_search_engine_for_historical_research_tpu.train import (
        TrainConfig, Trainer, make_retrieval_eval, tuples_from_db_pickle,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--arch", default="resnet50")
    p.add_argument("--scenes", type=int, default=24)
    p.add_argument("--views", type=int, default=6)
    p.add_argument("--eval-scenes", type=int, default=16)
    p.add_argument("--image-size", type=int, default=192)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--nnum", type=int, default=3)
    p.add_argument("--root", default=None, help="data/run dir (default: temp)")
    p.add_argument("--compute-dtype", default=None,
                   help="backbone compute dtype, e.g. bfloat16 (f32 head/loss)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize bottleneck activations in the backward")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke tests; the env var "
                        "alone is ignored under the pinned axon platform)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    root = args.root or tempfile.mkdtemp(prefix="closed_loop_")
    t0 = time.time()
    pkl = make_scene_sfm_dataset(
        root, n_scenes=args.scenes, views_per_scene=args.views, seed=0
    )
    eval_ds = make_scene_revisited(
        root, n_scenes=args.eval_scenes, db_views=5, seed=100
    )
    print(json.dumps({
        "stage": "data", "train_pkl": pkl,
        "eval_db": len(eval_ds["images"]), "seconds": round(time.time() - t0, 1),
    }), flush=True)

    # random init (no egress for pretrained weights); unfreeze the backbone —
    # the reference freezes conv1-4 only because they arrive pretrained
    model = init_network(
        {"architecture": args.arch, "soa": True, "whitening": False},
        rng=jax.random.PRNGKey(0),
    )
    dataset = tuples_from_db_pickle(pkl, mode="train", nnum=args.nnum)
    eval_fn = make_retrieval_eval(
        {"scenes": eval_ds}, image_size=args.image_size, batch_size=8
    )

    cfg = TrainConfig(
        epochs=args.epochs,
        lr=args.lr,
        exp_decay=0.1,
        image_size=args.image_size,
        nnum=args.nnum,
        batch_tuples=2,
        qsize=len(dataset.qpool),
        poolsize=len(dataset.images),
        freeze_backbone=False,
        checkpoint_dir=os.path.join(root, "run"),
        test_freq=1,
        seed=0,
        compute_dtype=args.compute_dtype,
        remat=args.remat,
    )
    trainer = Trainer(model, dataset, cfg, eval_fn=eval_fn)

    # epoch-0 baseline: the eval hook on the untrained weights
    base = eval_fn(model)
    print(json.dumps({"stage": "eval0", **{k: round(v, 4) for k, v in base.items()}}),
          flush=True)

    t0 = time.time()
    history = trainer.fit(
        log=lambda s: print(json.dumps({"stage": "epoch", "msg": s}), flush=True)
    )
    train_s = time.time() - t0

    last_eval = next(
        (m.eval_metrics for m in reversed(history) if m.eval_metrics), {}
    )
    print(json.dumps({
        "stage": "summary",
        "epochs": len(history),
        "train_seconds": round(train_s, 1),
        "map_m_before": round(base.get("scenes/mapM", float("nan")), 4),
        "map_m_after": round(last_eval.get("scenes/mapM", float("nan")), 4),
        "map_e_before": round(base.get("scenes/mapE", float("nan")), 4),
        "map_e_after": round(last_eval.get("scenes/mapE", float("nan")), 4),
        "map_h_before": round(base.get("scenes/mapH", float("nan")), 4),
        "map_h_after": round(last_eval.get("scenes/mapH", float("nan")), 4),
        "train_loss_first": round(history[0].train_loss, 4) if history else None,
        "train_loss_last": round(history[-1].train_loss, 4) if history else None,
    }), flush=True)


if __name__ == "__main__":
    main()
