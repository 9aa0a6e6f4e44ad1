"""Serving THROUGHPUT at 1M: coalesced micro-batching vs one-query-at-a-time.

The latency rows (measure_serving*.py) answer "how fast is one query";
this script answers "how many concurrent users does one chip serve". The
reference's Flask app handles requests strictly sequentially (online.py),
so its throughput IS 1/latency. The TPU service coalesces concurrent
requests into one batched device program (serving.batching.CoalescingService
-> SearchService.query_batch), so throughput scales with the batch until the
chip saturates.

Protocol: real images on disk (JPEGs decoded per request — the full serving
path including PIL decode + canvas pack), C client threads each firing M
sequential requests at the service object; wall-clock spans first-request to
last-response. Sequential baseline: the same requests through
SearchService.query_image one at a time.

Gallery: 1M x 2048 bf16 clustered synthetic (flat index, qge1 re-rank — the
reference's serving configuration, online.py:148).

Usage: python scripts/measure_serving_throughput.py [--n 1000000] [--clients 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_images(directory: str, count: int, hw=(768, 1024)):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(count):
        arr = rng.integers(0, 255, (hw[0], hw[1], 3), np.uint8)
        p = os.path.join(directory, f"q{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    return paths


def main():
    import jax
    import jax.numpy as jnp

    from synth_data import clustered_db

    from image_search_engine_for_historical_research_tpu.index import build_flat
    from image_search_engine_for_historical_research_tpu.models import init_network
    from image_search_engine_for_historical_research_tpu.serving.app import (
        SearchService,
    )
    from image_search_engine_for_historical_research_tpu.serving.batching import (
        CoalescingService,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument(
        "--clients", type=lambda s: [int(x) for x in s.split(",")],
        default=[1, 2, 4, 8, 16, 32],
        help="comma list: one coalesced load test per concurrency level "
        "(the qps-vs-clients curve; saturation = where qps stops rising)",
    )
    p.add_argument("--per-client", type=int, default=4)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--image-size", type=int, default=1024)
    p.add_argument("--seq", type=int, default=8,
                   help="requests for the sequential baseline")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    model = init_network({"architecture": "resnet101"}, rng=jax.random.PRNGKey(0))
    db = clustered_db(jax.random.PRNGKey(1), args.n, 2048, dtype=jnp.bfloat16)
    index = build_flat(db, storage_dtype="bfloat16")
    paths = [f"img{i:07d}.jpg" for i in range(args.n)]
    # host gallery copy: zeros of the right shape (virtual pages — never
    # touched; the serving path reads only the device-resident copy, which
    # the shape-matched sharing rule takes from the index)
    svc = SearchService(
        model, index, np.zeros((args.n, 2048), np.float32), paths,
        K=100, scales=(1.0,), image_size=args.image_size, rerank="qge1",
    )
    assert svc._vecs_dev is index.vectors

    with tempfile.TemporaryDirectory() as td:
        # enough distinct images to fill the LARGEST slot, or the slot-N
        # warmup silently runs at a smaller slot and the first timed batch
        # at N pays the remote compile (measured: a 15.7 s p95 outlier)
        imgs = _make_images(td, min(args.max_batch, max(args.clients)))

        # warm both pipelines — every batch SLOT the coalescer can produce,
        # or the first timed batch at a new slot pays the remote compile
        # (~20-40 s through the tunnel) inside the measurement
        svc.query_image(imgs[0])
        for s in svc.BATCH_SLOTS:
            if s <= args.max_batch:
                svc.query_batch(imgs[:s])

        # sequential baseline (the reference's serving model)
        t0 = time.perf_counter()
        for i in range(args.seq):
            svc.query_image(imgs[i % len(imgs)])
        seq_s = time.perf_counter() - t0
        print(json.dumps({
            "stage": "sequential", "requests": args.seq,
            "qps": round(args.seq / seq_s, 1),
            "ms_per_request": round(seq_s / args.seq * 1e3, 1),
        }), flush=True)

        # coalesced concurrent load, one run per concurrency level
        for n_clients in args.clients:
            cs = CoalescingService(svc, max_batch=args.max_batch, max_wait_ms=3.0)
            lat = []
            lat_lock = threading.Lock()

            def client(ci):
                for r in range(args.per_client):
                    t = time.perf_counter()
                    cs.query_image(imgs[(ci + r) % len(imgs)])
                    dt = time.perf_counter() - t
                    with lat_lock:
                        lat.append(dt)

            threads = [
                threading.Thread(target=client, args=(ci,))
                for ci in range(n_clients)
            ]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            total = time.perf_counter() - t0
            n_req = n_clients * args.per_client
            lat = np.sort(np.asarray(lat))
            print(json.dumps({
                "stage": "coalesced", "N": args.n, "clients": n_clients,
                "requests": n_req, "max_batch": args.max_batch,
                "qps": round(n_req / total, 1),
                "p50_ms": round(float(lat[len(lat) // 2]) * 1e3, 1),
                "p95_ms": round(float(lat[int(len(lat) * 0.95)]) * 1e3, 1),
                "batches_run": cs.batches_run,
                "mean_batch": round(n_req / cs.batches_run, 2),
            }), flush=True)
            cs.close()


if __name__ == "__main__":
    main()
