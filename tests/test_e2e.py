"""End-to-end pipeline tests: images on disk -> extraction -> index -> serve.

These drive the real CLI/service surfaces with a small model (resnet50 config)
over synthetic on-disk datasets — the test pyramid's integration layer the
reference never had (SURVEY.md section 4).
"""

import io
import json
import os
import sys

import numpy as np
import pytest

import image_search_engine_for_historical_research_tpu as isehr
from image_search_engine_for_historical_research_tpu.data import synthetic


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    db_paths, q_paths = synthetic.make_folder_dataset(
        str(root / "data"), n_classes=3, per_class=4, size=(64, 96), seed=0
    )
    return root, db_paths, q_paths


@pytest.fixture(scope="module")
def small_model(monkeypatch_module=None):
    from image_search_engine_for_historical_research_tpu.cli import common

    return common.load_network(None, "resnet50")


def _ensure_store(root, small_model, monkeypatch):
    """Build the feature store + index once (idempotent) so service tests can
    run standalone, not only after the offline CLI test."""
    if os.path.exists(root / "outputs" / "db" / "hnsw" / "manifest.json"):
        return
    from image_search_engine_for_historical_research_tpu.cli import common, offline

    monkeypatch.setattr(common, "load_network", lambda *a, **k: small_model)
    monkeypatch.setattr(offline, "load_network", lambda *a, **k: small_model)
    assert offline.main([
        "--datasets", "db",
        "--data-root", str(root / "data"),
        "--matching-method", "HNSW",
        "--ifgenerate",
        "--outputs", str(root / "outputs"),
        "--image-size", "96",
        "--multiscale", "[1]",
        "--batch-size", "4",
    ]) == 0


def test_offline_cli_quantizer_flags():
    """--opq [refine] and --refine-m reach the matcher kwargs unchanged."""
    from image_search_engine_for_historical_research_tpu.cli import common, offline

    base = ["--datasets", "db", "--data-root", "/tmp",
            "--matching-method", "IVFPQ"]
    args = offline.build_parser().parse_args(base + ["--opq", "refine",
                                                      "--refine-m", "8"])
    kw = offline._matcher_kwargs(args, "db")
    assert kw["opq"] == "refine" and kw["refine_M"] == 8
    args = offline.build_parser().parse_args(base + ["--opq"])
    kw = offline._matcher_kwargs(args, "db")
    assert kw["opq"] is True and "refine_M" not in kw
    args = offline.build_parser().parse_args(base)
    kw = offline._matcher_kwargs(args, "db")
    assert kw["opq"] is False and "refine_M" not in kw


def test_offline_cli_builds_store_and_index(workspace, small_model, monkeypatch):
    from image_search_engine_for_historical_research_tpu.cli import common, offline

    root, db_paths, q_paths = workspace
    monkeypatch.setattr(common, "load_network", lambda *a, **k: small_model)
    monkeypatch.setattr(offline, "load_network", lambda *a, **k: small_model)
    rc = offline.main([
        "--datasets", "db",
        "--data-root", str(root / "data"),
        "--matching-method", "HNSW",
        "--ifgenerate",
        "--outputs", str(root / "outputs"),
        "--image-size", "96",
        "--multiscale", "[1]",
        "--batch-size", "4",
    ])
    assert rc == 0
    assert os.path.exists(root / "outputs" / "features" / "db_path_feature.npz")
    assert os.path.exists(root / "outputs" / "db" / "hnsw" / "manifest.json")


def test_online_service_query(workspace, small_model, monkeypatch):
    from image_search_engine_for_historical_research_tpu.cli import online
    from image_search_engine_for_historical_research_tpu.serving.app import (
        make_wsgi_app,
    )

    root, db_paths, q_paths = workspace
    _ensure_store(root, small_model, monkeypatch)
    monkeypatch.setattr(online, "load_network", lambda *a, **k: small_model)

    args = online.build_parser().parse_args([
        "--datasets", "db",
        "--data-root", str(root / "data"),
        "--matching-method", "HNSW",
        "--outputs", str(root / "outputs"),
        "--image-size", "96",
        "--multiscale", "[1]",
        "--K", "5",
    ])
    service = online.make_service(args)
    app = make_wsgi_app(service)

    # POST a real query image through the WSGI surface
    with open(q_paths[0], "rb") as f:
        payload = f.read()
    environ = {
        "REQUEST_METHOD": "POST",
        "CONTENT_TYPE": "image/jpeg",
        "CONTENT_LENGTH": str(len(payload)),
        "wsgi.input": io.BytesIO(payload),
        "HTTP_ACCEPT": "application/json",
    }
    status_headers = {}

    def start_response(status, headers):
        status_headers["status"] = status

    body = b"".join(app(environ, start_response))
    assert status_headers["status"] == "200 OK"
    out = json.loads(body)
    assert len(out["results"]) == 5
    # top hit should be the query's own class (class0 queries hit class0 db)
    assert "class0" in out["results"][0]["path"]
    assert out["timing"]["extract_s"] > 0

    # one device-resident gallery: the service must share the index's copy,
    # not hold a second (8 GB at 1M; VERDICT r2 weak #7)
    assert service._vecs_dev is service.index.vectors

    # HTML response renders the uploaded image + result thumbnails
    environ_html = {
        "REQUEST_METHOD": "POST",
        "CONTENT_TYPE": "image/jpeg",
        "CONTENT_LENGTH": str(len(payload)),
        "wsgi.input": io.BytesIO(payload),
        "HTTP_ACCEPT": "text/html",
    }
    body = b"".join(app(environ_html, start_response))
    assert status_headers["status"] == "200 OK"
    assert b"data:image/jpeg;base64" in body  # echoed query image
    assert body.count(b'<img src="/image/') == 5  # top-K thumbnails

    # the /image/<id> static route serves the real gallery file bytes
    img_id = out["results"][0]["id"]
    environ_img = {
        "REQUEST_METHOD": "GET",
        "PATH_INFO": f"/image/{img_id}",
        "wsgi.input": io.BytesIO(b""),
    }
    img_body = b"".join(app(environ_img, start_response))
    assert status_headers["status"] == "200 OK"
    with open(service.resolve_image_path(img_id), "rb") as f:
        assert img_body == f.read()
    # out-of-range id is a 404, not a crash
    environ_404 = {
        "REQUEST_METHOD": "GET",
        "PATH_INFO": "/image/999999",
        "wsgi.input": io.BytesIO(b""),
    }
    b"".join(app(environ_404, start_response))
    assert status_headers["status"].startswith("404")

    # GET returns the upload form
    environ_get = {"REQUEST_METHOD": "GET", "wsgi.input": io.BytesIO(b"")}
    body = b"".join(app(environ_get, start_response))
    assert b"<form" in body

    # garbage upload is a 400, not a crash
    environ_bad = {
        "REQUEST_METHOD": "POST",
        "CONTENT_TYPE": "text/plain",
        "CONTENT_LENGTH": "3",
        "wsgi.input": io.BytesIO(b"abc"),
    }
    body = b"".join(app(environ_bad, start_response))
    assert status_headers["status"].startswith("400")


def test_online_service_diffusion_rerank(workspace, small_model, monkeypatch):
    """Serving with rerank='diffusion': the random-walk pass seeded from the
    index shortlist (the reference only diffuses in its evaluation path,
    Reranking.py:233-265 — never in online.py serving)."""
    import jax.numpy as jnp

    from image_search_engine_for_historical_research_tpu.cli import online
    from image_search_engine_for_historical_research_tpu.rerank.diffusion import (
        build_diffusion_offline,
    )

    root, db_paths, q_paths = workspace
    _ensure_store(root, small_model, monkeypatch)
    monkeypatch.setattr(online, "load_network", lambda *a, **k: small_model)
    args = online.build_parser().parse_args([
        "--datasets", "db",
        "--data-root", str(root / "data"),
        "--matching-method", "L2",
        "--outputs", str(root / "outputs"),
        "--image-size", "96",
        "--multiscale", "[1]",
        "--K", "5",
    ])
    service = online.make_service(args)
    n = service.vecs.shape[0]
    off_dev = build_diffusion_offline(
        jnp.asarray(service.vecs), n_trunc=min(8, n), kd=min(6, n)
    )
    off_host = build_diffusion_offline(
        jnp.asarray(service.vecs), n_trunc=min(8, n), kd=min(6, n), host_out=True
    )

    service.rerank = "diffusion"
    for off in (off_dev, off_host):
        service.diffusion_offline = off
        results, timing = service.query_image(q_paths[0])
        assert len(results) == 5
        assert "class0" in results[0]["path"]
        assert timing["rerank_s"] >= 0

    with pytest.raises(ValueError, match="diffusion_offline"):
        online_kwargs = dict(
            model=service.model, index=service.index,
            gallery_vecs=service.vecs, gallery_paths=service.paths,
            rerank="diffusion",
        )
        type(service)(**online_kwargs)
    with pytest.raises(ValueError, match="rerank mode"):
        type(service)(
            model=service.model, index=service.index,
            gallery_vecs=service.vecs, gallery_paths=service.paths,
            rerank="bogus",
        )


def test_query_batch_matches_sequential(workspace, small_model, monkeypatch):
    """query_batch (the coalesced serving path) returns the same ranked ids
    as query_image per path, in every rerank mode."""
    import jax.numpy as jnp

    from image_search_engine_for_historical_research_tpu.cli import online
    from image_search_engine_for_historical_research_tpu.rerank.diffusion import (
        build_diffusion_offline,
    )

    root, db_paths, q_paths = workspace
    _ensure_store(root, small_model, monkeypatch)
    monkeypatch.setattr(online, "load_network", lambda *a, **k: small_model)
    args = online.build_parser().parse_args([
        "--datasets", "db",
        "--data-root", str(root / "data"),
        "--matching-method", "L2",
        "--outputs", str(root / "outputs"),
        "--image-size", "96",
        "--multiscale", "[1]",
        "--K", "5",
    ])
    service = online.make_service(args)
    n = service.vecs.shape[0]
    off = build_diffusion_offline(
        np.asarray(service.vecs), n_trunc=min(8, n), kd=min(6, n)
    )
    for mode, artifact in ((None, None), ("qge1", None), ("diffusion", off)):
        service.rerank = mode
        service.diffusion_offline = artifact
        seq = [service.query_image(p) for p in q_paths]
        got = service.query_batch(list(q_paths))
        assert len(got) == len(q_paths)
        for (r_seq, _), (r_bat, t_bat) in zip(seq, got):
            assert [x["id"] for x in r_bat] == [x["id"] for x in r_seq], mode
        assert got[0][1]["batch"] == len(q_paths)
    assert service.query_batch([]) == []


def test_query_batch_runs_stages_at_slot_shape(workspace, small_model, monkeypatch):
    """Search/rerank must run at the padded SLOT batch shape: slicing to the
    raw B first would compile those programs once per distinct concurrency
    level (defeating the BATCH_SLOTS padding)."""
    from image_search_engine_for_historical_research_tpu.cli import online

    root, db_paths, q_paths = workspace
    _ensure_store(root, small_model, monkeypatch)
    monkeypatch.setattr(online, "load_network", lambda *a, **k: small_model)
    args = online.build_parser().parse_args([
        "--datasets", "db",
        "--data-root", str(root / "data"),
        "--matching-method", "L2",
        "--outputs", str(root / "outputs"),
        "--image-size", "96",
        "--multiscale", "[1]",
        "--K", "5",
    ])
    service = online.make_service(args)
    seen = []
    real_search = service.index.search

    class SpyIndex:
        def search(self, q, k):
            seen.append(int(q.shape[0]))
            return real_search(q, k)

    service.index = SpyIndex()
    B = 3  # not a slot size; the next slot is 4
    service.query_batch((list(q_paths) * B)[:B])
    assert seen == [4], seen


def test_coalescing_service_concurrent(workspace, small_model, monkeypatch):
    """Concurrent query_image calls through CoalescingService coalesce into
    fewer device batches and return per-request results identical to the
    direct service."""
    import threading

    from image_search_engine_for_historical_research_tpu.cli import online
    from image_search_engine_for_historical_research_tpu.serving.batching import (
        CoalescingService,
    )

    root, db_paths, q_paths = workspace
    _ensure_store(root, small_model, monkeypatch)
    monkeypatch.setattr(online, "load_network", lambda *a, **k: small_model)
    args = online.build_parser().parse_args([
        "--datasets", "db",
        "--data-root", str(root / "data"),
        "--matching-method", "L2",
        "--outputs", str(root / "outputs"),
        "--image-size", "96",
        "--multiscale", "[1]",
        "--K", "5",
    ])
    service = online.make_service(args)
    expected = {p: [x["id"] for x in service.query_image(p)[0]] for p in q_paths}

    cs = CoalescingService(service, max_batch=8, max_wait_ms=200.0)
    # the wrapper keeps the SearchService surface (WSGI app compatibility)
    assert cs.K == service.K
    assert cs.resolve_image_path(0) == service.resolve_image_path(0)

    reqs = [p for p in q_paths for _ in range(2)]  # 6 concurrent requests
    out = {}
    errs = []

    def worker(i, p):
        try:
            results, timing = cs.query_image(p)
            out[i] = (p, [x["id"] for x in results], timing)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [
        threading.Thread(target=worker, args=(i, p)) for i, p in enumerate(reqs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs
    assert len(out) == len(reqs)
    for i, p in enumerate(reqs):
        assert out[i][1] == expected[p], p
    # coalescing actually happened: fewer device batches than requests
    assert cs.requests_served == len(reqs)
    assert cs.batches_run < len(reqs)
    cs.close()
    with pytest.raises(RuntimeError, match="closed"):
        cs.query_image(q_paths[0])


def test_benchmark_cli_revisited_protocol(workspace, small_model, monkeypatch, capsys):
    from image_search_engine_for_historical_research_tpu.cli import benchmark
    from image_search_engine_for_historical_research_tpu.data import datasets as ds_mod

    root, *_ = workspace
    synthetic.make_revisited_dataset(
        str(root / "rdata"), "roxford5k", n_classes=3, per_class=4, size=(64, 96)
    )
    monkeypatch.setattr(benchmark, "load_network", lambda *a, **k: small_model)
    rc = benchmark.main([
        "--datasets", "roxford5k",
        "--data-root", str(root / "rdata"),
        "--outputs", str(root / "outputs_bench"),
        "--image-size", "96",
        "--multiscale", "[1]",
        "--matching-method", "L2",
        "--mode", "mAP",
        "--qge",
        "--batch-size", "4",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mAP E" in out
    assert "after alphaQE" in out
    # random-weights model on easy color-separated classes should retrieve well
    first_map = float(out.split("mAP E: ")[1].split(",")[0])
    assert first_map > 50.0


def test_custom_cli(workspace, small_model, monkeypatch, capsys):
    from image_search_engine_for_historical_research_tpu.cli import test_custom

    root, db_paths, q_paths = workspace
    monkeypatch.setattr(test_custom, "load_network", lambda *a, **k: small_model)
    rc = test_custom.main([
        "--db-dir", str(root / "data" / "db"),
        "--query-dir", str(root / "data" / "q"),
        "--image-size", "96",
        "--multiscale", "[1]",
        "--K", "4",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "custom mAP" in out


def test_custom_cli_save_ranks(workspace, small_model, monkeypatch, capsys):
    """--save-ranks persists the full per-query ranking (the reference's
    rank_res pickle, /root/reference/src/test_custom.py:38-44) as json+npz
    plus an HTML contact sheet; the artifact round-trips and matches the
    printed ranking."""
    import json

    from image_search_engine_for_historical_research_tpu.cli import test_custom
    from image_search_engine_for_historical_research_tpu.data import path_all_jpg
    from image_search_engine_for_historical_research_tpu.evaluation.ranks import (
        load_ranked_results,
    )

    root, db_paths, q_paths = workspace
    outputs = root / "outputs_ranks"
    rc = None
    monkeypatch.setattr(test_custom, "load_network", lambda *a, **k: small_model)
    rc = test_custom.main([
        "--db-dir", str(root / "data" / "db"),
        "--query-dir", str(root / "data" / "q"),
        "--image-size", "96",
        "--multiscale", "[1]",
        "--K", "4",
        "--outputs", str(outputs),
        "--save-ranks", "--html-sheet",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ranked results" in out

    rank_dir = outputs / "ranks"
    ranks, qp, dp = load_ranked_results(str(rank_dir))
    exp_db, _ = path_all_jpg(str(root / "data" / "db"))
    exp_q, _ = path_all_jpg(str(root / "data" / "q"))
    assert list(qp) == [str(p) for p in exp_q]
    assert list(dp) == [str(p) for p in exp_db]
    assert ranks.shape == (len(exp_q), 4)
    assert ranks.min() >= 0 and ranks.max() < len(exp_db)

    # the json mapping mirrors the reference's {query: [ranked db paths]}
    with open(rank_dir / "custom_ranking_result.json") as f:
        manifest = json.load(f)
    for q, row in zip(qp, ranks):
        assert manifest["ranking"][q] == [dp[j] for j in row]

    sheet = rank_dir / "custom_ranking_result.html"
    text = sheet.read_text()
    assert text.count("<tr>") == len(exp_q)
    import os as _os
    assert _os.path.basename(exp_db[int(ranks[0, 0])]) in text


def test_coalescing_pipeline_overlaps_host_and_device():
    """The two-stage dispatcher overlaps prepare (host) with execute
    (device): wall clock for N batches ~ p + N*e, not N*(p+e)."""
    import time as _time

    from image_search_engine_for_historical_research_tpu.serving.batching import (
        CoalescingService,
    )

    P, E, NB = 0.12, 0.12, 4

    class StubService:
        def prepare_batch(self, paths):
            _time.sleep(P)
            return {"paths": list(paths)}

        def execute_batch(self, prepared):
            _time.sleep(E)
            return [(p, {}) for p in prepared["paths"]]

    cs = CoalescingService(StubService(), max_batch=1, max_wait_ms=0.0,
                           pipeline=True)
    t0 = _time.perf_counter()
    import threading

    outs = []
    ts = [threading.Thread(target=lambda i=i: outs.append(
        cs.query_image(f"p{i}"))) for i in range(NB)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = _time.perf_counter() - t0
    cs.close()
    assert len(outs) == NB
    # serial would be NB*(P+E) = 0.96 s; pipelined ~ P + NB*E = 0.6 s
    assert wall < NB * (P + E) - 0.5 * P, wall
    assert cs.batches_run == NB


def test_coalescing_isolates_bad_requests():
    """One corrupt upload must not fail the other coalesced requests: the
    dispatcher probes decodes individually and only the offender errors."""
    import threading

    from image_search_engine_for_historical_research_tpu.serving.batching import (
        CoalescingService,
    )

    class StubService:
        def prepare_batch(self, paths):
            if any("bad" in p for p in paths):
                raise ValueError(f"decode failed: {paths}")
            return {"paths": list(paths)}

        def execute_batch(self, prepared):
            return [(p, {"ok": True}) for p in prepared["paths"]]

    cs = CoalescingService(StubService(), max_batch=8, max_wait_ms=150.0)
    results, errors = {}, {}

    def go(p):
        try:
            results[p] = cs.query_image(p)
        except Exception as e:
            errors[p] = e

    paths = ["good1", "bad", "good2", "good3"]
    ts = [threading.Thread(target=go, args=(p,)) for p in paths]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    cs.close()
    assert set(errors) == {"bad"}
    assert isinstance(errors["bad"], ValueError)
    assert set(results) == {"good1", "good2", "good3"}
    for p in ("good1", "good2", "good3"):
        assert results[p][1] == {"ok": True}


def test_extract_1m_cli_resume_and_native_loader(small_model, monkeypatch, tmp_path):
    """The distractor-extraction CLI (extract_1m.py parity): revisitop1m-style
    imlist, checkpointed resume, and the native threaded loader."""
    from PIL import Image

    from image_search_engine_for_historical_research_tpu.cli import extract_1m

    # revisitop1m layout: <root>/revisitop1m/revisitop1m.txt + jpg/<name>.jpg
    root = tmp_path / "1m"
    jpgdir = root / "revisitop1m" / "jpg"
    os.makedirs(jpgdir)
    rng = np.random.default_rng(0)
    names = []
    for i in range(6):
        nm = f"d{i}.jpg"  # revisitop1m imlist lines carry the extension
        arr = rng.integers(0, 255, (64, 80, 3)).astype(np.uint8)
        Image.fromarray(arr).save(jpgdir / nm)
        names.append(nm)
    with open(root / "revisitop1m" / "revisitop1m.txt", "w") as f:
        f.write("\n".join(names))

    monkeypatch.setattr(extract_1m, "load_network", lambda *a, **k: small_model)
    out = tmp_path / "out"
    common_args = [
        "--data-root", str(root),
        "--outputs", str(out),
        "--image-size", "64",
        "--multiscale", "[1]",
        "--batch-size", "2",
        "--checkpoint-every", "4",
        "--loader", "native",
    ]
    # full run: completes, stores the feature file, removes the checkpoint
    assert extract_1m.main(common_args) == 0
    from image_search_engine_for_historical_research_tpu.data import (
        load_path_features,
    )

    vecs, rel = load_path_features("revisitop1m", root=str(out))
    assert vecs.shape[0] == 6 and len(rel) == 6
    assert not os.path.exists(out / "revisitop1m_partial.npz")

    # resume: pre-seed a partial checkpoint with sentinel rows for the first
    # 4 images; the rerun must keep them verbatim (no re-extraction) and only
    # extract the remaining 2
    sentinel = np.full((6, vecs.shape[1]), 0.125, np.float32)
    np.savez(out / "revisitop1m_partial.npz", vecs=sentinel, done=4)
    assert extract_1m.main(common_args) == 0
    vecs2, _ = load_path_features("revisitop1m", root=str(out))
    np.testing.assert_allclose(vecs2[:4], sentinel[:4], atol=1e-6)
    np.testing.assert_allclose(vecs2[4:], vecs[4:], atol=1e-5)

    # sharded (beyond-host-RAM) mode: per-chunk shard files instead of one
    # (N, D) buffer; the chunk source feeds the streaming index builders
    assert extract_1m.main(common_args + ["--shard-size", "4"]) == 0
    from image_search_engine_for_historical_research_tpu.data import (
        chunked_feature_relpaths,
        chunked_feature_source,
        shard_resume_point,
        store,
    )

    chunks_fn, n = chunked_feature_source("revisitop1m", root=str(out))
    assert n == 6
    np.testing.assert_allclose(
        np.concatenate(list(chunks_fn())), vecs, atol=1e-5
    )
    assert chunked_feature_relpaths("revisitop1m", root=str(out)) == names

    # resume: drop the tail shard; the rerun re-extracts only rows 4..6
    shards = store._list_shards("revisitop1m", str(out))
    os.remove(shards[-1][2])
    assert shard_resume_point("revisitop1m", root=str(out)) == 4
    assert extract_1m.main(common_args + ["--shard-size", "4"]) == 0
    chunks_fn, n = chunked_feature_source("revisitop1m", root=str(out))
    assert n == 6
    np.testing.assert_allclose(
        np.concatenate(list(chunks_fn())), vecs, atol=1e-5
    )
