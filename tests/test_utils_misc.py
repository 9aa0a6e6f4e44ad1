import json
import os

import numpy as np
import pytest

from image_search_engine_for_historical_research_tpu.utils import MetricsLogger, Timer
from image_search_engine_for_historical_research_tpu.data import download


class TestTimer:
    def test_accumulates(self):
        t = Timer()
        with t.time("a"):
            pass
        with t.time("a"):
            pass
        s = t.summary()
        assert s["a"]["count"] == 2
        assert s["a"]["total_s"] >= 0

    def test_sync_tree(self):
        import jax.numpy as jnp

        t = Timer()
        with t.time("matmul", sync_tree=None):
            x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
        with t.time("forced", sync_tree=x):
            pass
        assert "forced" in t.summary()


class TestMetricsLogger:
    def test_roundtrip(self, tmp_path):
        log = MetricsLogger(str(tmp_path / "m.jsonl"))
        log.log(0, loss=1.5)
        log.log(1, loss=1.2, map=0.7)
        recs = log.read()
        assert len(recs) == 2
        assert recs[1]["map"] == 0.7

    def test_missing_file_reads_empty(self, tmp_path):
        log = MetricsLogger(str(tmp_path / "none.jsonl"))
        assert log.read() == []


class TestDownload:
    def test_offline_failure_is_clean(self, tmp_path, monkeypatch):
        # no egress in this environment: the downloader must fail loudly and
        # leave no partial files
        monkeypatch.setenv("PATH", "")  # no wget at all
        with pytest.raises(RuntimeError, match="download failed"):
            download._wget("http://example.com/x.tgz", str(tmp_path / "x.tgz"))
        assert not os.path.exists(tmp_path / "x.tgz")
        assert not os.path.exists(str(tmp_path / "x.tgz") + ".part")

    def test_skips_existing(self, tmp_path):
        p = tmp_path / "have.tgz"
        p.write_bytes(b"data")
        assert download._wget("http://example.com/have.tgz", str(p)) == str(p)
        assert p.read_bytes() == b"data"

    def test_url_tables_cover_datasets(self):
        assert set(download.GND_FILES) == {"roxford5k", "rparis6k"}
        for ds in ("oxford5k", "paris6k", "roxford5k", "rparis6k"):
            assert download.TEST_IMAGE_ARCHIVES[ds]
