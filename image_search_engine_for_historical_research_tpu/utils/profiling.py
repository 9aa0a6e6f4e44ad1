"""Timing and device-trace utilities.

Counterpart of the reference's observability (SURVEY.md section 5): the
wall-clock ``time_per_query`` timers embedded in every matcher/re-ranker
(``nnsearch.py:699-705``, ``Reranking.py:214-264``) plus the vendored Lightning
``InferenceProfiler`` (``src/utils/src/utils/profiler.py``: cuda.synchronize
around actions). The TPU equivalents: a blocking timer that forces device
completion, and a ``jax.profiler`` trace context for real kernel timelines.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


def block(tree) -> Any:
    """Force device completion of every array in a pytree (the TPU analogue of
    torch.cuda.synchronize in the reference profiler)."""
    import jax

    return jax.block_until_ready(tree)


@dataclass
class Timer:
    """Accumulating named wall-clock timer.

    >>> t = Timer()
    >>> with t.time("search"):
    ...     pass
    >>> t.summary()["search"]["count"]
    1
    """

    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def time(self, name: str, sync_tree=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_tree is not None:
                block(sync_tree)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_s": self.totals[k] / self.counts[k],
            }
            for k in self.totals
        }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context: inspect kernels with tensorboard/xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """Append-only jsonl metrics log (the tensorboard-SummaryWriter stand-in;
    main_train.py:438-456 clears and rewrites event files — jsonl just appends
    and stays greppable)."""

    def __init__(self, path: str):
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path

    def log(self, step: int, **metrics):
        rec = {"step": step, "time": time.time(), **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, default=float) + "\n")

    def read(self) -> List[dict]:
        out = []
        try:
            with open(self.path) as f:
                for line in f:
                    out.append(json.loads(line))
        except FileNotFoundError:
            pass
        return out
