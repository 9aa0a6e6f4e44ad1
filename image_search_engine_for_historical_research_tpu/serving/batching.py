"""Request coalescing (micro-batching) for the online service.

The reference serves strictly one query per request (Flask handler,
``/root/reference/src/online.py:107-159``); every stage of its pipeline is
per-query CPU/GPU work, so there is nothing to coalesce. On TPU the cost
model inverts: the exact scan over a 1M gallery is HBM-bound and costs almost
the same for 1 query as for 70 (BASELINE.md: 0.096 ms/q batched vs 5.9 ms
single), and batched extraction is ~2.2x the img/s of single dispatches —
so concurrent single-image requests SHOULD share one device program.

``CoalescingService`` wraps a ``SearchService`` with a dispatcher thread:
requests queue up, and whenever the device is free the dispatcher drains up
to ``max_batch`` of them into one ``SearchService.query_batch`` call (padded
to a fixed slot ladder so the whole serving path compiles a bounded number of
times). Under load the batch forms while the previous batch is on the device
— no artificial wait is needed (``max_wait_ms`` only smooths the idle->burst
edge); a lone request still dispatches immediately.

It exposes the same ``query_image`` interface, so ``make_wsgi_app`` works
unchanged; pair it with ``serve(..., threaded=True)`` so concurrent HTTP
requests actually reach the queue in parallel.
"""

from __future__ import annotations

import threading
import time
from typing import Optional


class _Pending:
    __slots__ = ("path", "event", "result", "error")

    def __init__(self, path: str):
        self.path = path
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None


class CoalescingService:
    """Micro-batching front for ``SearchService`` (same query interface).

    Attributes ``requests_served`` / ``batches_run`` expose the coalescing
    ratio (requests/batch > 1 under concurrent load).
    """

    def __init__(self, service, max_batch: int = 16, max_wait_ms: float = 3.0):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self._svc = service
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self._lock = threading.Condition()
        self._queue: list[_Pending] = []
        self._closed = False
        self.requests_served = 0
        self.batches_run = 0
        self._dispatcher = threading.Thread(
            target=self._run, name="serving-coalescer", daemon=True
        )
        self._dispatcher.start()

    # same duck-typed surface the WSGI app uses
    def __getattr__(self, name):
        return getattr(self._svc, name)

    def query_image(self, image_path: str):
        req = _Pending(image_path)
        with self._lock:
            if self._closed:
                raise RuntimeError("service is closed")
            self._queue.append(req)
            self._lock.notify_all()
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.result

    def close(self):
        with self._lock:
            self._closed = True
            self._lock.notify_all()
        self._dispatcher.join(timeout=5)

    def _run(self):
        while True:
            with self._lock:
                while not self._queue and not self._closed:
                    self._lock.wait()
                if self._closed and not self._queue:
                    return
                # brief coalescing window: let a burst accumulate, but never
                # hold a full batch (under sustained load the queue refills
                # while the device runs, so the window rarely matters)
                deadline = time.monotonic() + self.max_wait_s
                while len(self._queue) < self.max_batch:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0 or self._closed:
                        break
                    self._lock.wait(remaining)
                batch = self._queue[: self.max_batch]
                del self._queue[: len(batch)]
            try:
                out = self._svc.query_batch([r.path for r in batch])
                for req, res in zip(batch, out):
                    req.result = res
            except BaseException as e:  # propagate to every waiter
                for req in batch:
                    req.error = e
            finally:
                with self._lock:
                    self.batches_run += 1
                    self.requests_served += len(batch)
                for req in batch:
                    req.event.set()
