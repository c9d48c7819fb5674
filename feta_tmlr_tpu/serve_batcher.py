"""Dynamic request batching for serving.

`Predictor.predict` batches within ONE call; under many concurrent
small requests (the typical online-serving regime) each caller would
dispatch its own under-filled batch and TPU utilization collapses. The
`DynamicBatcher` coalesces graphs from concurrent callers into shared
micro-batches: callers enqueue and block on a per-request future; a
background thread drains the queue, packing up to `max_batch` graphs or
waiting at most `max_wait_ms` for stragglers, runs ONE Predictor call,
and scatters the logits back.

    batcher = DynamicBatcher(predictor, max_wait_ms=2.0)
    logits = batcher.predict(graphs)          # thread-safe, blocking
    ...
    batcher.close()

Latency/throughput contract: a lone request waits at most max_wait_ms
beyond its own compute; at saturation every dispatch is a full batch.
Works unchanged behind serve_http (each HTTP handler thread calls
predict()).
"""

from __future__ import annotations

import queue
import threading
from typing import List, Sequence

import numpy as np


class _Slot:
    __slots__ = ("graphs", "event", "result", "error")

    def __init__(self, graphs):
        self.graphs = graphs
        self.event = threading.Event()
        self.result = None
        self.error = None


class DynamicBatcher:
    def __init__(self, predictor, max_wait_ms: float = 2.0,
                 max_batch: int = None):
        self.predictor = predictor
        self.max_wait = max_wait_ms / 1e3
        self.max_batch = max_batch or predictor.max_batch
        self._q: queue.Queue = queue.Queue()
        self._closed = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ---------------------------------------------------------- client API
    def predict(self, graphs: Sequence) -> np.ndarray:
        """Blocking predict; safe to call from many threads."""
        if self._closed:
            raise RuntimeError("batcher is closed")
        slot = _Slot(list(graphs))
        self._q.put(slot)
        slot.event.wait()
        if slot.error is not None:
            raise slot.error
        return slot.result

    def close(self):
        self._closed = True
        self._q.put(None)
        self._thread.join()

    # ---------------------------------------------------------- batch loop
    def _drain(self, first: _Slot) -> List[_Slot]:
        """Collect slots until max_batch graphs are pending or
        max_wait elapses."""
        import time
        slots = [first]
        total = len(first.graphs)
        deadline = time.perf_counter() + self.max_wait
        while total < self.max_batch:
            timeout = deadline - time.perf_counter()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)         # re-post the shutdown token
                break
            slots.append(nxt)
            total += len(nxt.graphs)
        return slots

    def _loop(self):
        while True:
            slot = self._q.get()
            if slot is None:
                break
            slots = self._drain(slot)
            merged = [g for s in slots for g in s.graphs]
            try:
                logits = self.predictor.predict(merged)
                off = 0
                for s in slots:
                    n = len(s.graphs)
                    s.result = logits[off: off + n]
                    off += n
            except Exception as e:        # pragma: no cover - surfaced
                for s in slots:
                    s.error = e
            finally:
                for s in slots:
                    s.event.set()
        # unblock any producers that raced the shutdown token
        while True:
            try:
                s = self._q.get_nowait()
            except queue.Empty:
                break
            if s is not None:
                s.error = RuntimeError("batcher closed")
                s.event.set()
