"""Tracing/profiling helpers (SURVEY.md §5 tracing subsystem).

The reference only has ad-hoc timeit timers (run_transformer_gengcn_cv.py:
129,187,231). Here: jax.profiler trace capture plus relay-aware step
timing — on this environment the TPU sits behind a network relay where
`block_until_ready` returns before device completion, so wall-clock step
costs must be measured with the chained-steps difference method
(see bench.py docstring).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_steps(step_fn: Callable, state, batch, rng_fn: Callable,
                n1: int = 10, n2: int = 30,
                check_finite: bool = True) -> float:
    """Per-step seconds via the chained-steps difference method.

    rng_fn(i) supplies the per-step rng. The canonical implementation of
    the relay-aware timing used by bench.py — keep edits here."""
    def run(n, state):
        t0 = time.perf_counter()
        loss = None
        for i in range(n):
            state, loss = step_fn(state, batch, rng_fn(i))
        if loss is not None:
            v = float(loss)
            if check_finite:
                assert v == v and abs(v) != float("inf"), \
                    f"non-finite loss {v}"
        return time.perf_counter() - t0, state

    _, state = run(1, state)                     # warmup / compile
    # relay RTT noise (~25 ms per fetch) can swamp a small (n2-n1) window
    # once steps get fast; widen the window until the estimate is stably
    # positive, then take the median of three difference estimates
    estimates = []
    for attempt in range(4):
        t1, state = run(n1, state)
        t2, state = run(n2, state)
        est = (t2 - t1) / (n2 - n1)
        if est > 0:
            estimates.append(est)
        if len(estimates) == 3:
            break
        if est <= 0:
            n1, n2 = n1 * 2, n2 * 2
    if not estimates:
        raise RuntimeError("timed_steps: non-positive step-time estimate "
                           "even after widening the timing window")
    estimates.sort()
    return estimates[len(estimates) // 2]


class EpochTimer:
    """Per-epoch wall timer matching the reference's logging fields."""

    def __init__(self):
        self.t0 = None
        self.history = []

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.history.append(time.perf_counter() - self.t0)
        return False

    @property
    def last(self) -> Optional[float]:
        return self.history[-1] if self.history else None
