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


# Peak spec sheet per TPU generation: (dense bf16 FLOP/s, HBM bytes/s).
# Public numbers (cloud.google.com/tpu/docs/system-architecture); MFU is
# always reported against the bf16 matmul peak — f32 programs will show
# proportionally lower utilization, which is the honest reading.
_TPU_PEAKS = {
    "v5e": (197e12, 819e9), "v5 lite": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6e": (918e12, 1640e9), "v6 lite": (918e12, 1640e9),
    "v3": (123e12, 900e9),
}


def device_peaks(device=None):
    """(bf16_flops, hbm_bytes_per_s) for the device, or None if unknown."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peaks in _TPU_PEAKS.items():
        if key in kind:
            return peaks
    return None


def mfu_fields(jitted_fn, *args, sec_per_step=None, prefix=""):
    """Mechanized speed-of-light accounting for one compiled program.

    Two byte accountings, calibrated per the round-4 review (the old
    single `hbm_bw_util` read up to 2.05 — cost-model "bytes accessed"
    counts every operand touch including VMEM-resident re-reads, so it is
    NOT HBM traffic):

    - `bytes_accessed_per_step` — XLA cost model
      (`compile().cost_analysis()["bytes accessed"]`), VMEM-inclusive
      operand traffic. Useful as a fusion/amplification indicator only.
    - `hbm_bytes_lb_per_step` — buffer-assignment lower bound from
      `compile().memory_analysis()`: argument + output + temp buffer
      bytes. Every one of those buffers lives in HBM and is touched at
      least once per step, so `hbm_bw_util` derived from it cannot read
      above 1.0 for a correctly timed step. It is a LOWER bound (buffers
      re-streamed k times count once), so a util near 1.0 proves a true
      bandwidth ceiling while a low util does not rule one out.

    With `sec_per_step` also derives achieved TFLOP/s, model-FLOPs
    utilization vs the chip's bf16 peak, `hbm_bw_util` (lower-bound
    traffic / peak HBM BW — calibrated, <=1.0), and
    `vmem_amplification` (= bytes_accessed / hbm_lb: how many times the
    average byte is re-touched from on-chip memory).
    Returns {} when the backend exposes no cost analysis (never raises) —
    bench output then simply omits the fields rather than guessing.
    """
    try:
        compiled = jitted_fn.lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        bytes_acc = float(cost.get("bytes accessed", 0.0))
    except Exception:
        return {}
    hbm_lb = 0.0
    try:
        ma = compiled.memory_analysis()
        hbm_lb = float(ma.argument_size_in_bytes
                       + ma.output_size_in_bytes
                       + ma.temp_size_in_bytes)
    except Exception:
        pass
    if flops <= 0:
        return {}
    out = {f"{prefix}flops_per_step": flops}
    if bytes_acc > 0:
        out[f"{prefix}bytes_accessed_per_step"] = bytes_acc
        out[f"{prefix}arithmetic_intensity"] = round(flops / bytes_acc, 2)
    if hbm_lb > 0:
        out[f"{prefix}hbm_bytes_lb_per_step"] = hbm_lb
        if bytes_acc > 0:
            out[f"{prefix}vmem_amplification"] = round(bytes_acc / hbm_lb,
                                                       2)
    if sec_per_step:
        out.update(derive_rates(out, sec_per_step, prefix))
    return out


# Session-measured streaming bandwidth (set by hbm_copy_roofline). The
# spec table above is a floor, not ground truth: on 2026-08-20 the loop-
# fused copy measured 883 GB/s on a chip whose table entry said 819 —
# dividing by the stale spec made a *copy* read "util 1.08". Every
# hbm_bw_util therefore divides by max(spec, measured copy BW), so a
# reading of 1.0 means "as fast as the fastest pure copy this session"
# and can never exceed it.
_MEASURED_HBM_GBPS: float | None = None


def hbm_peak_bytes_per_s() -> float | None:
    """The working HBM peak: spec-table value, raised to the measured
    copy roofline when that (more trustworthy) number is higher."""
    peaks = device_peaks()
    if peaks is None:
        return None
    spec = peaks[1]
    if _MEASURED_HBM_GBPS is not None:
        return max(spec, _MEASURED_HBM_GBPS * 1e9)
    return spec


def derive_rates(mfu: dict, sec_per_step: float, prefix: str = "") -> dict:
    """Rate fields once the step time is measured (shared by bench.py and
    bench_tiers.py): achieved TFLOP/s, MFU vs bf16 peak, and the
    calibrated `hbm_bw_util` (lower-bound HBM traffic / working peak BW,
    see hbm_peak_bytes_per_s)."""
    out = {}
    flops = mfu.get(f"{prefix}flops_per_step")
    if not flops or sec_per_step <= 0:
        return out
    out[f"{prefix}achieved_tflops"] = round(flops / sec_per_step / 1e12, 3)
    peaks = device_peaks()
    if peaks:
        out[f"{prefix}mfu_vs_bf16_peak"] = round(
            flops / sec_per_step / peaks[0], 4)
        hbm_lb = mfu.get(f"{prefix}hbm_bytes_lb_per_step")
        peak_bw = hbm_peak_bytes_per_s()
        if hbm_lb and peak_bw:
            out[f"{prefix}hbm_bw_util"] = round(
                hbm_lb / sec_per_step / peak_bw, 4)
    return out


def hbm_copy_roofline(n_mb: int = 256, n1: int = 4, n2: int = 16) -> dict:
    """Known-roofline HBM copy microbench grounding the spec-sheet peak.

    Times `y = x + 1` over an `n_mb`-MB f32 array (far beyond VMEM, so
    each step streams n_mb read + n_mb write from/to HBM = 2*n_mb of
    true DRAM traffic) with the same chained-difference method as every
    other measurement here. The measured bandwidth becomes the session's
    working HBM peak when it exceeds the spec-table entry (see
    hbm_peak_bytes_per_s), so every later `hbm_bw_util` is read against
    a ceiling a real kernel demonstrably reached — a fused model step
    cannot beat it, and no util field can exceed 1.0.
    `hbm_copy_vs_spec` is the measured/spec ratio (may exceed 1 when the
    spec table is conservative for this part — that is a statement about
    the table, not a >100% utilization).

    The k copy passes run inside ONE on-device `fori_loop` program, so
    per-dispatch overhead (the device relay's per-call RTT is comparable
    to one 256 MB pass at peak) is paid once per measurement, not once
    per pass — the first cut of this anchor dispatched each pass
    separately and read 0.47 where the loop version reads the true
    streaming ceiling. The loop body is `b + 1` (data-dependent, and a
    bounds-checked while-loop XLA does not algebraically collapse), each
    trip streaming n_mb read + n_mb write of true DRAM traffic."""
    import jax.numpy as jnp
    from jax import lax

    n = int(n_mb * 1e6 / 4)
    x = jnp.arange(n, dtype=jnp.float32)
    big_step = jax.jit(
        lambda buf, k: lax.fori_loop(0, k, lambda i, b: b + 1.0, buf),
        donate_argnums=(0,))

    def run(k, buf):
        t0 = time.perf_counter()
        buf = big_step(buf, k)
        float(buf[0])
        return time.perf_counter() - t0, buf

    _, buf = run(1, x)                              # compile + warm
    t1, buf = run(n1, buf)
    t2, buf = run(n2, buf)
    sec = (t2 - t1) / (n2 - n1)
    if sec <= 0:
        return {}
    gbps = 2 * n_mb / 1e3 / sec
    global _MEASURED_HBM_GBPS
    _MEASURED_HBM_GBPS = gbps
    out = {"hbm_copy_gbps": round(gbps, 1)}
    peaks = device_peaks()
    if peaks:
        out["hbm_spec_gbps"] = round(peaks[1] / 1e9, 1)
        out["hbm_copy_vs_spec"] = round(gbps * 1e9 / peaks[1], 4)
        out["hbm_peak_gbps_used"] = round(
            hbm_peak_bytes_per_s() / 1e9, 1)
    return out


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


def enable_persistent_compile_cache(path: str = "/tmp/feta_jax_cache",
                                    min_compile_secs: float = 1.0) -> bool:
    """Persist compiled XLA executables across processes.

    Behind the device relay a single jitted program takes 1-10 minutes to
    compile; the on-disk cache makes every later process that traces the
    same program (bench re-runs, serving restarts, resumed soaks) load it
    in seconds instead. Safe to call on any backend; returns False if the
    running JAX build rejects the config (cache disabled, nothing else
    changes). Auto-enabled when FETA_COMPILE_CACHE is set in the
    environment (see feta_tmlr_tpu/__init__.py).
    """
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        jax.config.update("jax_enable_compilation_cache", True)
        return True
    except Exception:
        return False
