"""Global runtime toggles."""

from __future__ import annotations

import os

# Fused Pallas modulation kernel inside attention layers.
# Default OFF: at the reference's shapes (N=48, H=8, B=128) the original
# (B, H) grid of tiny [N, N] programs measured ~12.7 ms/step vs ~8 ms for
# the XLA-fused chain (grid overhead); after regridding to (B,) with all
# heads per program it reaches parity (7.0-7.8 ms A/B, within session
# noise). The fully fused flash-style kernel (fused_attention.py, zero
# [H, N, N] HBM traffic, in-kernel MXU dots) measured 11.6 ms vs 6.5-8.5
# for XLA at these shapes: the step is MXU-efficiency-bound and XLA's
# (B*H)-batched matmuls beat sequential per-head in-kernel dots. Both
# kernels stay opt-in (FETA_PALLAS=1); they should win for large-N
# workloads where each [H, N, N] tile is substantial work. Measured at
# the SBM shape (N=128, B=32, bf16 policy, interleaved 2x each,
# 2026-08-17): XLA 4.2/6.8 ms/step vs Pallas 7.7/6.5 — neutral within
# the relay's session noise, so the default stays off there too. Under
# FETA_COMPUTE_DTYPE=bfloat16 the kernels take bf16 xa/x/vw (MXU dots in
# bf16, f32 accumulators/softmax; aux operands stay f32 — Mosaic cannot
# lower 1x1 bf16 scalar extracts).
# Auto threshold: with FETA_PALLAS unset, the Pallas kernels (the
# query/key-blocked flash kernel on need_heads=False layers, the
# query-row-tiled modulation kernel on need_heads=True layers) turn on
# for padded node counts >= this. Measured on-chip crossover
# (2026-08-18, examples/pallas_largen_ab.py, both kernels on, SBM train
# step, bf16, interleaved): XLA 3.70/4.59/9.98/13.49 ms vs Pallas
# 7.78/4.51/7.01/12.51 at N=256/512/1024/2048 — Pallas loses 2x at 256,
# ties at 512, wins 1.42x at 1024 and 1.08x at 2048 (the round-2
# N>=1024 compile failure was the untiled modulation kernel's scoped
# VMEM, fixed 2026-08-18). Crossover = 1024. FETA_PALLAS=1/0
# force-overrides either way.
PALLAS_AUTO_N = int(os.environ.get("FETA_PALLAS_AUTO_N", "1024"))


def _on_accelerator() -> bool:
    import jax
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def use_pallas_modulation(n: int = 0) -> bool:
    """Whether the Pallas fused-attention path should run for a layer
    whose padded node count is `n` (0 = unknown). Env is re-read per
    call (trace time), so in-process A/Bs can toggle it."""
    env = os.environ.get("FETA_PALLAS")
    if env == "0":
        return False
    if env == "1":
        return _on_accelerator()
    return n >= PALLAS_AUTO_N and _on_accelerator()


# Mixed-precision compute dtype for the transformer/FeTA hot path.
# Default f32. FETA_COMPUTE_DTYPE=bfloat16 switches the attention/FFN/Cheb
# matmuls to bf16 (params, residual stream, softmax, norms and reductions
# stay f32 — the v5e MXU runs bf16 at ~2x f32 peak). Recorded A/Bs live in
# BASELINE.md; models also accept an explicit compute_dtype field that
# overrides this env default.
def default_compute_dtype():
    import jax.numpy as jnp
    name = os.environ.get("FETA_COMPUTE_DTYPE", "float32")
    return {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}.get(
        name, jnp.float32)


# Fused 2-layer-MLP Pallas kernel (ops/pallas/fused_mlp.py) for wide-FFN
# heads — the SAN eigen-PE head keeps torch's dim_feedforward=2048 default
# over B*N*m token rows (reference SAN_NodeSpectra.py:51), making its
# hidden field the head's dominant HBM stream. Auto: ON on accelerators
# when the hidden width is large enough that keeping it VMEM-resident
# beats XLA's materialized chain. FETA_FUSED_MLP=1/0 force-overrides
# (tests force 1 with an interpret-mode pallas_call monkeypatch on CPU).
FUSED_MLP_MIN_FF = int(os.environ.get("FETA_FUSED_MLP_MIN_FF", "1024"))


def use_fused_mlp(ff_dim: int = 0) -> bool:
    env = os.environ.get("FETA_FUSED_MLP")
    if env == "0":
        return False
    if env == "1":
        return True
    return ff_dim >= FUSED_MLP_MIN_FF and _on_accelerator()
