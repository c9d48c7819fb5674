"""Benchmark: FeTA (ChebConvDynamic) training step on ZINC-shaped graphs.

Prints ONE JSON line:
  {"metric": "edges_per_s_per_chip", "value": N, "unit": "edges/s",
   "vs_baseline": R, ...}

Metric per BASELINE.json ("edges/s/chip + epoch time, ZINC,
ChebConvDynamic"): real (directed) graph edges processed per second of
training-step wall time on one chip at the reference's canonical ZINC
configuration (run_transformer_gengcn.py defaults: d_model=64, heads=8,
layers=10, ff=128, batch=128 graphs, filter_order=4, batch_norm,
diffusion PE, lap-PE dim 8).

Two measured variants:
  - packed: graphs packed ~5-per-128-node-row (nn/packed.py, numerically
    equivalent to the reference semantics — tests/test_packed.py);
  - unpacked: one graph per 48-node row (the reference's layout).

Timing methodology: this environment reaches the TPU through a network
relay where `block_until_ready` does not synchronize with device completion
and a synchronous value fetch costs ~25 ms; we therefore time N1 vs N2
chained steps (state threads through, forcing sequential execution) with a
single scalar fetch each, and divide the difference. Inputs are
device_put once (per-step host->device upload through the relay would
dominate otherwise).

`vs_baseline` is the ratio against the pure-torch CPU twin of the same
model on identical data (feta_tmlr_tpu/reference_twin) — the reference
repo records no numbers and its PyG stack cannot run here; the twin result
is cached in bench_baseline.json.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

import jax

# ---------------------------------------------------------------- budget
# One GLOBAL wall-clock budget for the whole bench (round-4 postmortem:
# only the tier section was budgeted, so the sections before it blew the
# driver deadline and the final JSON — printed once at the very end —
# was lost entirely, BENCH_r04 rc=124). Every section now (a) checks the
# remaining budget before starting, (b) streams its fields as its own
# JSON line the moment it finishes, and (c) lands compactly in the final
# consolidated line, which is ALSO printed from the SIGTERM/SIGALRM
# handler so a timeout can only truncate sections, never erase results.
_T0 = time.perf_counter()
_BUDGET_S = float(os.environ.get("FETA_BENCH_BUDGET_S", "1260"))
_RESULTS: dict = {}        # full fields, every section
_FINAL: dict = {}          # compact fields for the final consolidated line
_FINALIZED = False
_STREAM_PATH = os.path.join(os.path.dirname(__file__), "BENCH_stream.jsonl")


def _remaining() -> float:
    return _BUDGET_S - (time.perf_counter() - _T0)


def emit(section: str, fields: dict, final: dict | None = None) -> None:
    """Stream one section's full fields NOW; stage compact ones for the
    final line. The driver captures only the tail of stdout, so the
    stream is belt-and-braces: humans and the jsonl file get everything,
    the final consolidated line carries the scoreboard."""
    _RESULTS.update(fields)
    line = json.dumps({"section": section,
                       "t_s": round(time.perf_counter() - _T0, 1),
                       **fields})
    print(line, flush=True)
    try:
        with open(_STREAM_PATH, "a") as f:
            f.write(line + "\n")
    except OSError:
        pass
    _FINAL.update(final if final is not None else fields)


def _finalize(exit_code: int | None = None) -> None:
    """Print the consolidated final JSON line (idempotent)."""
    global _FINALIZED
    if _FINALIZED:
        return
    _FINALIZED = True
    out = dict(_FINAL)
    line = json.dumps(out)
    # the driver stores only the LAST ~2000 chars of output; a final line
    # longer than that would be truncated from the FRONT (invalid JSON,
    # headline fields lost). Drop lowest-value fields until it fits.
    droppable = ([k for k in out if k.endswith("_vmem_amplification")]
                 + [k for k in out if "_pallasmod" in k]
                 + [k for k in out if k.endswith("_bw")]
                 + [k for k in out if k.startswith("b") and
                    "bytes_per_edge" in k]
                 + [k for k in out if k.endswith("_tw")])
    dropped = 0
    while len(line) > 1950 and droppable:
        out.pop(droppable.pop(0), None)
        dropped += 1
        line = json.dumps(out if not dropped else
                          {**out, "fields_dropped_for_tail": dropped})
    print(line, flush=True)
    try:
        with open(_STREAM_PATH, "a") as f:
            f.write(line + "\n")
    except OSError:
        pass
    if exit_code is not None:
        os._exit(exit_code)


def _on_deadline(signum, frame):
    emit("deadline", {"deadline_hit": signal.Signals(signum).name,
                      "elapsed_s": round(time.perf_counter() - _T0, 1)})
    _finalize(exit_code=0)

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.pack import pack_graphs
from feta_tmlr_tpu.data.synthetic import zinc_like_dataset
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
from feta_tmlr_tpu.nn.packed import PackedDiffGraphTransformerGenGCN
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding
from feta_tmlr_tpu.train import Trainer, TrainConfig

BATCH = 128
MAX_NODES = 48
ROW_LEN = 128
CFG = dict(in_size=28, nb_class=1, d_model=64, nb_heads=8,
           dim_feedforward=128, dropout=0.0, nb_layers=10,
           batch_norm=True, lap_pos_enc=True, lap_pos_enc_dim=8,
           filter_order=4)
ZINC_TRAIN_GRAPHS = 10000
BASELINE_FILE = os.path.join(os.path.dirname(__file__),
                             "bench_baseline.json")


def make_graphs():
    graphs = zinc_like_dataset(seed=0, n_graphs=BATCH)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=8).apply_to(graphs)
    return graphs, int(sum(g.num_edges for g in graphs))


def _measure_steps(step_fn, state, batch, n1=20, n2=100):
    """Relay-aware per-step timing (canonical impl: utils/profiling.py)."""
    from feta_tmlr_tpu.utils.profiling import timed_steps
    return timed_steps(
        step_fn, state, batch,
        rng_fn=lambda i: jax.random.fold_in(jax.random.key(1), i),
        n1=n1, n2=n2)


def bench_packed(graphs, n_edges):
    batch = jax.device_put(pack_graphs(graphs, row_len=ROW_LEN))
    jax.block_until_ready(batch.x)
    model = PackedDiffGraphTransformerGenGCN(
        **{k: v for k, v in CFG.items()})

    trainer = Trainer(model, TrainConfig(task="graph_clf", lr=1e-3,
                                         sign_flip=True))
    # packed graph-regression loss over graph slots
    import jax.numpy as jnp
    import optax

    opt = trainer.optimizer

    def step(state, b, rng):
        def loss_fn(p):
            out, new_stats = trainer._apply(p, state.batch_stats, b,
                                            deterministic=False, rng=rng)
            logits, _ = out if isinstance(out, tuple) else (out, 0.0)
            pred = logits.squeeze(-1)
            m = b.graph_mask.astype(pred.dtype)
            loss = jnp.sum(jnp.abs(pred - b.y) * m) / m.sum()
            return loss, new_stats
        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1, batch_stats=stats), loss

    state = trainer.init(jax.random.key(0), batch)
    return _measure_steps(jax.jit(step, donate_argnums=(0,)), state, batch)


def bench_unpacked(graphs, n_edges, mfu_out=None):
    batch = jax.device_put(collate_graphs(graphs, max_nodes=MAX_NODES))
    jax.block_until_ready(batch.x)
    model = DiffGraphTransformerGenGCN(**CFG)
    trainer = Trainer(model, TrainConfig(task="graph_reg", lr=1e-3,
                                         sign_flip=True))
    state = trainer.init(jax.random.key(0), batch)
    if mfu_out is not None:
        # XLA cost model of the compiled step (before timing: donation
        # invalidates `state` buffers once steps run)
        from feta_tmlr_tpu.utils.profiling import mfu_fields
        mfu_out.update(mfu_fields(trainer._jit_step_donated, state, batch,
                                  jax.random.key(1)))
    # donated step (what Trainer.fit runs): ~1.4x faster than the
    # non-donated jit behind the relay (A/B 2026-08-17: 3.9-4.6 ms vs
    # 6.1-6.4 ms bf16) - donation reuses the param/opt-state buffers
    return _measure_steps(trainer._jit_step_donated, state, batch)


def bench_torch_baseline(graphs):
    if os.path.isfile(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)["sec_per_step"]
    import torch
    from feta_tmlr_tpu.reference_twin.torch_model import TorchFeTA
    batch = collate_graphs(graphs, max_nodes=MAX_NODES)
    model = TorchFeTA(in_size=28, nb_class=1, d_model=CFG["d_model"],
                      nb_heads=CFG["nb_heads"],
                      dim_feedforward=CFG["dim_feedforward"],
                      nb_layers=CFG["nb_layers"],
                      filter_order=CFG["filter_order"],
                      batch_norm=CFG["batch_norm"], lap_pos_enc=True,
                      lap_pos_enc_dim=8)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
    t = {k: torch.from_numpy(np.asarray(getattr(batch, k)))
         for k in ("x", "adj", "pe", "lap_pe", "degree")}
    mask = torch.from_numpy(batch.node_mask.astype(np.float32))
    y = torch.from_numpy(np.asarray(batch.y, np.float32))

    def step():
        opt.zero_grad()
        out = model(t["x"], t["adj"], mask, pe=t["pe"],
                    lap_pe=t["lap_pe"], degree=t["degree"])
        loss = torch.abs(out.squeeze(-1) - y).mean()
        loss.backward()
        opt.step()

    step()
    t0 = time.perf_counter()
    for _ in range(3):
        step()
    sec = (time.perf_counter() - t0) / 3
    with open(BASELINE_FILE, "w") as f:
        json.dump({"sec_per_step": sec, "device": "cpu-torch-twin",
                   "config": CFG, "batch": BATCH}, f)
    return sec


def bench_unpacked_dtype(graphs, dtype_name, mfu_out=None):
    """Same canonical config under FETA_COMPUTE_DTYPE=<dtype_name>.

    The env knob is read at trace time (nn/layers.py), so a fresh
    trainer traced after setting it runs the attention/FFN/Cheb matmuls
    in that dtype. Interleaved in one process for a fair A/B."""
    prev = os.environ.get("FETA_COMPUTE_DTYPE")
    os.environ["FETA_COMPUTE_DTYPE"] = dtype_name
    try:
        return bench_unpacked(graphs, 0, mfu_out=mfu_out)
    finally:
        if prev is None:
            os.environ.pop("FETA_COMPUTE_DTYPE", None)
        else:
            os.environ["FETA_COMPUTE_DTYPE"] = prev


def bench_sbm_large_n(dtype_name="float32", n_graphs=32, n_nodes=128):
    """Large-N point (SBM-PATTERN-shaped, N=128): where bf16 should win —
    every [N, N] attention/Cheb matmul tile is 2.7x the canonical N=48."""
    from feta_tmlr_tpu.data.synthetic import sbm_like_dataset
    from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCNSBM
    graphs = sbm_like_dataset(seed=2, n_graphs=n_graphs, n_nodes=n_nodes)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=8).apply_to(graphs)
    n_edges = int(sum(g.num_edges for g in graphs))
    batch = jax.device_put(collate_graphs(graphs, max_nodes=n_nodes,
                                          node_labels=True))
    jax.block_until_ready(batch.x)
    prev = os.environ.get("FETA_COMPUTE_DTYPE")
    os.environ["FETA_COMPUTE_DTYPE"] = dtype_name
    try:
        model = DiffGraphTransformerGenGCNSBM(
            in_size=3, nb_class=2, d_model=CFG["d_model"],
            nb_heads=CFG["nb_heads"],
            dim_feedforward=CFG["dim_feedforward"], dropout=0.0,
            nb_layers=CFG["nb_layers"], batch_norm=True, lap_pos_enc=True,
            lap_pos_enc_dim=8, filter_order=CFG["filter_order"])
        trainer = Trainer(model, TrainConfig(task="node_clf", lr=1e-3,
                                             sign_flip=True))
        state = trainer.init(jax.random.key(0), batch)
        sec = _measure_steps(trainer._jit_step_donated, state, batch)
    finally:
        if prev is None:
            os.environ.pop("FETA_COMPUTE_DTYPE", None)
        else:
            os.environ["FETA_COMPUTE_DTYPE"] = prev
    return sec, n_edges


def bench_pallas_vs_xla_large_n(n_nodes, n_graphs, use_pallas,
                                dtype_name="bfloat16"):
    """Flash-kernel crossover search: SBM-shaped node classification at
    large padded N, unfiltered layers on the need_heads=False path where
    `use_pallas_modulation` can route to the fused Pallas kernel. The
    XLA path materializes [B,H,N,N] score/attention chains in HBM (fwd +
    bwd); the Pallas kernel keeps them in VMEM — the win should grow
    with N^2."""
    prev = os.environ.get("FETA_PALLAS")
    os.environ["FETA_PALLAS"] = "1" if use_pallas else "0"
    try:
        sec, n_edges = bench_sbm_large_n(dtype_name, n_graphs=n_graphs,
                                         n_nodes=n_nodes)
    finally:
        if prev is None:
            os.environ.pop("FETA_PALLAS", None)
        else:
            os.environ["FETA_PALLAS"] = prev
    return sec, n_edges


def bench_pallas_xla_pair(n_nodes, n_graphs, dtype_name="bfloat16",
                          repeats=2):
    """Compile-frugal interleaved XLA/Pallas A/B at one SBM shape.

    `bench_pallas_vs_xla_large_n` builds a fresh Trainer per call (4
    calls per shape = ~16 remote compiles, 1-10 min each behind the
    relay). Here each impl's trainer is built ONCE (the FETA_PALLAS env
    knob is read at trace time, so the impl is frozen into that
    trainer's jit cache at its first step) and only the MEASUREMENTS
    interleave — per-measurement state re-init because donation consumes
    it. Returns ({'xla': [sec...], 'pallas': [sec...]}, n_edges)."""
    from feta_tmlr_tpu.data.synthetic import sbm_like_dataset
    from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCNSBM
    prev_dt = os.environ.get("FETA_COMPUTE_DTYPE")
    prev_pl = os.environ.get("FETA_PALLAS")
    os.environ["FETA_COMPUTE_DTYPE"] = dtype_name
    try:
        graphs = sbm_like_dataset(seed=2, n_graphs=n_graphs,
                                  n_nodes=n_nodes)
        DiffusionEncoding(beta=1.0).apply_to(graphs)
        LapEncoding(dim=8).apply_to(graphs)
        n_edges = int(sum(g.num_edges for g in graphs))
        batch = jax.device_put(collate_graphs(graphs, max_nodes=n_nodes,
                                              node_labels=True))
        jax.block_until_ready(batch.x)
        model = DiffGraphTransformerGenGCNSBM(
            in_size=3, nb_class=2, d_model=CFG["d_model"],
            nb_heads=CFG["nb_heads"],
            dim_feedforward=CFG["dim_feedforward"], dropout=0.0,
            nb_layers=CFG["nb_layers"], batch_norm=True,
            lap_pos_enc=True, lap_pos_enc_dim=8,
            filter_order=CFG["filter_order"])
        trainers = {}
        for key, flag in (("xla", "0"), ("pallas", "1")):
            trainers[key] = Trainer(model, TrainConfig(
                task="node_clf", lr=1e-3, sign_flip=True))
            # trace now, with the env knob set for THIS impl: one step
            # freezes the impl into the trainer's jit cache
            os.environ["FETA_PALLAS"] = flag
            st = trainers[key].init(jax.random.key(0), batch)
            st, _ = trainers[key]._jit_step_donated(st, batch,
                                                    jax.random.key(1))
            del st
        results = {"xla": [], "pallas": []}
        for _ in range(repeats):
            for key, flag in (("xla", "0"), ("pallas", "1")):
                os.environ["FETA_PALLAS"] = flag
                state = trainers[key].init(jax.random.key(0), batch)
                sec = _measure_steps(trainers[key]._jit_step_donated,
                                     state, batch, n1=5, n2=20)
                results[key].append(sec)
        return results, n_edges
    finally:
        for name, prev in (("FETA_COMPUTE_DTYPE", prev_dt),
                           ("FETA_PALLAS", prev_pl)):
            if prev is None:
                os.environ.pop(name, None)
            else:
                os.environ[name] = prev


def bench_batch_sweep(sizes=(128, 256, 512, 1024), repeats=2,
                      cost_out=None, pallas_mod=False):
    """Interleaved in-process batch-size throughput sweep (bf16 policy,
    donated steps, batches pre-uploaded so only step time is measured).

    Replaces the old `bench_saturating(512)` single point, whose
    cross-run instability (1.04-1.71M edges/s at B=512 across sessions)
    produced the round-2 "throughput DROPS at 4x batch" anomaly: the
    B=128 and B=512 numbers came from different processes under +-30%
    relay session noise. Here every size is measured twice, interleaved
    in ONE process, and the per-size result is the max of the two (relay
    stalls only ever add time). Returns {batch_size: edges/s}.

    `cost_out` (dict) additionally receives per-size XLA cost-model
    numbers {bsz: {"bytes_per_edge", "flops_per_edge", "achieved_tflops"}}
    from the COMPILED per-size executables — if per-edge bytes grow with
    B, the compiler materialized more of the [B,H,N,N] attention chain to
    HBM at the larger shape, which is the mechanism behind a declining
    per-edge curve (not a harness artifact).

    `pallas_mod=True` runs every layer's modulation chain through the
    row-tiled Pallas kernel (FETA_PALLAS=1 + FETA_PALLAS_IMPL=modulation)
    — at the canonical N=48 its (B,) grid holds each graph's whole
    [H, N, N] chain in VMEM, writing ONE attention tensor to HBM instead
    of the XLA chain's several intermediates; the VERDICT r3 item 3
    candidate fix for the declining batch curve."""
    prev = os.environ.get("FETA_COMPUTE_DTYPE")
    prev_pl = os.environ.get("FETA_PALLAS")
    prev_impl = os.environ.get("FETA_PALLAS_IMPL")
    os.environ["FETA_COMPUTE_DTYPE"] = "bfloat16"
    if pallas_mod:
        os.environ["FETA_PALLAS"] = "1"
        os.environ["FETA_PALLAS_IMPL"] = "modulation"
    try:
        model = DiffGraphTransformerGenGCN(**CFG)
        setups = {}
        for bsz in sizes:
            graphs = zinc_like_dataset(seed=1, n_graphs=bsz)
            DiffusionEncoding(beta=1.0).apply_to(graphs)
            LapEncoding(dim=8).apply_to(graphs)
            n_edges = int(sum(g.num_edges for g in graphs))
            batch = jax.device_put(
                collate_graphs(graphs, max_nodes=MAX_NODES))
            jax.block_until_ready(batch.x)
            setups[bsz] = (batch, n_edges)
        # ONE trainer: its jitted step caches per batch shape, so the
        # second repeat of a size re-runs the compiled program instead of
        # recompiling (state must be re-init'd — donation consumed it)
        trainer = Trainer(model, TrainConfig(task="graph_reg", lr=1e-3,
                                             sign_flip=True))
        results = {bsz: [] for bsz in sizes}
        for _ in range(repeats):
            for bsz in sizes:
                batch, n_edges = setups[bsz]
                state = trainer.init(jax.random.key(0), batch)
                sec = _measure_steps(trainer._jit_step_donated, state,
                                     batch, n1=5, n2=20)
                results[bsz].append(n_edges / sec)
        if cost_out is not None:
            from feta_tmlr_tpu.utils.profiling import mfu_fields
            for bsz in sizes:
                batch, n_edges = setups[bsz]
                state = trainer.init(jax.random.key(0), batch)
                sec = n_edges / max(results[bsz])
                m = mfu_fields(trainer._jit_step_donated, state, batch,
                               jax.random.key(1), sec_per_step=sec)
                if m.get("flops_per_step"):
                    cost_out[bsz] = {
                        "bytes_per_edge": round(
                            m.get("hbm_bytes_lb_per_step", 0.0) / n_edges,
                            1),
                        "bw_util": m.get("hbm_bw_util"),
                        "flops_per_edge": round(
                            m["flops_per_step"] / n_edges, 1),
                        "achieved_tflops": m.get("achieved_tflops"),
                    }
        return {bsz: max(v) for bsz, v in results.items()}
    finally:
        for name, val in (("FETA_COMPUTE_DTYPE", prev),
                          ("FETA_PALLAS", prev_pl),
                          ("FETA_PALLAS_IMPL", prev_impl)):
            if val is None:
                os.environ.pop(name, None)
            else:
                os.environ[name] = val


def bench_streamed_epoch(wire: bool, n_batches=16, warm_batches=4,
                         prefetch: bool = False):
    """Streamed training: every step uploads a FRESH batch through the
    relay (the realistic regime when data does not fit on device or is
    re-collated per epoch; `fit`'s pre-upload path hides this cost).
    A/Bs the compact wire format (data/wire.py — bool adjacency, bf16 PE
    kernels: ~2.9x fewer bytes/batch) against full-precision upload.
    Runs under bf16 compute, where the wire encoding is numerics-neutral."""
    from feta_tmlr_tpu.data.wire import to_wire
    prev = os.environ.get("FETA_COMPUTE_DTYPE")
    os.environ["FETA_COMPUTE_DTYPE"] = "bfloat16"
    try:
        batches = []
        for s in range(n_batches + warm_batches):
            gs = zinc_like_dataset(seed=100 + s, n_graphs=BATCH)
            DiffusionEncoding(beta=1.0).apply_to(gs)
            LapEncoding(dim=8).apply_to(gs)
            batches.append(collate_graphs(gs, max_nodes=MAX_NODES))
        model = DiffGraphTransformerGenGCN(**CFG)
        trainer = Trainer(model, TrainConfig(task="graph_reg", lr=1e-3,
                                             sign_flip=True))
        state = trainer.init(jax.random.key(0), jax.device_put(batches[0]))
        rng = jax.random.key(1)

        def run(state, bs):
            loss = None
            if prefetch:
                # background-thread staging (data/prefetch.py): batch
                # k+1's wire-encode + upload ride under batch k's step
                from feta_tmlr_tpu.data.prefetch import prefetch_to_device
                it = prefetch_to_device(
                    bs, buffer_size=3,
                    collate_fn=(to_wire if wire else None))
                for i, b in enumerate(it):
                    state, loss = trainer._jit_step_donated(
                        state, b, jax.random.fold_in(rng, i))
            else:
                for i, hb in enumerate(bs):
                    b = jax.device_put(to_wire(hb) if wire else hb)
                    state, loss = trainer._jit_step_donated(
                        state, b, jax.random.fold_in(rng, i))
            float(loss)                     # one synchronizing fetch
            return state
        state = run(state, batches[:warm_batches])      # compile + warm
        t0 = time.perf_counter()
        state = run(state, batches[warm_batches:])
        dt = (time.perf_counter() - t0) / n_batches
    finally:
        if prev is None:
            os.environ.pop("FETA_COMPUTE_DTYPE", None)
        else:
            os.environ["FETA_COMPUTE_DTYPE"] = prev
    return dt


def bench_gckn(n_graphs=128, k=3, hidden=32):
    """GCKN tier: path enumeration (host C++ DFS) + unsup k-means init +
    jitted path-conv/pool/Gram encode on device — the counterpart of the
    reference's kernel micro-bench harnesses (gckn_fast.py:88-126,
    pooling.py:168-206), reported as end-to-end stage timings."""
    from feta_tmlr_tpu.data.synthetic import zinc_like_dataset
    from feta_tmlr_tpu.gckn.models import GCKNFeature
    graphs = zinc_like_dataset(seed=7, n_graphs=n_graphs)
    t0 = time.perf_counter()
    model = GCKNFeature.create(
        input_size=graphs[0].x.shape[-1], hidden_sizes=[hidden],
        path_sizes=[k])
    params = model.unsup_train(graphs, n_sampling_paths=20000, seed=0)
    t_unsup = time.perf_counter() - t0
    feats = model.encode(graphs, params)           # compile + warm
    t0 = time.perf_counter()
    for _ in range(5):
        feats = model.encode(graphs, params)
    t_encode = (time.perf_counter() - t0) / 5
    n_nodes = int(sum(g.num_nodes for g in graphs))
    assert np.all(np.isfinite(np.asarray(feats[0])))
    return {"gckn_unsup_train_s": round(t_unsup, 3),
            "gckn_encode_s_per_128graphs": round(t_encode, 4),
            "gckn_encode_nodes_per_s": round(n_nodes / t_encode, 1)}


def bench_serving(graphs, n_calls=30, wire=False, quantize=False):
    """Serving-path latency/throughput (feta_tmlr_tpu/serve.py): a jitted
    bucketed Predictor at the canonical config, batch-of-128 calls.
    Per-call wall time behind the axon relay includes one ~25 ms host
    round trip (device_put + fetch) that a colocated server would not
    pay; the JSON reports the full per-call figure (honest for this
    environment) and the derived graphs/s."""
    from feta_tmlr_tpu.serve import Predictor
    model = DiffGraphTransformerGenGCN(**CFG)
    batch0 = collate_graphs(graphs, max_nodes=MAX_NODES)
    variables = jax.jit(model.init)(jax.random.key(0), batch0)
    pred = Predictor(model, variables=variables, max_batch=BATCH,
                     wire=wire, quantize=quantize)
    pred.predict(graphs)                          # compile + warm
    t0 = time.perf_counter()
    for _ in range(n_calls):
        out = pred.predict(graphs)
    dt = (time.perf_counter() - t0) / n_calls
    assert np.all(np.isfinite(out))
    return dt


def bench_serve_quantized(graphs, n_calls=12, train_steps=1000):
    """int8 serving on the DEFAULT scoreboard (VERDICT r3 item 6): times
    the wire Predictor at f32 / w8 (int8 weights) / w8a8 (int8 weights +
    dynamic int8 activations) in one process, AND measures the end-metric
    cost — val MAE on a held-out synthetic ZINC split with a briefly
    trained model (so the delta is taken at a meaningful operating point,
    not random init). Returns the serve_int8_* / serve_w8a8_* extras."""
    from feta_tmlr_tpu.serve import Predictor
    model = DiffGraphTransformerGenGCN(**CFG)
    batch = jax.device_put(collate_graphs(graphs, max_nodes=MAX_NODES))
    jax.block_until_ready(batch.x)
    trainer = Trainer(model, TrainConfig(task="graph_reg", lr=1e-3,
                                         sign_flip=True))
    state = trainer.init(jax.random.key(0), batch)
    for i in range(train_steps):
        state, _ = trainer._jit_step_donated(
            state, batch, jax.random.fold_in(jax.random.key(7), i))
    variables = dict(state.params)         # TrainState.params = {"params"}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    val = zinc_like_dataset(seed=9, n_graphs=BATCH)
    DiffusionEncoding(beta=1.0).apply_to(val)
    LapEncoding(dim=8).apply_to(val)
    y = np.asarray([g.y for g in val], np.float32)

    out = {}
    maes = {}
    for key, quant in (("f32", False), ("int8", True), ("w8a8", "w8a8")):
        pred = Predictor(model, variables=variables, max_batch=BATCH,
                         wire=True, quantize=quant)
        logits = pred.predict(val)                 # compile + warm
        maes[key] = float(np.abs(logits.reshape(-1) - y).mean())
        t0 = time.perf_counter()
        for _ in range(n_calls):
            logits = pred.predict(val)
        dt = (time.perf_counter() - t0) / n_calls
        assert np.all(np.isfinite(logits))
        if key != "f32":
            out[f"serve_{key}_sec_per_call"] = round(dt, 5)
            out[f"serve_{key}_graphs_per_s"] = round(BATCH / dt, 1)
            out[f"serve_{key}_val_mae"] = round(maes[key], 5)
            out[f"serve_{key}_val_mae_delta"] = round(
                maes[key] - maes["f32"], 5)
        else:
            out["serve_f32_sec_per_call"] = round(dt, 5)
            out["serve_f32_val_mae"] = round(maes["f32"], 5)
    return out


def bench_serve_int8_device(d_model=256, ff=1024, layers=10, n_graphs=8):
    """Device-resident int8 serving at a WEIGHT-BOUND operating point
    (VERDICT r4 item 8: the B=128 canonical config is relay-round-trip
    bound, so w8/w8a8 shows no latency win there).

    At d_model=256/ff=1024/L=10 with a B=8 micro-batch the forward's HBM
    traffic is dominated by streaming the ~8M parameters (f32 31 MB vs
    int8 8 MB per call) — the regime of latency-sensitive single-request
    serving and multi-tenant model residency. Timing is the chained
    difference method on the jitted forward itself (device-resident
    inputs), i.e. the number a colocated server sees, with no relay
    round trip per call. Returns serve_dev_* fields incl. the
    f32-vs-int8 latency ratio."""
    import flax.linen as nn
    import jax.numpy as jnp

    from feta_tmlr_tpu.quantize import (
        dequantize_variables,
        int8_dense_interceptor,
        quantize_variables,
    )
    cfg = dict(CFG, d_model=d_model, dim_feedforward=ff, nb_layers=layers)
    graphs = zinc_like_dataset(seed=3, n_graphs=n_graphs)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=8).apply_to(graphs)
    batch = jax.device_put(collate_graphs(graphs, max_nodes=MAX_NODES))
    jax.block_until_ready(batch.x)
    model = DiffGraphTransformerGenGCN(**cfg)
    variables = jax.jit(model.init)(jax.random.key(0), batch)
    qvars = jax.device_put(quantize_variables(variables))

    def timed_forward(apply_fn):
        # chained: a scalar carry keeps successive calls data-dependent
        @jax.jit
        def step(carry, b, _rng):
            bb = b.replace(x=b.x + jnp.zeros_like(b.x)
                           * carry.astype(b.x.dtype))
            out = apply_fn(bb)
            logits = out[0] if isinstance(out, tuple) else out
            s = jnp.sum(logits.astype(jnp.float32))
            return s, s                  # carry doubles as the sync fetch

        from feta_tmlr_tpu.utils.profiling import timed_steps
        return timed_steps(step, jnp.float32(0.0), batch,
                           lambda i: None, n1=10, n2=40,
                           check_finite=False)

    def _w8a8_apply(b):
        with nn.intercept_methods(int8_dense_interceptor):
            return model.apply(dequantize_variables(qvars), b)

    out = {}
    results = {}
    for rep in range(2):
        for key, fn in (
                ("f32", lambda b: model.apply(variables, b)),
                ("w8", lambda b: model.apply(
                    dequantize_variables(qvars), b)),
                ("w8a8", _w8a8_apply)):
            results.setdefault(key, []).append(timed_forward(fn))
    for key, secs in results.items():
        out[f"serve_dev_{key}_ms"] = round(min(secs) * 1e3, 3)
    out["serve_dev_int8_win"] = round(
        min(results["f32"]) / min(min(results["w8"]),
                                  min(results["w8a8"])), 3)
    out["serve_dev_config"] = f"d{d_model}_ff{ff}_L{layers}_B{n_graphs}"
    return out


def bench_serving_concurrent(graphs, n_requests=192, n_clients=16,
                             max_wait_ms=5.0):
    """Online-serving regime: many concurrent SINGLE-GRAPH requests.
    Naive per-request dispatch pays one under-filled batch + relay round
    trip per request; the DynamicBatcher (serve_batcher.py) coalesces
    concurrent callers into shared micro-batches. Reports requests/s
    for both paths."""
    import threading
    from feta_tmlr_tpu.serve import Predictor
    from feta_tmlr_tpu.serve_batcher import DynamicBatcher
    model = DiffGraphTransformerGenGCN(**CFG)
    batch0 = collate_graphs(graphs, max_nodes=MAX_NODES)
    variables = jax.jit(model.init)(jax.random.key(0), batch0)
    pred = Predictor(model, variables=variables, max_batch=64,
                     collate_kwargs={"max_nodes": MAX_NODES}, wire=True)
    pred.predict(graphs[:64])                       # compile + warm
    reqs = [graphs[i % len(graphs)] for i in range(n_requests)]

    def run_load(call):
        idx = iter(range(n_requests))
        lock = threading.Lock()
        errors = []

        def worker():
            while True:
                with lock:
                    i = next(idx, None)
                if i is None:
                    return
                try:
                    call([reqs[i]])
                except Exception as e:   # a dead worker must fail the
                    errors.append(e)     # bench, not skew the rate
                    return
        ts = [threading.Thread(target=worker) for _ in range(n_clients)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        if errors:
            raise errors[0]
        return n_requests / (time.perf_counter() - t0)

    rps_naive = run_load(pred.predict)
    batcher = DynamicBatcher(pred, max_wait_ms=max_wait_ms)
    rps_batched = run_load(batcher.predict)
    batcher.close()
    return rps_naive, rps_batched


def _accelerator_available() -> bool:
    """Probe default-backend init in a SUBPROCESS with a hard deadline.

    When the axon relay is unreachable, in-process `jax.devices()` blocks
    for 20+ minutes before raising (measured 2026-08-18) — a try/except
    in this process would hang the whole bench. The subprocess is killed
    at FETA_BENCH_PROBE_TIMEOUT (default 240 s; healthy relay init takes
    seconds)."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, sys; "
             "sys.exit(0 if jax.devices()[0].platform != 'cpu' else 3)"],
            timeout=int(os.environ.get("FETA_BENCH_PROBE_TIMEOUT", "240")),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


# compact tier aliases for the final consolidated line (full fields are
# streamed per tier as they are measured)
_TIER_SHORT = {"san_zinc": "san", "san_pattern_n128": "sanp",
               "gat_feta_zinc": "gat", "lspe_spectra_zinc": "lspe",
               "gatedgcn_lspe_zinc": "ggcn", "pna_lspe_zinc": "pna"}


def _tier_compact(name: str, row: dict) -> dict:
    s = _TIER_SHORT.get(name, name)
    out = {}
    sec = row.get(f"tier_{name}_sec_per_step")
    if sec:
        out[f"tier_{s}_ms"] = round(sec * 1e3, 1)
    for suffix, short in (("speedup_vs_base", "x"), ("vs_twin", "tw"),
                          ("train_hbm_bw_util", "bw")):
        v = row.get(f"tier_{name}_{suffix}")
        if v is not None:
            out[f"tier_{s}_{short}"] = v
    if f"tier_{name}_error" in row:
        out[f"tier_{s}_err"] = 1
    return out


def _mfu_final_subset(tag: str, fields: dict) -> dict:
    """The six per-variant speed-of-light fields the final line carries
    (superset of BENCH_r03's per-variant fields, with the calibrated
    hbm_bytes_lb/hbm_bw_util replacing the old VMEM-inclusive pair)."""
    keep = ("flops_per_step", "hbm_bytes_lb_per_step",
            "arithmetic_intensity", "achieved_tflops", "mfu_vs_bf16_peak",
            "hbm_bw_util")
    return {f"{tag}_{k}": fields[f"{tag}_{k}"] for k in keep
            if f"{tag}_{k}" in fields}


def main():
    signal.signal(signal.SIGTERM, _on_deadline)
    signal.signal(signal.SIGALRM, _on_deadline)
    signal.alarm(max(30, int(_BUDGET_S)))
    try:
        open(_STREAM_PATH, "w").close()
    except OSError:
        pass
    # compiles behind the relay are the bench's long pole (20s-10min
    # each); the persistent cache makes re-runs (and the driver's run
    # after a warm-up run in the same environment) load them in seconds
    from feta_tmlr_tpu.utils.profiling import (
        derive_rates,
        enable_persistent_compile_cache,
        hbm_copy_roofline,
    )
    enable_persistent_compile_cache()

    # If the accelerator backend cannot initialize (e.g. the axon relay is
    # unreachable), fall back to host CPU and say so in the JSON rather
    # than crashing (or hanging) with no record for the round.
    degraded = None
    if not _accelerator_available():
        degraded = "accelerator backend unavailable; host-CPU fallback"
        jax.config.update("jax_platforms", "cpu")
    graphs, n_edges = make_graphs()
    # FETA_TRACE_DIR=<dir> captures a jax.profiler trace of the unpacked
    # measurement for XProf/TensorBoard (utils/profiling.trace)
    trace_dir = os.environ.get("FETA_TRACE_DIR")

    # --------------------------------- section 0: HBM copy roofline
    # Runs FIRST: it sets the session's working HBM peak (max of spec
    # table and measured copy bandwidth, utils/profiling.py), so every
    # hbm_bw_util below divides by a ceiling a real kernel reached and
    # can never read above 1.0. ~1 tiny compile.
    if not degraded:
        try:
            roof = hbm_copy_roofline()
            emit("hbm_roofline", roof,
                 final={k: roof[k] for k in
                        ("hbm_copy_gbps", "hbm_peak_gbps_used")
                        if k in roof})
        except Exception as e:
            emit("hbm_roofline",
                 {"hbm_roofline_error": f"{type(e).__name__}: {e}"[:160]})

    # ------------------------------------------------- section 1: core
    mfu_unpacked, mfu_bf16 = {}, {}
    sec_packed = sec_bf16 = None
    if degraded:
        # CPU fallback: one meaningful row (unpacked f32 + twin ratio),
        # skip the variants/sweeps whose point is on-chip behavior
        sec_unpacked = bench_unpacked(graphs, n_edges, mfu_out=mfu_unpacked)
    else:
        sec_packed = bench_packed(graphs, n_edges)
        if trace_dir:
            from feta_tmlr_tpu.utils.profiling import trace
            with trace(trace_dir):
                sec_unpacked = bench_unpacked(graphs, n_edges,
                                              mfu_out=mfu_unpacked)
        else:
            sec_unpacked = bench_unpacked(graphs, n_edges,
                                          mfu_out=mfu_unpacked)
        # bf16 mixed precision (attention/FFN/Cheb matmuls on the MXU at
        # 2x peak; params/softmax/norms f32): the headline variant
        sec_bf16 = bench_unpacked_dtype(graphs, "bfloat16",
                                        mfu_out=mfu_bf16)
    try:
        sec_torch = bench_torch_baseline(graphs)
    except Exception:
        sec_torch = None

    rnd = lambda s: round(s, 5) if s is not None else None
    best = min(s for s in (sec_packed, sec_unpacked, sec_bf16)
               if s is not None)
    core = {
        "metric": "edges_per_s_per_chip",
        "value": round(n_edges / best, 1),
        "unit": "edges/s",
        "vs_baseline": (round(sec_torch / best, 3) if sec_torch else None),
        "sec_per_step_packed": rnd(sec_packed),
        "sec_per_step_unpacked": rnd(sec_unpacked),
        "sec_per_step_bf16": rnd(sec_bf16),
        "epoch_time_s_zinc10k": round(best * (ZINC_TRAIN_GRAPHS / BATCH),
                                      3),
        "baseline": "torch-cpu-twin",
        "device": str(jax.devices()[0]),
        "batch_graphs": BATCH,
        "edges_per_batch": n_edges,
        **({"degraded": degraded} if degraded else {}),
    }
    mfu_all = {}
    for mfu, sec, tag in ((mfu_unpacked, sec_unpacked, "unpacked"),
                          (mfu_bf16, sec_bf16, "bf16")):
        if not mfu or not sec:
            continue
        mfu_all.update({f"{tag}_{k}": v for k, v in mfu.items()})
        mfu_all.update({f"{tag}_{k}": v
                        for k, v in derive_rates(mfu, sec).items()})
    emit("core", {**core, **mfu_all},
         final={**core,
                **_mfu_final_subset("unpacked", mfu_all),
                **_mfu_final_subset("bf16", mfu_all)})

    if degraded:
        skipped = [k for k in ("TIERS", "ABLATE", "SERVE", "GCKN",
                               "PALLAS_LARGEN", "STREAM")
                   if os.environ.get(f"FETA_BENCH_{k}") == "1"]
        emit("degraded", {"skipped_extras":
                          skipped + ["roofline", "sweep", "tiers", "int8"]})
        _finalize()
        return

    # ------------------------------------- section 3: batch-size sweep
    # (edges_per_s_b* are BENCH_r03 superset fields — before tiers)
    sweep = None
    if _remaining() > 240:
        sweep_cost = {}
        try:
            sweep = bench_batch_sweep(cost_out=sweep_cost)
        except Exception as e:
            emit("sweep", {"sweep_error": f"{type(e).__name__}: {e}"[:160]})
        if sweep:
            f = {f"edges_per_s_b{b}": round(e, 1) for b, e in sweep.items()}
            f["edges_per_s_saturating"] = round(max(sweep.values()), 1)
            full = dict(f)
            for bsz, c in sweep_cost.items():
                full[f"b{bsz}_bytes_per_edge"] = c["bytes_per_edge"]
                full[f"b{bsz}_achieved_tflops"] = c["achieved_tflops"]
                if c.get("bw_util") is not None:
                    full[f"b{bsz}_hbm_bw_util"] = c["bw_util"]
            emit("sweep", full, final=f)
    else:
        emit("sweep", {"sweep_skipped": "budget"})

    # ----------------------------------------------- section 4: tiers
    # tier-2/3 model families (bench_tiers.py): SAN_NodeSpectra (ZINC +
    # PATTERN), GATFeTA, GraphiTSpectraNet, GatedGCN-LSPE, PNA — train +
    # serve + calibrated MFU + base-vs-opt A/Bs + torch twins. Budget =
    # whatever remains minus a reserve for the int8 section + finalize.
    if os.environ.get("FETA_BENCH_TIERS", "1") == "1":
        tier_budget = _remaining() - 240
        if tier_budget > 120:
            from bench_tiers import run_tiers
            try:
                run_tiers(budget_s=tier_budget,
                          on_row=lambda name, row: emit(
                              f"tier:{name}", row,
                              final=_tier_compact(name, row)))
            except Exception as e:
                emit("tiers", {"tiers_error":
                               f"{type(e).__name__}: {e}"[:200]})
        else:
            emit("tiers", {"tiers_skipped": "budget"})

    # ------------------------------------- section 5: int8 serving
    if os.environ.get("FETA_BENCH_NO_SERVE_INT8") != "1" \
            and _remaining() <= 150:
        emit("serve_int8", {"serve_int8_skipped": "budget"})
    if os.environ.get("FETA_BENCH_NO_SERVE_INT8") != "1" \
            and _remaining() > 150:
        # the weight-bound device-resident operating point where int8
        # actually wins latency runs FIRST (the B=128 wire path below is
        # relay-RTT bound, so this row is the win condition; VERDICT r4
        # item 8 — and the dress rehearsal showed a cold-cache run can
        # exhaust the budget before a second serve row)
        try:
            dev = bench_serve_int8_device()
            emit("serve_int8_device", dev,
                 final={k: dev[k] for k in
                        ("serve_dev_f32_ms", "serve_dev_w8_ms",
                         "serve_dev_w8a8_ms", "serve_dev_int8_win")
                        if k in dev})
        except Exception as e:
            emit("serve_int8_device",
                 {"serve_dev_error": f"{type(e).__name__}: {e}"[:200]})
        if _remaining() > 120:
            try:
                serve_q = bench_serve_quantized(graphs)
                compact = {k: serve_q[k] for k in
                           ("serve_f32_sec_per_call",
                            "serve_int8_sec_per_call",
                            "serve_w8a8_sec_per_call",
                            "serve_int8_val_mae_delta",
                            "serve_w8a8_val_mae_delta") if k in serve_q}
                emit("serve_int8", serve_q, final=compact)
            except Exception as e:
                emit("serve_int8", {"serve_int8_error":
                                    f"{type(e).__name__}: {e}"[:200]})

    # ------------------------- section 6: Pallas-modulation batch sweep
    # (the round-4 falsification control; informative but lowest value)
    if os.environ.get("FETA_BENCH_NO_SWEEP_PALLAS") != "1" \
            and _remaining() <= 240:
        emit("sweep_pallasmod", {"sweep_pallasmod_skipped": "budget"})
    if os.environ.get("FETA_BENCH_NO_SWEEP_PALLAS") != "1" \
            and _remaining() > 240:
        try:
            sweep_pl = bench_batch_sweep(pallas_mod=True)
            f = {f"edges_per_s_b{b}_pallasmod": round(e, 1)
                 for b, e in sweep_pl.items()}
            emit("sweep_pallasmod", f,
                 final={k: f[k] for k in
                        ("edges_per_s_b128_pallasmod",
                         "edges_per_s_b1024_pallasmod") if k in f})
        except Exception as e:
            emit("sweep_pallasmod",
                 {"sweep_pallasmod_error": f"{type(e).__name__}: {e}"[:160]})

    # --------------------------------------- env-gated deep sections
    if os.environ.get("FETA_BENCH_ABLATE") == "1" and _remaining() > 180:
        f = {"sec_per_step_f32_recheck": round(bench_unpacked(graphs, 0),
                                               5)}
        sbm_f32, sbm_edges = bench_sbm_large_n("float32")
        sbm_bf16, _ = bench_sbm_large_n("bfloat16")
        f["sbm_n128_sec_per_step_f32"] = round(sbm_f32, 5)
        f["sbm_n128_sec_per_step_bf16"] = round(sbm_bf16, 5)
        f["sbm_n128_edges_per_batch"] = sbm_edges
        emit("ablate", f, final={})
    if os.environ.get("FETA_BENCH_SERVE") == "1" and _remaining() > 240:
        f = {}
        for tag, kw in (("", {}), ("_wire", {"wire": True}),
                        ("_int8", {"wire": True, "quantize": True}),
                        ("_w8a8", {"wire": True, "quantize": "w8a8"})):
            sec_call = bench_serving(graphs, **kw)
            f[f"serve_sec_per_batch128_call{tag}"] = round(sec_call, 5)
            f[f"serve_graphs_per_s{tag}"] = round(BATCH / sec_call, 1)
        rps_n, rps_b = bench_serving_concurrent(graphs)
        f["serve_concurrent_rps_naive"] = round(rps_n, 1)
        f["serve_concurrent_rps_batched"] = round(rps_b, 1)
        emit("serve", f, final={})
    if os.environ.get("FETA_BENCH_GCKN") == "1" and _remaining() > 180:
        try:
            emit("gckn", bench_gckn(), final={})
        except Exception as e:
            emit("gckn", {"gckn_error": type(e).__name__})
    if os.environ.get("FETA_BENCH_PALLAS_LARGEN") == "1":
        for n_nodes, n_graphs in ((256, 16), (512, 4), (1024, 2),
                                  (2048, 1)):
            if _remaining() < 180:
                break
            f = {}
            try:
                res, _ = bench_pallas_xla_pair(n_nodes, n_graphs)
                f[f"n{n_nodes}_sec_per_step_xla"] = round(min(res["xla"]),
                                                          5)
                f[f"n{n_nodes}_sec_per_step_pallas"] = round(
                    min(res["pallas"]), 5)
            except Exception as e:                 # e.g. VMEM overflow
                f[f"n{n_nodes}_pallas_error"] = type(e).__name__
            emit(f"pallas_largen_n{n_nodes}", f, final={})
    if os.environ.get("FETA_BENCH_STREAM") == "1" and _remaining() > 300:
        # interleaved plain/wire/plain/wire to average out relay drift
        p1 = bench_streamed_epoch(wire=False)
        w1 = bench_streamed_epoch(wire=True)
        f1 = bench_streamed_epoch(wire=True, prefetch=True)
        p2 = bench_streamed_epoch(wire=False)
        w2 = bench_streamed_epoch(wire=True)
        f2 = bench_streamed_epoch(wire=True, prefetch=True)
        emit("stream", {
            "stream_sec_per_step_plain": round(min(p1, p2), 5),
            "stream_sec_per_step_wire": round(min(w1, w2), 5),
            "stream_sec_per_step_wire_prefetch": round(min(f1, f2), 5),
            "stream_wire_speedup": round(min(p1, p2) / min(w1, w2), 3)},
            final={})

    _finalize()


if __name__ == "__main__":
    main()
