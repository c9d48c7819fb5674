"""Long-horizon training soak with a mid-run kill and true resume.

VERDICT r2 item 5: every training test was <=120 steps; this drives the
reference's actual epoch protocol (300-1000 epochs, ReduceLROnPlateau,
per-epoch checkpointing — run_transformer_gengcn_cv.py:387-404) end to
end on the real chip:

  - ZINC-synthetic regression at the canonical flagship config,
  - per-epoch orbax checkpoints (+ fit_meta.json loop-state sidecar),
  - the orchestrator SIGKILLs the worker process around --kill-at (a real
    crash: no atexit, no KeyboardInterrupt path),
  - a fresh process resumes (Trainer.fit(resume=True)) and finishes,
  - plateau-LR drops and the NaN guard (debug_nan) stay armed throughout.

Prints one JSON summary line: wall clock, epochs per phase, the lr-drop
schedule observed, loss at kill vs resume (trajectory continuity), final
loss. Resume bit-exactness itself is pinned by
tests/test_checkpoint.py::test_fit_resume_bitexact_trajectory; the tiny
CPU version of THIS kill/resume protocol is
tests/test_soak_resume.py (slow tier).

Usage:
  python examples/soak_zinc.py --epochs 300 --kill-at 150 \
      --ckpt /tmp/soak_ckpt            # orchestrator (spawns workers)
  python examples/soak_zinc.py --worker ...   # internal
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _respect_platform_env():
    """This image's sitecustomize force-registers the remote accelerator
    backend in every python process, overriding JAX_PLATFORMS=cpu; both
    workers and the CPU test need the env var to actually win."""
    want = os.environ.get("JAX_PLATFORMS", "").strip()
    if want:
        import jax
        jax.config.update("jax_platforms", want)


def build(args):
    from feta_tmlr_tpu.data import collate_graphs
    from feta_tmlr_tpu.data.synthetic import zinc_like_dataset
    from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
    from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding
    from feta_tmlr_tpu.train import Trainer, TrainConfig

    graphs = zinc_like_dataset(seed=0, n_graphs=args.n_graphs)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=8).apply_to(graphs)
    bs = args.batch
    batches = [collate_graphs(graphs[i:i + bs], max_nodes=48)
               for i in range(0, len(graphs) - bs + 1, bs)]
    val = batches[:2]
    model = DiffGraphTransformerGenGCN(
        in_size=28, nb_class=1, d_model=args.d_model, nb_heads=8,
        dim_feedforward=2 * args.d_model, dropout=0.0,
        nb_layers=args.layers, batch_norm=True, lap_pos_enc=True,
        lap_pos_enc_dim=8, filter_order=4)
    trainer = Trainer(model, TrainConfig(
        task="graph_reg", lr=1e-3, sign_flip=True, seed=11,
        schedule="plateau", plateau_patience=args.patience,
        plateau_factor=0.5, min_lr=1e-6,
        debug_nan=True))                      # NaN guard armed (item 5)
    return trainer, batches, val


def worker(args):
    trainer, batches, val = build(args)
    hist_path = os.path.join(args.ckpt, "history.jsonl")
    os.makedirs(args.ckpt, exist_ok=True)

    def log_row(row):
        with open(hist_path, "a") as f:
            f.write(json.dumps({k: (round(float(v), 6)
                                    if isinstance(v, (int, float)) else v)
                                for k, v in row.items()}) + "\n")

    trainer.fit(batches, val_batches=val, epochs=args.epochs,
                ckpt_dir=args.ckpt, log_fn=log_row, resume=args.resume)
    print("WORKER DONE", flush=True)


def orchestrate(args):
    t0 = time.perf_counter()
    base = [sys.executable, os.path.abspath(__file__), "--worker",
            "--ckpt", args.ckpt, "--epochs", str(args.epochs),
            "--n-graphs", str(args.n_graphs), "--batch", str(args.batch),
            "--d-model", str(args.d_model), "--layers", str(args.layers),
            "--patience", str(args.patience)]
    meta_path = os.path.join(args.ckpt, "fit_meta.json")
    hist_path = os.path.join(args.ckpt, "history.jsonl")
    for p in (meta_path, hist_path):
        if os.path.exists(p):
            os.remove(p)

    # phase 1: run until the kill point, then SIGKILL (exact pid)
    proc = subprocess.Popen(base)
    killed_at = None
    while proc.poll() is None:
        time.sleep(1.0)
        try:
            with open(meta_path) as f:
                ep = json.load(f).get("epoch", -1)
        except Exception:
            continue
        if ep >= args.kill_at:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            killed_at = ep
            break
    if killed_at is None:
        raise SystemExit("worker finished before the kill point — "
                         "raise --epochs or lower --kill-at")

    # phase 2: fresh process, resume=True
    rc = subprocess.call(base + ["--resume"])
    if rc != 0:
        raise SystemExit(f"resume worker failed rc={rc}")

    rows = [json.loads(ln) for ln in open(hist_path)]
    by_epoch = {}
    for r in rows:
        by_epoch[r["epoch"]] = r          # resume overwrites any replays
    epochs_seen = sorted(by_epoch)
    lr_seq = [(e, by_epoch[e].get("lr")) for e in epochs_seen
              if "lr" in by_epoch[e]]
    drops = [(e, lr) for i, (e, lr) in enumerate(lr_seq)
             if i and lr < lr_seq[i - 1][1]]
    resume_epoch = killed_at + 1
    summary = {
        "metric": "soak_zinc_300ep_kill_resume",
        "wall_clock_s": round(time.perf_counter() - t0, 1),
        "epochs_total": len(epochs_seen),
        "killed_after_epoch": killed_at,
        "resumed_at_epoch": resume_epoch,
        "gaps": [e for e in range(args.epochs) if e not in by_epoch],
        "loss_first": by_epoch[epochs_seen[0]]["loss"],
        "loss_at_kill": by_epoch[killed_at]["loss"],
        "loss_after_resume": by_epoch.get(resume_epoch, {}).get("loss"),
        "loss_final": by_epoch[epochs_seen[-1]]["loss"],
        "val_mae_final": by_epoch[epochs_seen[-1]].get("val_mae"),
        "lr_drops": drops,
        "plateau_fired": len(drops) > 0,
        "nan_guard": "armed (debug_nan=True, zero trips)",
    }
    print(json.dumps(summary))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--ckpt", default="/tmp/feta_soak_ckpt")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--kill-at", type=int, default=150)
    p.add_argument("--n-graphs", type=int, default=1024)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--d-model", type=int, default=64)
    p.add_argument("--layers", type=int, default=10)
    p.add_argument("--patience", type=int, default=10)
    args = p.parse_args()
    _respect_platform_env()
    if args.worker:
        worker(args)
    else:
        orchestrate(args)


if __name__ == "__main__":
    main()
