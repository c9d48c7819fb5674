"""Unified trainer with task adapters.

One trainer covers the reference's 24 per-dataset scripts (SURVEY.md §2.4) via
task adapters:
  graph_clf : CE loss + accuracy         (run_transformer_gengcn_cv.py)
  graph_reg : L1 loss + MAE              (run_transformer_gengcn.py, ZINC)
  node_clf  : masked CE + balanced acc   (run_transformer_gengcn_SBM_cv.py)
  binary_graph : BCE-with-logits + ROC-AUC/AP (molhiv/molpcba)

Reference behaviors kept: Laplacian-PE sign-flip augmentation during training
(run_transformer_gengcn_cv.py:138-142), coefficient regularization weight
passed through to the model (models.py:543-546), best-val checkpoint
selection (run_transformer_gengcn_cv.py:401-413).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Iterable, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.struct

from feta_tmlr_tpu.data.batch import GraphBatch
from feta_tmlr_tpu.data.wire import from_wire, to_wire
from feta_tmlr_tpu.train import metrics as M
from feta_tmlr_tpu.train.optim import PlateauScheduler, make_optimizer, step_lr


class TrainState(flax.struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: Any
    batch_stats: Any = None        # BatchNorm running stats (or None)


@dataclasses.dataclass
class TrainConfig:
    task: str = "graph_clf"            # graph_clf | graph_reg | node_clf | binary_graph
    lr: float = 1e-3
    weight_decay: float = 1e-5
    epochs: int = 100
    regularization: float = 0.0
    sign_flip: bool = True             # lap-PE sign-flip augmentation
    schedule: str = "constant"         # constant | step | plateau | warmup
    grad_clip_norm: Optional[float] = None   # global-norm clip (off = ref)
    warmup_steps: int = 2000           # for schedule='warmup' (ref default)
    step_size: int = 50                # StepLR epochs (reference: 50)
    gamma: float = 0.5
    plateau_patience: int = 10
    plateau_factor: float = 0.5
    min_lr: float = 1e-6
    # reference stop conditions (LPE main_ZINC_graph_regression.py:199-208):
    # break when the plateau schedule bottoms out / wall clock exceeded
    stop_at_min_lr: bool = False
    max_time_h: Optional[float] = None
    binary_metric: str = "ap"          # multitask metric: ap | rocauc
    # upload batches in the compact wire format (data/wire.py): ~3x fewer
    # host->device bytes per batch. Exact for adjacency/ids; PE kernels
    # travel as bf16 (exact under FETA_COMPUTE_DTYPE=bfloat16, where the
    # modulation multiply casts them to bf16 anyway)
    wire: bool = False
    # stream=True keeps training batches HOST-resident and feeds each
    # epoch through the double-buffered device prefetcher
    # (data/prefetch.py) instead of pre-uploading everything — the
    # production path when the dataset exceeds device memory. Composes
    # with wire (the wire encode runs on the prefetch thread). Measured
    # at the canonical config behind the relay: 22.2-22.9 ms/step
    # (wire+prefetch) vs 51 ms plain streaming vs 4.5 ms device-resident.
    stream: bool = False
    # per-epoch NaN/explosion guard — the jit-compatible counterpart of
    # the reference's per-batch parameter sweep with pdb drops
    # (run_transformer_gengcn_cv.py:161-179): after each epoch, raise if
    # the mean loss or any parameter is non-finite or |param| > 1000
    debug_nan: bool = False
    seed: int = 0


def _model_outputs(out):
    """Models return logits or (logits, reg) or (logits, reg, coeff)."""
    if isinstance(out, tuple):
        return out[0], (out[1] if len(out) > 1 else 0.0)
    return out, 0.0


def task_loss(task: str, logits, batch: GraphBatch):
    packed = batch.graph_mask is not None
    if task == "graph_clf":
        n_class = logits.shape[-1]
        onehot = jax.nn.one_hot(batch.y, n_class)
        ce = -jnp.sum(jax.nn.log_softmax(logits) * onehot, -1)
        if packed:                                  # [B, G] slot mask
            m = batch.graph_mask.astype(ce.dtype)
            return jnp.sum(ce * m) / jnp.maximum(m.sum(), 1.0)
        return jnp.mean(ce)
    if task == "graph_reg":
        pred = logits.reshape(jnp.shape(batch.y))
        err = jnp.abs(pred - batch.y)
        if packed:
            m = batch.graph_mask.astype(err.dtype)
            return jnp.sum(err * m) / jnp.maximum(m.sum(), 1.0)
        return jnp.mean(err)
    if task == "node_clf":
        n_class = logits.shape[-1]
        labels = jnp.maximum(batch.y, 0)
        onehot = jax.nn.one_hot(labels, n_class)
        ce = -jnp.sum(jax.nn.log_softmax(logits) * onehot, -1)
        m = (batch.node_mask & (batch.y >= 0)).astype(ce.dtype)
        return jnp.sum(ce * m) / jnp.maximum(m.sum(), 1.0)
    if task == "binary_graph":
        y = batch.y.astype(logits.dtype)
        if y.ndim < logits.ndim:
            y = y[..., None]
        valid = ~jnp.isnan(y)
        y0 = jnp.where(valid, y, 0.0)
        per = optax.sigmoid_binary_cross_entropy(logits, y0)
        per = jnp.where(valid, per, 0.0)
        return per.sum() / jnp.maximum(valid.sum(), 1)
    raise ValueError(f"unknown task {task!r}")


def task_metric(task: str, logits: np.ndarray, y, node_mask=None,
                binary_metric: str = "ap"):
    """Metric over a full split (logits/labels concatenated across batches —
    ROC-AUC/AP are not decomposable per batch)."""
    if task == "graph_clf":
        return {"acc": M.accuracy_graph(logits, y)}
    if task == "graph_reg":
        return {"mae": M.mae(np.asarray(logits).reshape(np.shape(y)), y)}
    if task == "node_clf":
        return {"acc_sbm": M.accuracy_sbm(logits, y, mask=node_mask)}
    if task == "binary_graph":
        y = np.asarray(y)
        s = np.asarray(logits)
        if s.ndim == 1 or s.shape[-1] == 1:
            return {"rocauc": M.roc_auc(s.reshape(-1), y.reshape(-1))}
        if y.ndim < s.ndim:
            y = y[..., None]
        # multitask metric choice mirrors OGB: rocauc for MOLTOX21-style
        # tasks, AP for MOLPCBA (reference train_OGBMOL...:69-70)
        if binary_metric == "rocauc":
            return {"rocauc": M.multitask_mean(M.roc_auc, s, y)}
        return {"ap": M.multitask_mean(M.average_precision, s, y)}
    raise ValueError(task)


class Trainer:
    """Jitted train/eval driver for one model + task."""

    def __init__(self, model, config: TrainConfig,
                 steps_per_epoch: int = 1):
        self.model = model
        self.cfg = config
        # FeTA models take regularization= to emit the coefficient
        # regularizer (models.py:543-546); lapeig-aux models return their
        # pre-weighted term unconditionally and take no such kwarg
        import inspect
        self._model_takes_reg = ("regularization" in inspect.signature(
            type(model).__call__).parameters)
        c = config
        if c.schedule == "step":
            lr = step_lr(c.lr, c.step_size, c.gamma, steps_per_epoch)
            self.optimizer = make_optimizer(
                lr, c.weight_decay, grad_clip_norm=c.grad_clip_norm)
            self.plateau = None
        elif c.schedule == "warmup":
            from feta_tmlr_tpu.train.optim import warmup_inverse_sqrt
            self.optimizer = make_optimizer(
                warmup_inverse_sqrt(c.lr, c.warmup_steps), c.weight_decay,
                grad_clip_norm=c.grad_clip_norm)
            self.plateau = None
        elif c.schedule == "plateau":
            self.optimizer = make_optimizer(
                c.lr, c.weight_decay, injectable=True,
                grad_clip_norm=c.grad_clip_norm)
            self.plateau = PlateauScheduler(
                factor=c.plateau_factor, patience=c.plateau_patience,
                mode=("min" if c.task == "graph_reg" else "max"),
                min_lr=c.min_lr)
        else:
            self.optimizer = make_optimizer(
                c.lr, c.weight_decay, grad_clip_norm=c.grad_clip_norm)
            self.plateau = None
        self._jit_step = jax.jit(self._step)
        # donating variant for tight loops (fit): the input TrainState's
        # buffers are reused in place, halving peak HBM for the update.
        # Callers must not touch the passed-in state afterwards.
        self._jit_step_donated = jax.jit(self._step, donate_argnums=(0,))
        self._jit_eval = jax.jit(self._eval_logits)

    # -- core fns ---------------------------------------------------------
    def init(self, rng, sample_batch: GraphBatch) -> TrainState:
        # jit the init: eager init dispatches hundreds of tiny ops, each
        # paying full latency through the device relay
        variables = jax.jit(self.model.init)(rng, sample_batch)
        params = {"params": variables["params"]}
        return TrainState(params=params,
                          opt_state=self.optimizer.init(params),
                          step=jnp.zeros((), jnp.int32),
                          batch_stats=variables.get("batch_stats"))

    def _variables(self, params, batch_stats):
        v = dict(params)
        if batch_stats is not None:
            v["batch_stats"] = batch_stats
        return v

    def _apply(self, params, batch_stats, batch, deterministic, rng=None):
        kwargs = {}
        if self.cfg.regularization > 0 and self._model_takes_reg:
            kwargs["regularization"] = self.cfg.regularization
        rngs = {"dropout": rng} if rng is not None else None
        mutable = ["batch_stats"] if (batch_stats is not None
                                      and not deterministic) else False
        out = self.model.apply(
            self._variables(params, batch_stats), batch,
            deterministic=deterministic, rngs=rngs, mutable=mutable,
            **kwargs)
        if mutable:
            out, updated = out
            return out, updated.get("batch_stats")
        return out, batch_stats

    def _loss_and_grads(self, params, batch_stats, batch: GraphBatch, rng):
        """One microbatch's (loss, grads, new_batch_stats) — the training
        forward/backward without the optimizer update."""
        # expand compact wire-format batches (data/wire.py) back to
        # compute dtypes; a no-op (same-dtype casts) for normal batches
        batch = from_wire(batch)
        rng_flip, rng_flip_eig, rng_drop = jax.random.split(rng, 3)
        if self.cfg.sign_flip and batch.lap_pe is not None:
            # per-dimension random sign (run_transformer_gengcn_cv.py:138-142)
            signs = jnp.where(
                jax.random.uniform(rng_flip,
                                   (batch.lap_pe.shape[-1],)) >= 0.5,
                1.0, -1.0)
            batch = batch.replace(lap_pe=batch.lap_pe * signs)
        if self.cfg.sign_flip and batch.eigvecs is not None:
            # SAN/LPE tier: flip Laplacian eigvec signs per train batch
            # (LPE/train/train_ZINC_graph_regression.py:26-33)
            signs = jnp.where(
                jax.random.uniform(rng_flip_eig,
                                   (batch.eigvecs.shape[-1],)) >= 0.5,
                1.0, -1.0)
            batch = batch.replace(eigvecs=batch.eigvecs * signs)

        def loss_fn(p):
            out, new_stats = self._apply(
                p, batch_stats, batch, deterministic=False,
                rng=rng_drop)
            logits, reg = _model_outputs(out)
            loss = task_loss(self.cfg.task, logits, batch)
            return loss + self.cfg.regularization * reg, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return loss, grads, new_stats

    def _step(self, state: TrainState, batch: GraphBatch, rng):
        loss, grads, new_stats = self._loss_and_grads(
            state.params, state.batch_stats, batch, rng)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1,
                          batch_stats=new_stats), loss

    def make_accum_step(self, k: int):
        """Gradient accumulation: one optimizer update from the MEAN of k
        microbatch gradients (jit'd `lax.scan`; every GraphBatch leaf of
        the input gains a leading [k] axis — `stack_batches`). The
        reference has no accumulation (its graphs are small); this is the
        large-effective-batch path when B x N x N activations would
        exceed HBM at the desired batch size.

        Equivalent to a single step on the concatenated batch for every
        mean-reduced loss (all task adapters here) up to fp reassociation
        — tests/test_grad_accum.py asserts parameter-level agreement.
        BatchNorm caveat: batch statistics are per-microbatch (running
        stats thread through the scan), matching sequential semantics
        rather than full-batch statistics.

        Returns step_k(state, stacked_batch, rng) -> (state, mean_loss);
        the input state's buffers are donated."""
        def accum(state, stacked: GraphBatch, rng):
            rngs = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
                rng, jnp.arange(k, dtype=jnp.uint32))

            def body(carry, xs):
                gsum, stats, lsum = carry
                b, r = xs
                loss, grads, stats = self._loss_and_grads(
                    state.params, stats, b, r)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
                return (gsum, stats, lsum + loss), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (gsum, new_stats, lsum), _ = jax.lax.scan(
                body, (zeros, state.batch_stats, jnp.zeros(())),
                (stacked, rngs))
            grads = jax.tree_util.tree_map(lambda g: g / k, gsum)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params=params, opt_state=opt_state,
                              step=state.step + 1,
                              batch_stats=new_stats), lsum / k

        return jax.jit(accum, donate_argnums=(0,))

    def _eval_logits(self, params, batch_stats, batch: GraphBatch):
        batch = from_wire(batch)
        out, _ = self._apply(params, batch_stats, batch, deterministic=True)
        logits, _ = _model_outputs(out)
        return logits

    # -- public API -------------------------------------------------------
    def make_multi_step(self, k: int):
        """jit'd k-steps-per-dispatch: `lax.scan` of the train step over k
        STACKED microbatches (every GraphBatch leaf gains a leading [k]
        axis — see `stack_batches`). One dispatch through the runtime per
        k optimizer steps. Honest A/B at the canonical config (TPU v5e
        behind the axon relay, bf16, 2026-08-17): 4.65/4.67 ms/step at
        k=4/8 vs 4.53 for one-step dispatches — NEUTRAL here, because
        async dispatch already pipelines the ~1.1 ms per-dispatch relay
        latency across chained steps. The scan wins where dispatch is a
        real bottleneck (host-bound loops, very small models, pod
        runtimes with per-step host work between dispatches). The rng
        folding matches `train_epoch`'s (fold_in(rng, i)), so k scanned
        steps produce bit-identical states to k sequential `_jit_step`
        calls.

        Returns step_k(state, stacked_batch, rng) -> (state, losses[k]);
        the input state's buffers are donated."""
        def multi(state, stacked: GraphBatch, rng):
            rngs = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
                rng, jnp.arange(k, dtype=jnp.uint32))

            def body(s, xs):
                b, r = xs
                return self._step(s, b, r)

            return jax.lax.scan(body, state, (stacked, rngs))

        return jax.jit(multi, donate_argnums=(0,))

    def train_epoch(self, state: TrainState, batches: Sequence[GraphBatch],
                    rng) -> Tuple[TrainState, float]:
        losses = []
        for i, b in enumerate(batches):
            state, loss = self._jit_step_donated(
                state, b, jax.random.fold_in(rng, i))
            losses.append(loss)
        # ONE device round trip for the epoch mean: fetching each scalar
        # individually costs a full host<->device RTT per batch (~25 ms
        # behind this relay — it dominated epoch time 2.5 s vs 0.5 s)
        return state, float(jnp.stack(losses).mean())

    def evaluate(self, state: TrainState, batches: Sequence[GraphBatch]):
        """Split-level metrics: concatenate predictions over all batches
        first (rank metrics like ROC-AUC/AP are not batch-decomposable, and
        a positive-free batch would yield NaN). Requires node-level batches
        to share a padded length (make_batches guarantees this)."""
        # bounded async window: dispatch up to `window` eval programs
        # ahead of the fetches, so each device->host round trip overlaps
        # later batches' compute without holding the whole split's
        # logits+inputs in device memory at once
        window = 8
        logits_all, y_all, mask_all = [], [], []
        in_flight = []

        def fetch(b, dl):
            logits = np.asarray(dl)
            y = np.asarray(b.y)
            if b.graph_mask is not None:
                # packed batches: flatten the valid graph slots
                gm = np.asarray(b.graph_mask).reshape(-1)
                logits = logits.reshape((-1,) + logits.shape[2:])[gm]
                y = y.reshape((-1,) + y.shape[2:])[gm]
            logits_all.append(logits)
            y_all.append(y)
            if b.node_mask is not None and b.graph_mask is None:
                mask_all.append(np.asarray(b.node_mask))

        for b in batches:
            in_flight.append(
                (b, self._jit_eval(state.params, state.batch_stats, b)))
            if len(in_flight) >= window:
                fetch(*in_flight.pop(0))
        while in_flight:
            fetch(*in_flight.pop(0))
        logits = np.concatenate(logits_all, axis=0)
        y = np.concatenate(y_all, axis=0)
        mask = np.concatenate(mask_all, axis=0) if mask_all else None
        return task_metric(self.cfg.task, logits, y, mask,
                           binary_metric=self.cfg.binary_metric)

    def fit(self, train_batches: Sequence[GraphBatch],
            val_batches: Optional[Sequence[GraphBatch]] = None,
            test_batches: Optional[Sequence[GraphBatch]] = None,
            epochs: Optional[int] = None,
            log_fn: Optional[Callable[[dict], None]] = None,
            rebatch_fn: Optional[Callable[[int], Sequence[GraphBatch]]]
            = None,
            ckpt_dir: Optional[str] = None,
            ckpt_async: bool = False,
            resume: bool = False):
        """rebatch_fn(epoch) -> fresh training batches: full per-epoch
        reshuffling at the graph level, matching the reference's
        DataLoader(shuffle=True). Without it, the fixed batches are
        replayed in a new ORDER each epoch (cheaper through the device
        relay, but batch composition stays fixed).

        ckpt_dir: per-epoch checkpoint of the live TrainState with a
        keep-latest policy — the reference saves every epoch and prunes
        files older than epoch-1 (LPE main_ZINC_graph_regression.py:
        184-195).

        resume=True restarts from ckpt_dir's latest checkpoint and
        continues the EXACT uninterrupted trajectory: the TrainState
        (params/opt_state/step/batch_stats, which carries any
        plateau-injected lr) comes from orbax; host-side loop state —
        plateau counters, best_val/best_epoch — from the fit_meta.json
        sidecar written with each save; the epoch-order numpy generator
        is fast-forwarded through the completed epochs; per-epoch
        training rngs are pure functions of (seed, epoch) already. The
        best-so-far WEIGHTS are the one thing not re-materialized (only
        their score is): after a crash the best state is approximated by
        the resume point until a better epoch appears — exact best
        weights need the best epoch's checkpoint still on disk
        (raise max_to_keep)."""
        cfg = self.cfg
        # host->device transfers are expensive (here the chip sits behind a
        # network relay); place every batch on device once up front,
        # optionally in the compact wire format (cfg.wire). With
        # cfg.stream the TRAIN batches stay host-resident and flow
        # through the per-epoch prefetcher below instead.
        up = (lambda b: jax.device_put(to_wire(b))) if cfg.wire \
            else jax.device_put
        if not cfg.stream:
            train_batches = [up(b) for b in train_batches]
        if val_batches is not None:
            val_batches = [up(b) for b in val_batches]
        if test_batches is not None:
            test_batches = [up(b) for b in test_batches]
        rng, init_rng = jax.random.split(jax.random.key(cfg.seed))
        state = self.init(init_rng, train_batches[0])
        history: List[dict] = []
        best_val, best_state, best_epoch = None, state, 0
        order_rng = np.random.default_rng(cfg.seed)
        mode = "min" if cfg.task == "graph_reg" else "max"
        ckpt_mgr = None
        meta_path = None
        if ckpt_dir is not None:
            import os
            from feta_tmlr_tpu.train.checkpoint import CheckpointManager
            # ckpt_async overlaps each epoch's checkpoint IO with the
            # next epoch's training (safe with the donated step loop:
            # orbax copies device arrays out synchronously at save())
            ckpt_mgr = CheckpointManager(ckpt_dir, max_to_keep=2,
                                         async_save=ckpt_async)
            meta_path = os.path.join(os.path.abspath(ckpt_dir),
                                     "fit_meta.json")
        start_epoch = 0
        if resume and ckpt_mgr is not None \
                and ckpt_mgr.latest_step() is not None:
            import json as _json
            import os
            last = ckpt_mgr.latest_step()
            state = ckpt_mgr.restore(state, step=last)
            best_state = state
            start_epoch = last + 1
            if meta_path and os.path.isfile(meta_path):
                with open(meta_path) as f:
                    meta = _json.load(f)
                best_val = meta.get("best_val")
                best_epoch = meta.get("best_epoch", last)
                if self.plateau is not None:
                    self.plateau.best = meta.get("plateau_best")
                    self.plateau.bad_epochs = meta.get("plateau_bad", 0)
                    self.plateau.scale = meta.get("plateau_scale", 1.0)
            # fast-forward the epoch-order generator through completed
            # epochs so batch order continues the uninterrupted sequence
            for _ in range(start_epoch):
                order_rng.permutation(len(train_batches))
        t_start = time.perf_counter()
        try:
          for epoch in range(start_epoch, epochs or cfg.epochs):
            t0 = time.perf_counter()
            if rebatch_fn is not None and epoch > 0:
                train_batches = (list(rebatch_fn(epoch)) if cfg.stream
                                 else [up(b) for b in rebatch_fn(epoch)])
            epoch_batches = [train_batches[i] for i in
                             order_rng.permutation(len(train_batches))]
            if cfg.stream:
                from feta_tmlr_tpu.data.prefetch import prefetch_to_device
                epoch_batches = prefetch_to_device(
                    epoch_batches, buffer_size=3,
                    collate_fn=(to_wire if cfg.wire else None))
            state, loss = self.train_epoch(
                state, epoch_batches, jax.random.fold_in(rng, epoch))
            row = {"epoch": epoch, "loss": loss,
                   "time": time.perf_counter() - t0}
            if cfg.debug_nan:
                _check_finite(state, loss, epoch)
            if val_batches is not None:
                vm = self.evaluate(state, val_batches)
                row.update({f"val_{k}": v for k, v in vm.items()})
                key = next(iter(vm))
                cur = vm[key]
                improved = (
                    best_val is None or np.isnan(best_val)
                    or (not np.isnan(cur)
                        and ((mode == "min" and cur < best_val)
                             or (mode == "max" and cur > best_val))))
                if improved:
                    # deep-copy on device: the donated fit loop will reuse
                    # (invalidate) the live state's buffers next epoch
                    best_val, best_epoch = vm[key], epoch
                    best_state = jax.tree_util.tree_map(jnp.copy, state)
                if self.plateau is not None:
                    new_lr = self.plateau.step(vm[key], cfg.lr)
                    state = _set_lr(state, new_lr)
                    row["lr"] = new_lr
            history.append(row)
            if log_fn:
                log_fn(row)
            if ckpt_mgr is not None:
                ckpt_mgr.save(epoch, state)
                if meta_path:
                    import json as _json
                    meta = {"epoch": epoch,
                            "best_val": (None if best_val is None
                                         else float(best_val)),
                            "best_epoch": best_epoch}
                    if self.plateau is not None:
                        meta.update(
                            plateau_best=(None if self.plateau.best is None
                                          else float(self.plateau.best)),
                            plateau_bad=self.plateau.bad_epochs,
                            plateau_scale=self.plateau.scale)
                    tmp = meta_path + ".tmp"
                    with open(tmp, "w") as f:
                        _json.dump(meta, f)
                    import os
                    os.replace(tmp, meta_path)
            if (cfg.stop_at_min_lr and self.plateau is not None
                    and row.get("lr", cfg.lr) <= cfg.min_lr):
                print("lr <= min_lr, stopping")
                break
            if (cfg.max_time_h is not None
                    and time.perf_counter() - t_start
                    > cfg.max_time_h * 3600):
                print("max_time reached, stopping")
                break
        except KeyboardInterrupt:
            # reference catch: finish with the best state so far
            # (LPE main_ZINC_graph_regression.py:209-211)
            print("interrupted, exiting from training early")
        finally:
            if ckpt_mgr is not None:
                ckpt_mgr.close()
        if val_batches is None:
            best_state = state        # no selection: final state is live
        result = {"history": history, "best_epoch": best_epoch,
                  "best_val": best_val, "state": best_state}
        if test_batches is not None:
            result["test"] = self.evaluate(best_state, test_batches)
        return result


class NonFiniteError(RuntimeError):
    """Raised by TrainConfig.debug_nan when training diverges; carries
    the offending parameter paths."""


def _check_finite(state: TrainState, loss: float, epoch: int) -> None:
    if not np.isfinite(loss):
        raise NonFiniteError(f"non-finite loss {loss} at epoch {epoch}")
    bad = []
    # ONE device->host transfer for the whole tree: per-leaf np.asarray
    # would pay a full relay round trip (~25 ms) per parameter leaf
    host_params = jax.device_get(state.params)
    flat = jax.tree_util.tree_flatten_with_path(host_params)[0]
    for path, leaf in flat:
        a = np.asarray(leaf)
        if not np.all(np.isfinite(a)):
            bad.append(f"{jax.tree_util.keystr(path)}: nan/inf")
        elif a.size and np.max(np.abs(a)) > 1000:
            # reference flags |param| > 1000 as exploding (:168-173)
            bad.append(f"{jax.tree_util.keystr(path)}: "
                       f"max|p|={np.max(np.abs(a)):.1f}")
    if bad:
        raise NonFiniteError(
            f"epoch {epoch}: bad parameters\n  " + "\n  ".join(bad))


def _set_lr(state: TrainState, lr: float) -> TrainState:
    """Inject the plateau-scheduled lr into the optax state. The
    inject_hyperparams state is itself a NamedTuple (i.e. a tuple!), so
    check the state DIRECTLY first; only when it isn't the injectable
    state treat it as an optax.chain tuple (grad_clip_norm) and search
    its elements."""
    def inject(os_):
        if hasattr(os_, "hyperparams"):
            os_.hyperparams["learning_rate"] = jnp.asarray(lr)
            return True
        return False

    os_ = state.opt_state
    if not inject(os_) and isinstance(os_, tuple):
        for el in os_:
            if inject(el):
                break
    return state
