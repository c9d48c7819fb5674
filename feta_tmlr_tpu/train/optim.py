"""Optimizers and LR schedules matching the reference trainers.

The reference uses AdamW with:
  - StepLR(step_size=50, gamma=0.5) for TU CV
    (experiments/run_transformer_gengcn_cv.py:362,393-394);
  - ReduceLROnPlateau for ZINC and the LPE/LSPE mains
    (run_transformer_gengcn.py, LPE/main_ZINC_graph_regression.py:127-260);
  - linear warmup in the OGB scripts.

StepLR/warmup are pure optax schedules. Plateau reduction is metric-driven
and therefore host-side: `PlateauScheduler` tracks validation metrics between
epochs and exposes the current lr scale, injected through
`optax.inject_hyperparams` so the jitted step needn't recompile.
"""

from __future__ import annotations

import optax


def step_lr(base_lr: float, step_size: int, gamma: float,
            steps_per_epoch: int):
    """Torch StepLR semantics: lr * gamma^(epoch // step_size)."""
    def schedule(count):
        epoch = count // steps_per_epoch
        return base_lr * gamma ** (epoch // step_size)
    return schedule


def warmup_then_constant(base_lr: float, warmup_steps: int):
    def schedule(count):
        import jax.numpy as jnp
        frac = jnp.minimum(count / max(warmup_steps, 1), 1.0)
        return base_lr * frac
    return schedule


def warmup_inverse_sqrt(base_lr: float, warmup_steps: int,
                        floor: float = 1e-6):
    """Reference OGB/ZINC warmup (run_transformer_gengcn.py:310-316):
    linear 1e-6 -> lr over `warmup` steps, then lr * sqrt(warmup / step)."""
    def schedule(count):
        import jax.numpy as jnp
        s = jnp.maximum(count.astype(jnp.float32)
                        if hasattr(count, "astype") else float(count), 1.0)
        warm = floor + s * (base_lr - floor) / max(warmup_steps, 1)
        decay = base_lr * (warmup_steps ** 0.5) * s ** -0.5
        return jnp.where(s < warmup_steps, warm, decay)
    return schedule


class PlateauScheduler:
    """Host-side ReduceLROnPlateau (torch semantics, mode min/max)."""

    def __init__(self, factor: float = 0.5, patience: int = 10,
                 mode: str = "min", min_lr: float = 1e-6,
                 threshold: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.mode = mode
        self.min_lr = min_lr
        self.threshold = threshold
        self.best = None
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float, base_lr: float) -> float:
        # torch ReduceLROnPlateau default threshold_mode='rel':
        # min: a < best * (1 - th); max: a > best * (1 + th)
        better = (
            self.best is None
            or (self.mode == "min"
                and metric < self.best * (1.0 - self.threshold))
            or (self.mode == "max"
                and metric > self.best * (1.0 + self.threshold))
        )
        if better:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return max(base_lr * self.scale, self.min_lr)


def make_optimizer(lr, weight_decay: float = 1e-5,
                   injectable: bool = False,
                   grad_clip_norm=None):
    """AdamW; with injectable=True the learning rate becomes a runtime
    hyperparameter (for plateau scheduling without recompiles).
    grad_clip_norm: optional global-norm gradient clipping in front of
    the update (the reference has no clipping — its scripts drop into
    pdb on exploding params instead; this is the production knob)."""
    if injectable:
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=weight_decay)
    else:
        opt = optax.adamw(learning_rate=lr, weight_decay=weight_decay)
    if grad_clip_norm is not None:
        return optax.chain(optax.clip_by_global_norm(grad_clip_norm), opt)
    return opt
