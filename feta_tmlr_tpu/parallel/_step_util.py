"""Shared train-step assembly for the distributed step builders
(feta_partitioned / feta_batched / pipeline — one place to add
donation, clipping or loss scaling later)."""

from __future__ import annotations

import functools

import jax


def build_step(loss_fn, lr: float, optimizer=None, donate: bool = False):
    """jit'd step from `loss_fn(params, *inputs) -> scalar loss`.

    optimizer=None — plain SGD(lr):
        step(params, *inputs) -> (params, loss)
    optax GradientTransformation — pair with `optimizer.init(params)`:
        step(params, opt_state, *inputs) -> (params, opt_state, loss)

    Inputs are positional; optional operands (e.g. a degree vector) are
    passed explicitly as None.

    donate=True donates the param (and optimizer-state) buffers to the
    step so XLA updates them in place instead of reallocating every
    call — measured ~1.4x on the flagship single-chip step (BASELINE.md
    donated-vs-not row). The caller must then treat the passed-in
    arrays as consumed (thread the returned state, never reuse the old
    reference — the training-loop pattern every test and example here
    already follows). No-op on CPU.
    """
    if optimizer is None:
        @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
        def step(params, *inputs):
            loss, grads = jax.value_and_grad(loss_fn)(params, *inputs)
            params = jax.tree_util.tree_map(lambda p, g: p - lr * g,
                                            params, grads)
            return params, loss

        return step

    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def opt_step(params, opt_state, *inputs):
        import optax
        loss, grads = jax.value_and_grad(loss_fn)(params, *inputs)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return opt_step
