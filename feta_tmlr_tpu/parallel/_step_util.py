"""Shared train-step assembly for the distributed step builders
(feta_partitioned / feta_batched / pipeline — one place to add
donation, clipping or loss scaling later)."""

from __future__ import annotations

import jax


def build_step(loss_fn, lr: float, optimizer=None):
    """jit'd step from `loss_fn(params, *inputs) -> scalar loss`.

    optimizer=None — plain SGD(lr):
        step(params, *inputs) -> (params, loss)
    optax GradientTransformation — pair with `optimizer.init(params)`:
        step(params, opt_state, *inputs) -> (params, opt_state, loss)

    Inputs are positional; optional operands (e.g. a degree vector) are
    passed explicitly as None.
    """
    if optimizer is None:
        @jax.jit
        def step(params, *inputs):
            loss, grads = jax.value_and_grad(loss_fn)(params, *inputs)
            params = jax.tree_util.tree_map(lambda p, g: p - lr * g,
                                            params, grads)
            return params, loss

        return step

    @jax.jit
    def opt_step(params, opt_state, *inputs):
        import optax
        loss, grads = jax.value_and_grad(loss_fn)(params, *inputs)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return opt_step
