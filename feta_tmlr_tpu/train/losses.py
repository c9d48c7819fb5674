"""Loss functions beyond the task defaults.

HingeLoss rebuilds gckn/loss.py:8-43: squared multi-class hinge with
optional per-sample weighting and the reference's {'ce','hinge'} registry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hinge_loss(logits, labels, n_classes: int, weight=None,
               squared: bool = True, margin: float = 1.0):
    """One-vs-all squared hinge (gckn/loss.py:8-43).

    Reference semantics: loss = 0.5 * relu(margin - signs*logits)^2 with an
    optional PER-CLASS weight [n_classes] applied before the class sum."""
    onehot = jax.nn.one_hot(labels, n_classes)
    signs = 2.0 * onehot - 1.0
    err = nn_relu(margin - signs * logits)
    if squared:
        err = 0.5 * err ** 2
    if weight is not None:
        err = err * jnp.asarray(weight)[None, :]
    return err.sum(-1).mean()


def cross_entropy(logits, labels, n_classes: int, weight=None):
    onehot = jax.nn.one_hot(labels, n_classes)
    per_sample = -jnp.sum(jax.nn.log_softmax(logits) * onehot, -1)
    if weight is not None:
        per_sample = per_sample * weight
    return per_sample.mean()


def nn_relu(x):
    return jnp.maximum(x, 0.0)


LOSS = {"ce": cross_entropy, "hinge": hinge_loss}
