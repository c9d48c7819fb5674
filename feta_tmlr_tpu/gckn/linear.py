"""L-BFGS-fit linear classifier for GCKN features.

TPU-native rebuild of the reference's `Linear` head
(gckn/layers.py:213-302): a linear model whose weights are fit in closed
loop by scipy's L-BFGS-B on the SUM-reduced loss plus an L2 penalty
0.5 * alpha * ||W||^2, exposing the sklearn-flavoured
decision_function / predict / predict_proba surface. It is the classifier
`GCKNet.unsup_train_classifier` fits after unsupervised feature training
(gckn/models.py:264-266).

Design: the objective/gradient live in ONE jitted jax value_and_grad over
the flat parameter vector (loss registry matching gckn/loss.py:LOSS =
{'ce','hinge'}); scipy drives the quasi-Newton iteration on host. The
problem is tiny (pooled graph features x classes) so the fit is
host-latency bound either way, but each objective evaluation is a single
fused XLA computation.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from feta_tmlr_tpu.train.losses import cross_entropy, hinge_loss


def _sum_loss(kind: str, logits, y, n_classes: int):
    if kind == "ce":
        if logits.shape[-1] == 1:
            # binary BCE-with-logits (reference default criterion)
            yf = y.astype(logits.dtype)
            z = logits[..., 0]
            per = jnp.maximum(z, 0) - z * yf + jnp.log1p(jnp.exp(-jnp.abs(z)))
            return per.sum()
        # losses return per-batch means; rescale to the reference's
        # sum reduction (layers.py:229-230) so alpha has the same scale
        return cross_entropy(logits, y, n_classes) * y.shape[0]
    if kind == "hinge":
        return hinge_loss(logits, y, n_classes) * y.shape[0]
    raise ValueError(f"unknown loss {kind!r} (choose 'ce' or 'hinge')")


class LinearClassifier:
    """Linear head fit by L-BFGS; weights live as a [out, in(+1)] matrix."""

    def __init__(self, in_features: int, out_features: int,
                 alpha: float = 0.0, fit_bias: bool = True,
                 loss: str = "ce"):
        self.in_features = in_features
        self.out_features = out_features
        self.alpha = float(alpha)
        self.fit_bias = fit_bias
        self.loss = loss
        self.weight = np.zeros((out_features, in_features), np.float32)
        self.bias = np.zeros((out_features,), np.float32) if fit_bias \
            else None

    def _objective(self, x, y):
        n_cls = self.out_features
        d = self.in_features
        alpha = self.alpha
        kind = self.loss

        @jax.jit
        @jax.value_and_grad
        def value_grad(wflat):
            w = wflat.reshape(n_cls, -1)
            kernel, b = (w[:, :d], w[:, d]) if self.fit_bias else (w, 0.0)
            logits = x @ kernel.T + b
            loss = _sum_loss(kind, logits, y, n_cls)
            # penalty on the kernel only, like the reference (layers.py:253)
            return loss + 0.5 * alpha * jnp.sum(kernel ** 2)

        return value_grad

    def fit(self, x, y, max_iter: int = 1000):
        from scipy import optimize

        from feta_tmlr_tpu.gckn.models import _host_cpu

        # scipy calls the objective once per quasi-Newton iteration; on a
        # remote accelerator every call pays the full dispatch round trip
        # (~25 ms behind this relay x hundreds of iterations), while the
        # problem itself is tiny — pin the fit to the host CPU backend
        # (same policy as GCKNFeature.unsup_train). Committed CPU inputs
        # keep the jit on CPU for every later scipy callback too.
        cpu = _host_cpu()
        x = jax.device_put(np.asarray(x, np.float32), cpu)
        y = jax.device_put(np.asarray(y), cpu)
        value_grad = self._objective(x, y)

        def f(wflat64):
            w32 = jax.device_put(
                np.asarray(wflat64, np.float32), cpu)
            v, g = value_grad(w32)
            return float(v), np.asarray(g, np.float64).ravel()

        w0 = self.weight
        if self.fit_bias:
            w0 = np.concatenate([w0, self.bias[:, None]], axis=1)
        w, _, _ = optimize.fmin_l_bfgs_b(
            f, w0.astype(np.float64).ravel(), maxiter=max_iter)
        w = w.reshape(self.out_features, -1).astype(np.float32)
        if self.fit_bias:
            self.weight, self.bias = w[:, :-1], w[:, -1]
        else:
            self.weight = w
        return self

    def decision_function(self, x):
        out = np.asarray(x, np.float32) @ self.weight.T
        if self.fit_bias:
            out = out + self.bias
        return out

    def predict(self, x):
        scores = self.decision_function(x)
        if self.out_features == 1:
            return (scores[:, 0] > 0).astype(np.int64)
        return scores.argmax(-1)

    def predict_proba(self, x):
        scores = self.decision_function(x)
        if self.out_features == 1:
            p = 1.0 / (1.0 + np.exp(-scores[:, 0]))
            return np.stack([1 - p, p], axis=-1)
        e = np.exp(scores - scores.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    @property
    def coef_(self):
        return self.weight

    @property
    def intercept_(self):
        return self.bias
