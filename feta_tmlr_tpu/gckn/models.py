"""GCKN feature extractor (unsupervised path-kernel node features).

Rebuild of `PathSequential`/`GCKNetFeature`
(/root/reference/gckn/models.py:7-217): a stack of path layers trained by
spherical k-means over sampled paths, then used to encode per-node features.
The encoded features feed the transformer through the lap-PE input path
(transformer/gckn_pe.py:10-119).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from feta_tmlr_tpu.data.batch import Graph
from feta_tmlr_tpu.gckn.layer import (
    PathLayerParams,
    init_path_layer,
    path_layer_forward,
    sample_paths,
    unsup_train_layer,
)
from feta_tmlr_tpu.gckn.paths import PathBatch, build_path_batch


def _total_paths(batch) -> int:
    return int(sum(p.shape[0] for p in batch.path_indices))


def _auto_device(n_paths: int, device=None, op: str = "encode"):
    """Data-driven GCKN device policy (VERDICT r2 item 6).

    Round-2 pinned the whole tier to the host CPU from ONE small
    measurement (22x at 128 ZINC graphs); the crossover study
    (examples/gckn_crossover.py, on-chip table in BASELINE.md,
    2026-08-18) measured the two operations separately and they
    diverge:

      - `encode` (one batched jitted forward per call) crosses over
        early: round-4 re-measurement (2026-08-19, jitted warm path)
        has the accelerator ahead at EVERY scale — 1.2x at 50k paths,
        1.63x at 385k, 1.68x at 1.56M. Default threshold 50k paths;
        datasets beyond device memory use encode(chunk_graphs=...).
      - `unsup` (spherical k-means) never crossed over even after the
        round-4 fair shot — the whole Lloyd loop as ONE jitted
        while_loop (kmeans.spherical_kmeans_jax): 44-60 s on-accel vs
        2-4 s host numpy at every scale, dominated by the one-shot
        XLA compile of the loop. unsup is a run-once pretrain step, so
        its cold compile is honestly part of its cost; the default
        threshold stays effectively infinite.

    Overrides: FETA_GCKN_DEVICE=cpu|accel forces a side for both ops;
    FETA_GCKN_TPU_MIN_PATHS / FETA_GCKN_TPU_MIN_PATHS_UNSUP tune the
    per-op thresholds.
    """
    if device is not None:
        return device
    import os
    forced = os.environ.get("FETA_GCKN_DEVICE")
    if forced == "cpu":
        return _host_cpu()
    if forced in ("accel", "tpu"):
        return jax.devices()[0]
    accel = jax.devices()[0]
    if op == "unsup":
        thresh = int(os.environ.get("FETA_GCKN_TPU_MIN_PATHS_UNSUP",
                                    str(1 << 62)))
    else:
        thresh = int(os.environ.get("FETA_GCKN_TPU_MIN_PATHS", "50000"))
    if accel.platform != "cpu" and n_paths >= thresh:
        return accel
    return _host_cpu()


def _host_cpu():
    """The host CPU jax device (falls back to the default device on
    builds without a CPU backend registered)."""
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return jax.devices()[0]


@dataclasses.dataclass
class GCKNFeature:
    """Multi-layer GCKN encoder with k-means pretraining."""

    layers: List[PathLayerParams]
    path_sizes: List[int]
    aggregation: bool = False

    @classmethod
    def create(cls, input_size: int, hidden_sizes: Sequence[int],
               path_sizes: Sequence[int], kernel_args=0.5,
               pooling: str = "mean", aggregation: bool = False,
               seed: int = 0) -> "GCKNFeature":
        layers = []
        rng = jax.random.key(seed)
        in_size = input_size
        if not isinstance(kernel_args, (list, tuple)):
            kernel_args = [kernel_args] * len(hidden_sizes)
        for i, (h, s) in enumerate(zip(hidden_sizes, path_sizes)):
            rng, sub = jax.random.split(rng)
            layers.append(init_path_layer(
                sub, in_size, h, s, kernel_arg=kernel_args[i],
                pooling=pooling, aggregation=aggregation))
            in_size = h
        return cls(layers=list(layers), path_sizes=list(path_sizes),
                   aggregation=aggregation)

    @property
    def max_path_size(self) -> int:
        return max(self.path_sizes)

    def unsup_train(self, graphs: Sequence[Graph],
                    n_sampling_paths: int = 100000, seed: int = 0,
                    device=None) -> PathBatch:
        """k-means pretrain all layers over enumerated paths
        (gckn/models.py:72-122).

        GCKN pretraining/encoding is the PE-PRECOMPUTE tier (its output
        is cached and fed as a training-time-constant input), and the
        k-means pipeline is a chain of small sequential ops whose
        per-dispatch latency to a remote accelerator dominates at every
        measured scale (5-12x slower on-accel up to 1.56M paths,
        on-chip crossover study 2026-08-18) — so unsup stays on host
        CPU by default regardless of size (`_auto_device(op="unsup")`;
        examples/gckn_crossover.py). Pass `device` to override, or
        FETA_GCKN_DEVICE=cpu|accel."""
        batch = build_path_batch(graphs, self.max_path_size)
        dev = _auto_device(_total_paths(batch), device, op="unsup")
        import os as _os
        km_impl = _os.environ.get("FETA_GCKN_KMEANS")
        # on an accelerator run the Lloyd loop as ONE jitted while_loop
        # (kmeans.spherical_kmeans_jax) — the numpy loop's hundreds of
        # small ops each pay the relay RTT; FETA_GCKN_KMEANS=numpy|jax
        # forces either implementation on any device
        use_jax_km = (dev.platform != "cpu" if km_impl is None
                      else km_impl == "jax")
        with jax.default_device(dev):
            features = jnp.asarray(batch.features)
            for i, layer in enumerate(self.layers):
                paths = sample_paths(layer, features, batch,
                                     n_sampling_paths, seed=seed + i)
                self.layers[i] = unsup_train_layer(layer, paths,
                                                   seed=seed + i,
                                                   use_jax=use_jax_km)
                if i + 1 < len(self.layers):
                    # next layer samples from these features; after the
                    # LAST layer the full-dataset forward is dead work
                    # (and OOMs at PCQM4M scale on the accelerator)
                    features = path_layer_forward(self.layers[i],
                                                  features, batch)
        return batch

    def encode(self, graphs: Sequence[Graph],
               batch: Optional[PathBatch] = None,
               device=None,
               chunk_graphs: Optional[int] = None) -> List[np.ndarray]:
        """Per-node features, one [n_i, D] array per graph
        (gckn/models.py:124-153). Device chosen by the measured-crossover
        policy (see `unsup_train` / `_auto_device`); pass `device` to
        override.

        chunk_graphs: process the dataset in slices of this many graphs
        (each with its own PathBatch) — the bounded-working-set regime of
        the reference's MAXRAM chunking (gckn/path_conv_agg.py:7) for
        PCQM4M-scale datasets whose full path set exceeds device memory
        (a 16k-graph ZINC slice OOMed the v5e in one dispatch,
        examples/gckn_crossover.py)."""
        if chunk_graphs and len(graphs) > chunk_graphs:
            out = []
            for i in range(0, len(graphs), chunk_graphs):
                out.extend(self.encode(graphs[i:i + chunk_graphs],
                                       device=device))
            return out
        if batch is None:
            batch = build_path_batch(graphs, self.max_path_size)
        dev = _auto_device(_total_paths(batch), device)
        with jax.default_device(dev):
            features = jnp.asarray(batch.features)
            for layer in self.layers:
                features = path_layer_forward(layer, features, batch)
        flat = np.asarray(features[:-1])           # drop dummy row
        flat = flat.reshape(flat.shape[0], -1)
        out = []
        off = 0
        for n in batch.graph_n_nodes:
            out.append(flat[off:off + n])
            off += n
        return out

    @property
    def output_dim(self) -> int:
        last = self.layers[-1]
        q = 1
        for l, s in zip(self.layers, self.path_sizes):
            if l.aggregation:
                q *= s
        return q * last.hidden_size


class GCKNSupervised:
    """Supervised GCKN classifier (gckn/models.py:220-266 GCKNet,
    experiments/gckn_sup.py): path layers -> global mean node pooling ->
    BatchNorm -> linear classifier, trained end to end (optionally from a
    k-means unsupervised init). Functional: parameters are a flat dict of
    jnp arrays so optax drives them directly."""

    def __init__(self, input_size, hidden_sizes, path_sizes, n_classes,
                 kernel_args=0.5, pooling="mean", aggregation=False,
                 seed=0):
        self.feature = GCKNFeature.create(
            input_size, hidden_sizes, path_sizes, kernel_args, pooling,
            aggregation, seed)
        self.n_classes = n_classes
        rng = np.random.default_rng(seed)
        d = self.feature.output_dim
        self.init_params = {
            "classifier_w": jnp.asarray(
                rng.standard_normal((d, n_classes)) / np.sqrt(d),
                jnp.float32),
            "classifier_b": jnp.zeros((n_classes,), jnp.float32),
            "bn_scale": jnp.ones((d,), jnp.float32),
            "bn_bias": jnp.zeros((d,), jnp.float32),
        }
        for i, layer in enumerate(self.feature.layers):
            self.init_params[f"layer_{i}_weight"] = layer.weight

    def unsup_init(self, graphs, n_sampling_paths=10000, seed=0):
        batch = self.feature.unsup_train(graphs, n_sampling_paths, seed)
        for i, layer in enumerate(self.feature.layers):
            self.init_params[f"layer_{i}_weight"] = layer.weight
        return batch

    def pooled_features(self, params, batch: PathBatch):
        features = jnp.asarray(batch.features)
        for i, layer in enumerate(self.feature.layers):
            layer = dataclasses.replace(layer,
                                        weight=params[f"layer_{i}_weight"])
            features = path_layer_forward(layer, features, batch)
        flat = features.reshape(features.shape[0], -1)
        # global mean pool per graph (NodePooling, gckn/layers.py:190-210)
        seg = jnp.asarray(batch.node2graph)
        import jax as _jax
        pooled = _jax.ops.segment_sum(flat, seg, batch.n_graphs + 1)
        cnt = _jax.ops.segment_sum(jnp.ones_like(seg, jnp.float32), seg,
                                   batch.n_graphs + 1)
        return (pooled / jnp.maximum(cnt, 1.0)[:, None])[: batch.n_graphs]

    def compute_bn_stats(self, params, batch: PathBatch):
        """Frozen BatchNorm statistics from a (training) split — the
        counterpart of nn.BatchNorm1d's running averages in eval mode."""
        pooled = self.pooled_features(params, batch)
        return pooled.mean(0), pooled.var(0) + 1e-5

    def apply(self, params, batch: PathBatch, bn_stats=None):
        """Per-graph logits [n_graphs, n_classes].

        bn_stats: optional (mean, var) from `compute_bn_stats` for
        deterministic inference; without it, current-batch statistics are
        used (training mode)."""
        pooled = self.pooled_features(params, batch)
        if bn_stats is None:
            mean = pooled.mean(0)
            var = pooled.var(0) + 1e-5
        else:
            mean, var = bn_stats
        normed = (pooled - mean) / jnp.sqrt(var)
        normed = normed * params["bn_scale"] + params["bn_bias"]
        return normed @ params["classifier_w"] + params["classifier_b"]

    def unsup_train_classifier(self, params, batch: PathBatch, labels,
                               alpha: float = 0.0, loss: str = "ce",
                               bn_stats=None):
        """Fit only the linear head by L-BFGS on encoded features — the
        counterpart of GCKNet.unsup_train_classifier
        (gckn/models.py:264-266) after unsupervised feature training.
        Returns params with classifier_w/b replaced by the fitted ones."""
        from feta_tmlr_tpu.gckn.linear import LinearClassifier

        pooled = self.pooled_features(params, batch)
        if bn_stats is None:
            bn_stats = pooled.mean(0), pooled.var(0) + 1e-5
        mean, var = bn_stats
        feats = np.asarray((pooled - mean) / jnp.sqrt(var)
                           * params["bn_scale"] + params["bn_bias"])
        clf = LinearClassifier(feats.shape[1], self.n_classes,
                               alpha=alpha, loss=loss).fit(feats, labels)
        out = dict(params)
        out["classifier_w"] = jnp.asarray(clf.weight.T)
        out["classifier_b"] = jnp.asarray(clf.bias)
        return out


def gckn_encode_as_pe(graphs: Sequence[Graph], dim: int = 32,
                      path_size: int = 3, standardize: bool = True,
                      n_sampling_paths: int = 100000,
                      aggregation: bool = False, kernel_arg: float = 0.5,
                      pooling: str = "mean", seed: int = 0) -> int:
    """Attach GCKN features to graphs through the lap_pe slot
    (transformer/gckn_pe.py:10-41 + GCKNEncoding.apply_to :89-105).

    Returns the PE dimension.
    """
    model = GCKNFeature.create(
        input_size=graphs[0].x.shape[-1], hidden_sizes=[dim],
        path_sizes=[path_size], kernel_args=kernel_arg, pooling=pooling,
        aggregation=aggregation, seed=seed)
    batch = model.unsup_train(graphs, n_sampling_paths, seed=seed)
    feats = model.encode(graphs, batch)
    if standardize:
        allf = np.concatenate(feats)
        mean, std = allf.mean(0), allf.std(0) + 1e-8
        feats = [(f - mean) / std for f in feats]
    for g, f in zip(graphs, feats):
        g.lap_pe = f.astype(np.float32)
    return feats[0].shape[-1]
