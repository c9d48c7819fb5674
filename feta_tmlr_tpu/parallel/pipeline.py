"""GPipe-style pipeline parallelism for the FeTA model ('pp' mesh axis).

The reference scales only through replica data parallelism
(nn.DataParallel, SURVEY.md §2.8). On TPU pods the natural complement to
the repo's tensor/data/edge sharding is pipelining over DEPTH: the FeTA
model's L-1 homogeneous unfiltered GraphiT layers (nn/feta.py:226-236)
are split into S stages along a 'pp' mesh axis and microbatches stream
through them on the classic GPipe schedule — M + S - 1 ticks, one
neighbour-to-neighbour `ppermute` hop per tick, so activations only ever
cross one ICI link and no stage ever holds another stage's weights.

TPU-first design notes:
  - the stage body applies the REAL flax `GraphiTEncoderLayer` module on
    the stage's stacked parameter slice — cross-stage parity with the
    dense model is structural, not re-derived math;
  - parameters are the UNMODIFIED flax tree of
    `DiffGraphTransformerGenGCN`; `stack_pipeline_params` reshapes the
    L-1 layer subtrees into [S, k, ...] leaves that shard over 'pp'
    (the stack happens inside the jitted forward, so gradients flow to
    the original per-layer tree and any optimizer state layout keeps
    working unchanged);
  - the front (embeddings) and the back (final FILTERED layer: the
    coefficient head, dynamic Chebyshev filter and skip fusion) run
    replicated — the back is literally a 1-layer `FeTAEncoder.apply` on
    remapped subtrees, i.e. the exact module users train single-chip;
  - the whole forward is differentiable (`lax.scan` + `ppermute`
    transpose), so one `jit(value_and_grad)` trains the pipelined model
    end to end; bubble-tick computations never reach the loss and
    therefore contribute zero gradient.

Scope mirrors `parallel/feta_partitioned.py`: deterministic core
(dropout lives in the host trainer), `last_layer_filter=True` (the
reference's default — the L-1 pipelined layers are exactly the
unfiltered chain). Both norms are supported. BatchNorm semantics under
pipelining: statistics are taken PER MICROBATCH inside each stage —
exact full-batch statistics would require holding every microbatch's
activations at a layer simultaneously, which is precisely what GPipe
streaming avoids (a two-pass schedule would double compute). This is
the same approximation torch's nn.DataParallel makes per replica
(per-device statistics, the reference's only parallel mode,
run_transformer_gckn_gengcn_molpcba.py:469-475); with one microbatch it
is exact, and tests/test_pipeline.py checks that case against the dense
model. The back (filtered) layer always sees the full batch, so its
statistics are exact regardless of the microbatch count.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from feta_tmlr_tpu.data.batch import GraphBatch
from feta_tmlr_tpu.nn.feta import FeTAEncoder
from feta_tmlr_tpu.nn.layers import GraphiTEncoderLayer


def stack_pipeline_params(params, n_layers: int, n_stages: int):
    """[S, k, ...] stacked tree of the L-1 unfiltered layer subtrees.

    Differentiable (jnp.stack of the original leaves) so it can run
    inside the jitted forward and grads land on the unmodified tree.
    """
    n_chain = n_layers - 1
    if n_chain % n_stages:
        raise ValueError(
            f"{n_chain} pipelined layers not divisible by {n_stages} stages")
    k = n_chain // n_stages
    enc = params["params"]["encoder"]
    chain = [enc[f"layer_{i}"] for i in range(n_chain)]
    return jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape((n_stages, k) + xs[0].shape),
        *chain)


def _back_variables(params, n_layers: int):
    """Param tree for the 1-layer filtered FeTAEncoder (the 'back')."""
    enc = params["params"]["encoder"]
    sub = {"layer_0": enc[f"layer_{n_layers - 1}"],
           "coeff_head": enc["coeff_head"]}
    for name in ("cheb_bias", "cheb_weight", "linear_cat",
                 "arma_init_weight", "arma_root_weight", "arma_bias"):
        if name in enc:
            sub[name] = enc[name]
    return {"params": sub}


def make_pipelined_forward(mesh: Mesh, model, n_microbatches: int,
                           axis: str = "pp",
                           data_axis: Optional[str] = None,
                           remat: bool = False):
    """forward(params, batch) -> (logits, coeff) for a
    `DiffGraphTransformerGenGCN`, with the unfiltered layer chain
    pipelined over `mesh`'s `axis`.

    `params` is the unmodified flax tree of `model`; `batch` a dense
    GraphBatch whose graph count divides `n_microbatches`.

    With `data_axis` set (2-D pp x data mesh), each microbatch is
    additionally sharded over the data axis: stages hold the same 'pp'
    parameter slice on every data replica, activations ppermute along
    'pp' within a data shard, and parameter gradients reduce over 'data'
    automatically through shard_map's autodiff.

    remat=True checkpoints each stage application — GPipe's own
    re-materialization: the scan then saves only each tick's stage I/O
    ([mb, N, D] activations) instead of the layer internals (the
    [mb, H, N, N] attention chains), and the backward replays one stage
    forward per tick. Bit-exact gradients, ~M x smaller pipeline
    activation footprint, one extra forward of compute.
    """
    S = mesh.shape[axis]
    M = n_microbatches
    dp = mesh.shape[data_axis] if data_axis else 1
    bn = bool(getattr(model, "batch_norm", False))
    layer = GraphiTEncoderLayer(
        model.d_model, model.nb_heads, model.dim_feedforward,
        0.0, bn)
    back_enc = FeTAEncoder(
        d_model=model.d_model, n_heads=model.nb_heads, n_layers=1,
        dim_feedforward=model.dim_feedforward, dropout=0.0,
        batch_norm=bn, filter_order=model.filter_order,
        gnn_type=model.gnn_type, last_layer_filter=True,
        learn_only_filter_order_coeff=model.learn_only_filter_order_coeff,
        use_skip_conn=model.use_skip_conn)
    k = (model.nb_layers - 1) // S
    perm = [(i, (i + 1) % S) for i in range(S)]

    def stage_apply(stage_params, x, pe, mask, deg):
        for j in range(k):
            lp = jax.tree.map(lambda a: a[j], stage_params)
            if bn:
                # train-mode statistics over THIS microbatch (see module
                # docstring); the updated running averages are discarded —
                # the host trainer owns eval-time statistics
                (x, _, _), _ = layer.apply(
                    {"params": lp}, x, pe, mask, deg, False, None, False,
                    mutable=["batch_stats"])
            else:
                x, _, _ = layer.apply({"params": lp}, x, pe, mask, deg,
                                      True, None, False)
        return x

    if remat:
        stage_apply = jax.checkpoint(stage_apply)

    def pipeline_local(stacked, x_mb, pe_mb, mask_mb, deg_mb):
        """Inside shard_map: stacked leaves [1, k, ...] (this stage's
        slice); data args replicated [M, mb, ...]."""
        sl = jax.tree.map(lambda a: a[0], stacked)
        idx = jax.lax.axis_index(axis)
        # carries become device-varying after the first ppermute (and over
        # the data axis when microbatches are sharded); mark the
        # (replicated) zero inits varying up front so scan types line up
        vaxes = (axis,) + ((data_axis,) if data_axis else ())
        zero = jax.lax.pcast(jnp.zeros(x_mb.shape[1:], x_mb.dtype),
                             vaxes, to="varying")
        out0 = jax.lax.pcast(jnp.zeros(x_mb.shape, x_mb.dtype),
                             vaxes, to="varying")

        def tick(carry, t):
            buf, outputs = carry
            recv = jax.lax.ppermute(buf, axis, perm)
            x_in = jnp.where(idx == 0,
                             x_mb[jnp.clip(t, 0, M - 1)], recv)
            mb_id = jnp.clip(t - idx, 0, M - 1)
            out = stage_apply(
                sl, x_in, pe_mb[mb_id], mask_mb[mb_id],
                None if deg_mb is None else deg_mb[mb_id])
            slot = jnp.clip(t - (S - 1), 0, M - 1)
            take = (t - (S - 1) >= 0) & (idx == S - 1)
            prev = jax.lax.dynamic_index_in_dim(outputs, slot, 0,
                                                keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(take, out, prev), slot, 0)
            return (out, outputs), None

        (_, outputs), _ = jax.lax.scan(
            tick, (zero, out0), jnp.arange(M + S - 1))
        # only the last stage holds real outputs; broadcast them
        return jax.lax.psum(
            jnp.where(idx == S - 1, outputs, 0.0), axis)

    def forward(params, batch: GraphBatch):
        p = params["params"]
        x = batch.x @ p["embedding"]["kernel"]
        if model.lap_pos_enc and batch.lap_pe is not None:
            el = p["embedding_lap_pos_enc"]
            x = x + batch.lap_pe @ el["kernel"] + el["bias"]
        B, N, D = x.shape
        if B % (M * dp):
            raise ValueError(
                f"batch {B} not divisible by {M} microbatches x {dp} "
                "data shards")
        mb = B // M

        def split(a):
            return a.reshape((M, mb) + a.shape[1:])

        has_deg = batch.degree is not None
        dspec = P(None, data_axis)   # microbatch dim whole, rows sharded
        data_specs = (dspec, dspec, dspec) + ((dspec,) if has_deg else ())
        fn = shard_map(
            (pipeline_local if has_deg else
             lambda st, xm, pm, mm: pipeline_local(st, xm, pm, mm, None)),
            mesh=mesh,
            in_specs=(P(axis),) + data_specs,
            out_specs=dspec)
        args = [stack_pipeline_params(params, model.nb_layers, S),
                split(x), split(batch.pe), split(batch.node_mask)]
        if has_deg:
            args.append(split(batch.degree))
        h = fn(*args).reshape(B, N, D)

        if bn:
            # full batch here, so these statistics are exact
            (out, _attn, coeff), _ = back_enc.apply(
                _back_variables(params, model.nb_layers), h, batch.pe,
                batch.adj, batch.node_mask, degree=batch.degree,
                deterministic=False, mutable=["batch_stats"])
        else:
            out, _attn, coeff = back_enc.apply(
                _back_variables(params, model.nb_layers), h, batch.pe,
                batch.adj, batch.node_mask, degree=batch.degree)
        m = batch.node_mask.astype(out.dtype)[..., None]
        pooled = (out * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        cl = p["classifier"]
        hid = jax.nn.relu(pooled @ cl["fc1"]["kernel"] + cl["fc1"]["bias"])
        logits = hid @ cl["fc2"]["kernel"] + cl["fc2"]["bias"]
        return logits, coeff

    return forward


def make_pipeline_train_step(mesh: Mesh, model, n_microbatches: int,
                             lr: float = 1e-3, axis: str = "pp",
                             task: str = "graph_reg",
                             data_axis: Optional[str] = None,
                             remat: bool = False,
                             optimizer=None, donate: bool = False):
    """jit'd train step over the pipelined forward (L1 or CE loss).

    optimizer=None keeps plain SGD(lr): step(params, batch) ->
    (params, loss). With an optax GradientTransformation, pair with
    `optimizer.init(params)`: step(params, opt_state, batch) ->
    (params, opt_state, loss)."""
    forward = make_pipelined_forward(mesh, model, n_microbatches, axis,
                                     data_axis=data_axis, remat=remat)

    from feta_tmlr_tpu.parallel._step_util import build_step

    def loss_fn(p, batch):
        logits, _ = forward(p, batch)
        if task == "graph_reg":
            return jnp.abs(logits.reshape(jnp.shape(batch.y))
                           - batch.y).mean()
        onehot = jax.nn.one_hot(batch.y, logits.shape[-1])
        return -(jax.nn.log_softmax(logits) * onehot).sum(-1).mean()

    return build_step(loss_fn, lr, optimizer, donate=donate)
