"""Batched node-sharded FeTA (2-D data x nodes mesh) and the widened
single-graph partitioned envelope (BatchNorm tier, all-layers filtering)
vs the dense model — VERDICT round-2 item 4.

Every path consumes the UNMODIFIED flax params of
DiffGraphTransformerGenGCNSBM, so parity is checked against the exact
single-chip model, in the configuration the reference canonically trains
(run_transformer_gengcn_cv.py:57 --batch-norm, :76 --last_layer_filter).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.synthetic import sbm_like_dataset
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCNSBM
from feta_tmlr_tpu.parallel.feta_batched import (
    make_feta_batched_forward,
    make_feta_batched_train_step,
    prepare_batched_inputs,
)
from feta_tmlr_tpu.parallel.feta_partitioned import (
    make_feta_partitioned_forward,
    prepare_feta_inputs,
)
from feta_tmlr_tpu.pe import DiffusionEncoding

CFG = dict(d_model=16, nb_heads=2, nb_layers=2, filter_order=3)


def _dense_model(batch_norm=False, last_layer_filter=True):
    return DiffGraphTransformerGenGCNSBM(
        in_size=3, nb_class=2, d_model=CFG["d_model"],
        nb_heads=CFG["nb_heads"], dim_feedforward=2 * CFG["d_model"],
        dropout=0.0, nb_layers=CFG["nb_layers"], batch_norm=batch_norm,
        lap_pos_enc=False, filter_order=CFG["filter_order"],
        last_layer_filter=last_layer_filter)


def _dense_logits(model, variables, batch, batch_norm):
    if batch_norm:
        # train mode: batch statistics, matching the partitioned path
        (logits, _), _ = model.apply(variables, batch,
                                     deterministic=False,
                                     mutable=["batch_stats"])
    else:
        logits, _ = model.apply(variables, batch)
    return np.asarray(logits)


def _graphs(n_graphs, n_nodes, seed=0):
    gs = sbm_like_dataset(seed=seed, n_graphs=n_graphs, n_nodes=n_nodes,
                          n_classes=2)
    DiffusionEncoding(beta=0.5).apply_to(gs)
    return gs


def _mesh2d(dp=2, sp=4):
    if len(jax.devices()) < dp * sp:
        pytest.skip(f"needs {dp * sp} virtual devices")
    return Mesh(np.array(jax.devices()[: dp * sp]).reshape(dp, sp),
                ("data", "nodes"))


@pytest.mark.parametrize("batch_norm,llf", [(False, True), (True, True),
                                            (False, False), (True, False)])
def test_batched_matches_dense(batch_norm, llf):
    mesh = _mesh2d()
    gs = _graphs(4, 16, seed=1)
    batch = collate_graphs(gs, max_nodes=16, node_labels=True)
    model = _dense_model(batch_norm, llf)
    variables = model.init(jax.random.key(0), batch)
    dense = _dense_logits(model, variables, batch, batch_norm)

    x_sh, pe_sh, lhat_sh, mask_sh, _, _, deg_sh = \
        prepare_batched_inputs(batch, mesh)
    forward = make_feta_batched_forward(
        mesh, CFG["d_model"], CFG["nb_heads"], CFG["nb_layers"],
        CFG["filter_order"], batch_norm=batch_norm, last_layer_filter=llf)
    got = np.asarray(forward(variables["params"], x_sh, pe_sh, lhat_sh,
                             mask_sh, deg_sh))
    np.testing.assert_allclose(got, dense, rtol=2e-4, atol=2e-5)


def test_batched_ragged_valid_counts():
    """Graphs with different true sizes inside one padded batch."""
    mesh = _mesh2d()
    gs = _graphs(2, 12, seed=2) + _graphs(2, 16, seed=3)
    batch = collate_graphs(gs, max_nodes=16, node_labels=True)
    model = _dense_model(batch_norm=True)
    variables = model.init(jax.random.key(1), batch)
    dense = _dense_logits(model, variables, batch, batch_norm=True)

    x_sh, pe_sh, lhat_sh, mask_sh, _, _, deg_sh = \
        prepare_batched_inputs(batch, mesh)
    forward = make_feta_batched_forward(
        mesh, CFG["d_model"], CFG["nb_heads"], CFG["nb_layers"],
        CFG["filter_order"], batch_norm=True)
    got = np.asarray(forward(variables["params"], x_sh, pe_sh, lhat_sh,
                             mask_sh, deg_sh))
    mask = np.asarray(batch.node_mask)
    np.testing.assert_allclose(got[mask], dense[mask], rtol=2e-4,
                               atol=2e-5)


@pytest.mark.parametrize("batch_norm,llf", [(False, True), (True, False)])
def test_batched_ring_attention_matches_dense(batch_norm, llf):
    """ring_attention=True on the 2-D mesh: the vmapped single-graph ring
    core streams every local graph's K/V blocks at once; logits match the
    dense model on the unmodified param tree."""
    mesh = _mesh2d()
    gs = _graphs(4, 16, seed=7)
    batch = collate_graphs(gs, max_nodes=16, node_labels=True)
    model = _dense_model(batch_norm, llf)
    variables = model.init(jax.random.key(3), batch)
    dense = _dense_logits(model, variables, batch, batch_norm)

    x_sh, pe_sh, lhat_sh, mask_sh, _, _, deg_sh = \
        prepare_batched_inputs(batch, mesh)
    forward = make_feta_batched_forward(
        mesh, CFG["d_model"], CFG["nb_heads"], CFG["nb_layers"],
        CFG["filter_order"], batch_norm=batch_norm, last_layer_filter=llf,
        ring_attention=True)
    got = np.asarray(forward(variables["params"], x_sh, pe_sh, lhat_sh,
                             mask_sh, deg_sh))
    np.testing.assert_allclose(got, dense, rtol=3e-4, atol=3e-5)


def test_batched_ring_grads_match_gathered():
    """One SGD step through the vmapped ring schedule lands on the same
    params as the gathered schedule (the leaf-exact check that caught
    the single-graph path's stop-gradient leak)."""
    mesh = _mesh2d()
    gs = _graphs(4, 16, seed=8)
    batch = collate_graphs(gs, max_nodes=16, node_labels=True)
    model = _dense_model()
    params = model.init(jax.random.key(4), batch)["params"]

    x_sh, pe_sh, lhat_sh, mask_sh, lab, lmask, deg_sh = \
        prepare_batched_inputs(batch, mesh)
    outs = {}
    for name, ring in (("gathered", False), ("ring", True)):
        step = make_feta_batched_train_step(
            mesh, CFG["d_model"], CFG["nb_heads"], CFG["nb_layers"],
            CFG["filter_order"], lr=3e-2, ring_attention=ring)
        p, loss = step(params, x_sh, pe_sh, lhat_sh, mask_sh, lab,
                       lmask, deg_sh)
        outs[name] = (jax.tree_util.tree_leaves(p), float(loss))
    assert np.isclose(outs["ring"][1], outs["gathered"][1], rtol=1e-5)
    for a, b in zip(outs["ring"][0], outs["gathered"][0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_batched_train_step_learns():
    mesh = _mesh2d()
    gs = _graphs(4, 16, seed=5)
    batch = collate_graphs(gs, max_nodes=16, node_labels=True)
    model = _dense_model(batch_norm=True)
    variables = model.init(jax.random.key(2), batch)
    params = variables["params"]

    x_sh, pe_sh, lhat_sh, mask_sh, lab, lmask, deg_sh = \
        prepare_batched_inputs(batch, mesh)
    step = make_feta_batched_train_step(
        mesh, CFG["d_model"], CFG["nb_heads"], CFG["nb_layers"],
        CFG["filter_order"], lr=3e-2, batch_norm=True)
    losses = []
    for _ in range(20):
        params, loss = step(params, x_sh, pe_sh, lhat_sh, mask_sh, lab,
                            lmask, deg_sh)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.85, losses
    assert np.isfinite(losses[-1])


@pytest.mark.parametrize("batch_norm,llf", [(True, True), (False, False),
                                            (True, False)])
def test_single_graph_partitioned_variants(batch_norm, llf):
    """Widened single-graph envelope: BN statistics psum across shards,
    all-layers filtering with the shared coefficient head."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    g = _graphs(1, 24, seed=7)[0]
    batch = collate_graphs([g], max_nodes=24, node_labels=False)
    model = _dense_model(batch_norm, llf)
    variables = model.init(jax.random.key(3), batch)
    dense = _dense_logits(model, variables, batch, batch_norm)[0]

    x_sh, pe_sh, mask_sh, src, dst, w, m, _, _, deg_sh = \
        prepare_feta_inputs(g.edge_index, g.x.astype(np.float32), None,
                            mesh, pe=g.pe, degree=g.degree)
    forward = make_feta_partitioned_forward(
        mesh, CFG["d_model"], CFG["nb_heads"], CFG["nb_layers"],
        CFG["filter_order"], batch_norm=batch_norm, last_layer_filter=llf)
    got = np.asarray(forward(variables["params"], x_sh, pe_sh, mask_sh,
                             src, dst, w, m, deg_sh=deg_sh))
    np.testing.assert_allclose(got[:24], dense, rtol=2e-4, atol=2e-5)


def test_batched_optax_adamw_learns():
    """The 2-D mesh step accepts an optax optimizer (AdamW — the
    reference SBM protocol's optimizer) and learns."""
    import optax
    mesh = _mesh2d()
    gs = _graphs(4, 16, seed=5)
    batch = collate_graphs(gs, max_nodes=16, node_labels=True)
    model = _dense_model(batch_norm=True)
    params = model.init(jax.random.key(2), batch)["params"]
    x_sh, pe_sh, lhat_sh, mask_sh, lab, lmask, deg_sh = \
        prepare_batched_inputs(batch, mesh)
    adamw = optax.adamw(2e-3, weight_decay=1e-5)
    step = make_feta_batched_train_step(
        mesh, CFG["d_model"], CFG["nb_heads"], CFG["nb_layers"],
        CFG["filter_order"], batch_norm=True, optimizer=adamw)
    state = adamw.init(params)
    losses = []
    for _ in range(20):
        params, state, loss = step(params, state, x_sh, pe_sh, lhat_sh,
                                   mask_sh, lab, lmask, deg_sh)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses
    assert np.isfinite(losses[-1])


def test_batched_gradient_accumulation_via_multisteps():
    """Gradient accumulation on the distributed steps comes free through
    optax.MultiSteps: k accumulation micro-steps == one step on the same
    data with k-scaled averaging semantics; here we just pin that the
    wrapper runs and only applies updates every k-th call."""
    import optax
    mesh = _mesh2d()
    gs = _graphs(4, 16, seed=7)
    batch = collate_graphs(gs, max_nodes=16, node_labels=True)
    model = _dense_model(batch_norm=False)
    params = model.init(jax.random.key(3), batch)["params"]
    x_sh, pe_sh, lhat_sh, mask_sh, lab, lmask, deg_sh = \
        prepare_batched_inputs(batch, mesh)
    k = 2
    acc = optax.MultiSteps(optax.sgd(1e-2), every_k_schedule=k)
    step = make_feta_batched_train_step(
        mesh, CFG["d_model"], CFG["nb_heads"], CFG["nb_layers"],
        CFG["filter_order"], optimizer=acc)
    state = acc.init(params)
    p0 = jax.tree_util.tree_leaves(params)[0].copy()
    params, state, _ = step(params, state, x_sh, pe_sh, lhat_sh,
                            mask_sh, lab, lmask, deg_sh)
    # first of k calls: gradients accumulated, params unchanged
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(params)[0]), np.asarray(p0))
    params, state, _ = step(params, state, x_sh, pe_sh, lhat_sh,
                            mask_sh, lab, lmask, deg_sh)
    # k-th call: the averaged update applies
    assert not np.array_equal(
        np.asarray(jax.tree_util.tree_leaves(params)[0]), np.asarray(p0))
