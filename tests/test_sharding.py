"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
from feta_tmlr_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    shard_batch,
    shard_params,
)
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding
from feta_tmlr_tpu.train import Trainer, TrainConfig


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _setup(n_graphs=8):
    graphs = random_graph_dataset(seed=0, n_graphs=n_graphs, min_nodes=6,
                                  max_nodes=12, n_features=7)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    batch = collate_graphs(graphs, max_nodes=16)
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=2, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=2, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=2)
    trainer = Trainer(model, TrainConfig(task="graph_clf", lr=1e-3,
                                         sign_flip=False))
    state = trainer.init(jax.random.key(0), batch)
    return trainer, state, batch


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_sharded_step_matches_single_device(model_parallel):
    trainer, state, batch = _setup()
    # single-device result
    state1, loss1 = trainer._jit_step(state, batch, jax.random.key(1))

    mesh = make_mesh(8, model_parallel=model_parallel)
    sstate = state.replace(params=shard_params(state.params, mesh),
                           opt_state=jax.device_put(state.opt_state))
    sbatch = shard_batch(batch, mesh)
    step = make_sharded_train_step(trainer._step, mesh)
    with mesh:
        state2, loss2 = step(sstate, sbatch, jax.random.key(1))
    np.testing.assert_allclose(float(loss1), float(loss2),
                               rtol=1e-4, atol=1e-5)
    # parameters after the step must match too
    l1 = jax.tree_util.tree_leaves(state1.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    # Adam is sign-sensitive near zero gradients, so cross-device reduction
    # order can move a fresh param by up to ~lr; bound the absolute drift.
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4)


def test_batch_sharding_layout():
    _, _, batch = _setup()
    mesh = make_mesh(8, model_parallel=2)
    sbatch = shard_batch(batch, mesh)
    shards = sbatch.x.sharding
    assert shards.spec == jax.sharding.PartitionSpec("data")
    # 8 graphs over 4-way data axis -> 2 graphs per shard
    assert sbatch.x.addressable_shards[0].data.shape[0] == 2


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_initialize_multihost_noop_single_process():
    """Without a coordinator configured, the multi-host entry skips
    jax.distributed and just reports the local device count."""
    from feta_tmlr_tpu.parallel.mesh import initialize_multihost
    import jax
    assert initialize_multihost() == len(jax.devices())


def test_host_dataset_shard_and_global_batch():
    """Multihost data path (single-process degenerate case): interleaved
    per-host dataset slices cover everything exactly once, and
    global_batch_from_local yields data-sharded leaves that feed the
    jitted step identically to a device_put batch."""
    from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
    from feta_tmlr_tpu.parallel.mesh import (
        global_batch_from_local,
        make_mesh,
        shard_dataset_for_host,
    )

    items = list(range(10))
    parts = [shard_dataset_for_host(items, num_processes=3, process_id=p)
             for p in range(3)]
    assert sorted(sum(parts, [])) == items
    assert parts[0] == [0, 3, 6, 9]
    # jax.process_count() defaults inside
    assert shard_dataset_for_host(items) == items

    graphs = random_graph_dataset(seed=0, n_graphs=8, min_nodes=4,
                                  max_nodes=8, n_features=3)
    batch = collate_graphs(graphs, max_nodes=8)
    mesh = make_mesh(8, model_parallel=1,
                     devices=jax.devices("cpu")[:8])
    gb = global_batch_from_local(batch, mesh)
    assert gb.x.shape == batch.x.shape
    assert len(gb.x.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(gb.x), np.asarray(batch.x))
    np.testing.assert_array_equal(np.asarray(gb.adj),
                                  np.asarray(batch.adj))
