"""Packed-batch equivalence: same params, same graphs, same logits."""

import numpy as np
import jax
import jax.numpy as jnp

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.data.pack import pack_graphs
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
from feta_tmlr_tpu.nn.packed import PackedDiffGraphTransformerGenGCN
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding

KW = dict(in_size=7, nb_class=2, d_model=32, nb_heads=4,
          dim_feedforward=64, dropout=0.0, nb_layers=2,
          lap_pos_enc=True, lap_pos_enc_dim=4, filter_order=2)


def _graphs(n=10):
    graphs = random_graph_dataset(seed=21, n_graphs=n, min_nodes=5,
                                  max_nodes=14, n_features=7)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    return graphs


def test_pack_structure():
    graphs = _graphs()
    pb = pack_graphs(graphs, row_len=32)
    total_nodes = sum(g.num_nodes for g in graphs)
    assert pb.node_mask.sum() == total_nodes
    assert pb.graph_mask.sum() == len(graphs)
    assert pb.x.shape[1] == 32
    # rows hold multiple graphs
    assert pb.x.shape[0] < len(graphs)
    # per-row graph ids are contiguous slots
    for r in range(pb.x.shape[0]):
        ids = pb.graph_id[r][pb.node_mask[r]]
        assert set(ids) == set(range(int(pb.graph_mask[r].sum())))


def test_packed_matches_unpacked_logits():
    graphs = _graphs()
    unpacked = collate_graphs(graphs, max_nodes=16)
    packed = pack_graphs(graphs, row_len=32)

    ref_model = DiffGraphTransformerGenGCN(**KW)
    params = ref_model.init(jax.random.key(0), unpacked)
    ref_logits, _ = ref_model.apply(params, unpacked)
    ref_logits = np.asarray(ref_logits)              # [n_graphs, 2]

    packed_model = PackedDiffGraphTransformerGenGCN(**KW)
    # identical parameter tree: load the unpacked params directly
    p_shapes = jax.tree_util.tree_map(jnp.shape,
                                      packed_model.init(jax.random.key(1),
                                                        packed))
    u_shapes = jax.tree_util.tree_map(jnp.shape, params)
    assert jax.tree_util.tree_structure(p_shapes) == \
        jax.tree_util.tree_structure(u_shapes)
    packed_logits, _ = packed_model.apply(params, packed)
    packed_logits = np.asarray(packed_logits)        # [B, G, 2]

    # map packed slots back to original graph order: packing sorts by
    # size; recover by matching (row, slot) -> graph via node counts
    got = {}
    for r in range(packed.x.shape[0]):
        for s in range(int(packed.graph_mask[r].sum())):
            n_nodes = int((packed.graph_id[r] == s).sum())
            got[(r, s)] = (n_nodes, packed_logits[r, s])
    # for every original graph there must be a matching packed logit
    used = set()
    for gi, g in enumerate(graphs):
        best = None
        for key, (nn_, lg) in got.items():
            if key in used or nn_ != g.num_nodes:
                continue
            if np.allclose(lg, ref_logits[gi], rtol=1e-3, atol=1e-4):
                best = key
                break
        assert best is not None, (
            f"graph {gi} (n={g.num_nodes}): no packed logit matches "
            f"{ref_logits[gi]}")
        used.add(best)


def test_packed_trains():
    import optax
    graphs = _graphs(16)
    pb = pack_graphs(graphs, row_len=32)
    model = PackedDiffGraphTransformerGenGCN(**KW)
    params = model.init(jax.random.key(0), pb)
    opt = optax.adamw(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, _ = model.apply(p, pb)
            onehot = jax.nn.one_hot(pb.y, 2)
            ce = -jnp.sum(jax.nn.log_softmax(logits) * onehot, -1)
            m = pb.graph_mask.astype(ce.dtype)
            return jnp.sum(ce * m) / m.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
