"""scan_layers equivalence: stacked-scan params reproduce unrolled outputs."""

import numpy as np
import jax
import jax.numpy as jnp

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding

KW = dict(in_size=7, nb_class=2, d_model=32, nb_heads=4,
          dim_feedforward=64, dropout=0.0, nb_layers=4,
          lap_pos_enc=True, lap_pos_enc_dim=4, filter_order=2)


def test_scan_matches_unrolled():
    graphs = random_graph_dataset(seed=13, n_graphs=4, min_nodes=5,
                                  max_nodes=12, n_features=7)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    gb = collate_graphs(graphs, max_nodes=16)

    unrolled = DiffGraphTransformerGenGCN(**KW, scan_layers=False)
    params = unrolled.init(jax.random.key(0), gb)
    ref, _ = unrolled.apply(params, gb)

    scanned = DiffGraphTransformerGenGCN(**KW, scan_layers=True)
    sparams = scanned.init(jax.random.key(1), gb)

    # build scan params by stacking the unrolled per-layer trees
    p = params["params"]
    enc = p["encoder"]
    n_scan = KW["nb_layers"] - 1
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[enc[f"layer_{i}"] for i in range(n_scan)])
    new_enc = {k: v for k, v in enc.items()
               if not (k.startswith("layer_")
                       and int(k.split("_")[1]) < n_scan)}
    new_enc["scan_layers"] = {"layer": stacked}
    new_params = {"params": {**p, "encoder": new_enc}}
    # verify tree structures line up
    chex_shapes = jax.tree_util.tree_map(jnp.shape, new_params)
    want_shapes = jax.tree_util.tree_map(jnp.shape, sparams)
    assert jax.tree_util.tree_structure(chex_shapes) == \
        jax.tree_util.tree_structure(want_shapes), (
            chex_shapes, want_shapes)

    got, _ = scanned.apply(new_params, gb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
