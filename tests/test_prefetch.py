"""Double-buffered device prefetch (data/prefetch.py): ordering, background
collation, error propagation, and trainability off the iterator."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from feta_tmlr_tpu.data import collate_graphs, prefetch_to_device
from feta_tmlr_tpu.data.synthetic import random_graph_dataset


def test_prefetch_preserves_order_and_device():
    items = [np.full((4,), i, np.float32) for i in range(10)]
    out = list(prefetch_to_device(items, buffer_size=3))
    assert len(out) == 10
    for i, x in enumerate(out):
        assert isinstance(x, jax.Array)
        np.testing.assert_allclose(np.asarray(x), i)


def test_prefetch_background_collation():
    graphs = random_graph_dataset(seed=0, n_graphs=24, min_nodes=5,
                                  max_nodes=10, n_features=4)
    chunks = [graphs[i:i + 8] for i in range(0, 24, 8)]
    batches = list(prefetch_to_device(
        chunks, collate_fn=lambda gs: collate_graphs(gs, max_nodes=12)))
    assert len(batches) == 3
    # device-resident pytree, same content as foreground collation
    ref = collate_graphs(chunks[0], max_nodes=12)
    np.testing.assert_allclose(np.asarray(batches[0].adj), ref.adj)
    total = float(sum(jnp.sum(b.node_mask) for b in batches))
    assert total == sum(g.num_nodes for g in graphs)


def test_prefetch_propagates_producer_errors():
    def gen():
        yield np.zeros(2, np.float32)
        raise RuntimeError("boom")

    it = prefetch_to_device(gen(), buffer_size=1)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_prefetch_trains():
    xs = [np.random.default_rng(i).standard_normal((8, 3)).astype(np.float32)
          for i in range(6)]
    w = jnp.zeros((3,))

    @jax.jit
    def step(w, x):
        return w + x.mean(0)

    for x in prefetch_to_device(xs, buffer_size=2):
        w = step(w, x)
    expect = np.sum([x.mean(0) for x in xs], axis=0)
    np.testing.assert_allclose(np.asarray(w), expect, rtol=1e-5)
