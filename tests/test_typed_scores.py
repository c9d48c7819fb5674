"""Typed-edge score path: equivalence with the generic dense-field path.

The SAN/LSPE attention's edge-feature SDDMM has two implementations
(nn/san.py::typed_edge_scores docstring): the generic one materializes the
projected [B, N, N, H*dh] edge field; the typed one exploits that edge
features are an embedding of a small bond vocabulary and runs one MXU
matmul per type. Both share the same parameter tree, so a single init
must produce allclose outputs (not bitwise — different accumulation
grouping), and gradients must agree too.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
from feta_tmlr_tpu.pe.laplace import apply_laplace_decomp
from feta_tmlr_tpu.pe.rwpe import rwpe


def _zinc_batch(seed=0, n=8, eig=6, rw=None):
    graphs = zinc_categorical_dataset(seed=seed, n_graphs=n)
    if eig:
        apply_laplace_decomp(graphs, eig)
    if rw:
        for g in graphs:
            g.lap_pe = rwpe(g, rw)
    return collate_graphs(graphs, max_nodes=32)


def test_san_typed_matches_generic():
    from feta_tmlr_tpu.nn.san import SANNodeSpectra

    batch = _zinc_batch()
    kw = dict(num_atom_type=28, num_bond_type=4, hidden_dim=16, out_dim=16,
              n_heads=4, n_layers=2, lpe_dim=4, lpe_heads=2, lpe_layers=1,
              filter_order=3, n_out=1)
    m_typed = SANNodeSpectra(typed_edges=True, **kw)
    m_gen = SANNodeSpectra(typed_edges=False, **kw)
    params = m_typed.init(jax.random.key(0), batch)
    out_t = m_typed.apply(params, batch)
    out_g = m_gen.apply(params, batch)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_g),
                               rtol=2e-4, atol=2e-5)

    # gradients through both paths agree on a shared leaf
    def loss(mod):
        def f(p):
            return jnp.abs(mod.apply(p, batch)).sum()
        return jax.grad(f)(params)

    g_t, g_g = loss(m_typed), loss(m_gen)
    flat_t = jax.tree_util.tree_leaves(g_t)
    flat_g = jax.tree_util.tree_leaves(g_g)
    for a, b in zip(flat_t, flat_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_lspe_typed_matches_generic():
    from feta_tmlr_tpu.nn.lspe import GraphiTSpectraNet

    batch = _zinc_batch(seed=1, eig=0, rw=8)
    kw = dict(num_atom_type=28, num_bond_type=4, hidden_dim=16, out_dim=16,
              n_heads=4, n_layers=2, pos_enc_dim=8, filter_order=3, n_out=1)
    m_typed = GraphiTSpectraNet(typed_edges=True, **kw)
    m_gen = GraphiTSpectraNet(typed_edges=False, **kw)
    params = m_typed.init(jax.random.key(0), batch)
    out_t = m_typed.apply(params, batch)
    out_g = m_gen.apply(params, batch)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_g),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("net", ["san", "lspe"])
def test_bf16_compute_dtype_runs_and_tracks_f32(net):
    if net == "san":
        from feta_tmlr_tpu.nn.san import SANNodeSpectra as Net
        batch = _zinc_batch(seed=2)
        kw = dict(num_atom_type=28, num_bond_type=4, hidden_dim=16,
                  out_dim=16, n_heads=4, n_layers=2, lpe_dim=4, lpe_heads=2,
                  lpe_layers=1, filter_order=3, n_out=1)
    else:
        from feta_tmlr_tpu.nn.lspe import GraphiTSpectraNet as Net
        batch = _zinc_batch(seed=3, eig=0, rw=8)
        kw = dict(num_atom_type=28, num_bond_type=4, hidden_dim=16,
                  out_dim=16, n_heads=4, n_layers=2, pos_enc_dim=8,
                  filter_order=3, n_out=1)
    m32 = Net(**kw)
    m16 = Net(compute_dtype=jnp.bfloat16, **kw)
    params = m32.init(jax.random.key(0), batch)
    out32 = np.asarray(m32.apply(params, batch), np.float32)
    out16 = np.asarray(m16.apply(params, batch), np.float32)
    assert out16.dtype == np.float32          # outputs stay f32
    # bf16 mantissa is 8 bits; end-to-end drift stays small at this depth
    np.testing.assert_allclose(out16, out32, rtol=0.1, atol=0.1)
