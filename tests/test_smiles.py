"""SMILES parser/featurizer: hand-computed goldens on known molecules,
plus the PCQM4M-LSC on-disk layout round trip."""

import csv
import gzip
import os

import numpy as np
import pytest

from feta_tmlr_tpu.data.smiles import (
    SmilesError,
    load_pcqm4m_lsc,
    parse_smiles,
    smiles_to_graph,
    smiles_to_graph_arrays,
)


def test_ethanol():
    """CCO: 3 heavy atoms, 2 single bonds, H counts 3/2/1."""
    x, ei, ea = smiles_to_graph_arrays("CCO")
    assert x.shape == (3, 9) and ei.shape == (2, 4) and ea.shape == (4, 3)
    np.testing.assert_array_equal(x[:, 0], [5, 5, 7])     # C,C,O (z-1)
    np.testing.assert_array_equal(x[:, 4], [3, 2, 1])     # num H
    np.testing.assert_array_equal(x[:, 2], [4, 4, 2])     # total degree
    np.testing.assert_array_equal(x[:, 3], [5, 5, 5])     # charge idx (0)
    assert (ea[:, 0] == 0).all()                          # single bonds
    assert (x[:, 8] == 0).all()                           # no rings


def test_benzene_aromatic_ring():
    """c1ccccc1: all aromatic, in-ring, 1 H each, aromatic bonds."""
    x, ei, ea = smiles_to_graph_arrays("c1ccccc1")
    assert x.shape == (6, 9) and ei.shape == (2, 12)
    assert (x[:, 7] == 1).all()       # aromatic
    assert (x[:, 8] == 1).all()       # in ring
    assert (x[:, 4] == 1).all()       # one H each
    assert (x[:, 6] == 1).all()       # SP2
    assert (ea[:, 0] == 3).all()      # aromatic bond type
    assert (ea[:, 2] == 1).all()      # conjugated


def test_charges_and_explicit_h():
    """[NH4+] / [O-] bracket atoms: charge + explicit H counts."""
    x, _, _ = smiles_to_graph_arrays("[NH4+]")
    assert x[0, 0] == 6 and x[0, 3] == 6 and x[0, 4] == 4
    x, _, _ = smiles_to_graph_arrays("[O-]C")
    assert x[0, 0] == 7 and x[0, 3] == 4 and x[0, 4] == 0


def test_bond_orders_and_hybridization():
    """Acetonitrile CC#N: triple bond -> SP carbon/nitrogen."""
    x, ei, ea = smiles_to_graph_arrays("CC#N")
    assert sorted(set(ea[:, 0])) == [0, 2]                # single + triple
    assert x[1, 6] == 0 and x[2, 6] == 0                  # SP
    assert x[2, 4] == 0                                   # N has no H
    # acetone CC(=O)C: carbonyl C is SP2, one double bond
    x, _, ea = smiles_to_graph_arrays("CC(=O)C")
    assert x[1, 6] == 1 and x[2, 6] == 1
    assert (ea[:, 0] == 1).sum() == 2                     # C=O both dirs


def test_ring_closure_and_branch():
    """Cyclohexane with a methyl branch: ring flags only on ring atoms."""
    x, ei, _ = smiles_to_graph_arrays("CC1CCCCC1")
    assert x[0, 8] == 0 and (x[1:, 8] == 1).all()
    assert ei.shape[1] == 2 * 7                           # 7 bonds
    # pyrrole [nH]1cccc1: aromatic N keeps its explicit H
    x, _, _ = smiles_to_graph_arrays("[nH]1cccc1")
    assert x[0, 0] == 6 and x[0, 4] == 1 and x[0, 7] == 1


def test_fused_rings_no_bridge_false_positive():
    """Biphenyl c1ccccc1-c1ccccc1: the connecting bond is a bridge, both
    rings still flagged; naphthalene c1ccc2ccccc2c1 fully in-ring."""
    x, _, ea = smiles_to_graph_arrays("c1ccccc1-c1ccccc1")
    assert (x[:, 8] == 1).all()
    assert (ea[:, 0] == 0).sum() == 2                     # the single link
    x, _, _ = smiles_to_graph_arrays("c1ccc2ccccc2c1")
    assert x.shape == (10, 9) and (x[:, 8] == 1).all()
    # fusion carbons have no H
    assert sorted(x[:, 4]) == [0, 0] + [1] * 8


def test_disconnected_and_percent_ring():
    x, ei, _ = smiles_to_graph_arrays("C.C")
    assert x.shape == (2, 9) and ei.shape == (2, 0)
    x1, ei1, _ = smiles_to_graph_arrays("C%11CC%11")
    assert ei1.shape[1] == 6                              # 3-ring


def test_errors():
    with pytest.raises(SmilesError):
        parse_smiles("C1CC")          # unclosed ring
    with pytest.raises(SmilesError):
        parse_smiles("C?")            # junk token


def test_graph_container():
    g = smiles_to_graph("c1ccccc1O", y=4.2)
    assert g.num_nodes == 7 and float(g.y) == pytest.approx(4.2)
    assert g.edge_type.min() >= 1                         # densifiable
    assert g.edge_attr.shape == (g.edge_index.shape[1], 3)


def _write_lsc(root, name="pcqm4m_kddcup2021"):
    raw = os.path.join(root, name, "raw")
    os.makedirs(raw, exist_ok=True)
    rows = [("0", "CCO", "3.05"), ("1", "c1ccccc1", "5.1"),
            ("2", "CC(=O)N", "4.2"), ("3", "C#N", "6.0"),
            ("4", "CC1CCCCC1", "7.7"), ("5", "[NH3+]CC([O-])=O", ""),
            ]
    with gzip.open(os.path.join(raw, "data.csv.gz"), "wt", newline="") as f:
        w = csv.writer(f)
        w.writerow(["idx", "smiles", "homolumogap"])
        w.writerows(rows)
    import torch
    torch.save({"train": np.array([0, 1, 2, 3]), "valid": np.array([4]),
                "test": np.array([5])},
               os.path.join(root, name, "split_dict.pt"))


def test_load_pcqm4m_lsc_layout(tmp_path):
    _write_lsc(str(tmp_path))
    tr, va, te = load_pcqm4m_lsc(str(tmp_path))
    assert len(tr) == 4 and len(va) == 1 and len(te) == 1
    assert float(tr[0].y) == pytest.approx(3.05)
    assert np.isnan(float(te[0].y))                       # unlabeled test
    assert tr[1].x.shape == (6, 9)                        # benzene
