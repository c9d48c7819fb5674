"""Native C++ SMILES featurizer vs the Python golden (data/smiles.py):
bit-identical arrays over representative + adversarial molecules."""

import numpy as np
import pytest

from feta_tmlr_tpu.data.smiles import SmilesError, smiles_to_graph_arrays
from feta_tmlr_tpu.data.smiles_native import (
    featurize_batch_native,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native featurizer not built")

MOLECULES = [
    "C",                                  # methane
    "CCO",                                # ethanol
    "O=C=O",                              # CO2 (cumulated double bonds)
    "C#N",                                # HCN (triple)
    "c1ccccc1",                           # benzene (aromatic ring)
    "c1ccc2ccccc2c1",                     # naphthalene (fused rings)
    "CC(=O)Oc1ccccc1C(=O)O",              # aspirin
    "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",       # caffeine (Kekulized upper)
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C",         # caffeine (aromatic lower)
    "[NH4+]",                             # bracket charge + explicit H
    "[O-]S(=O)(=O)[O-]",                  # sulfate dianion
    "C/C=C/C",                            # trans-2-butene (cis/trans)
    "C1CC1",                              # cyclopropane
    "C1CC2CCC1CC2",                       # bicyclic (bridged)
    "ClCCl",                              # two-char halogens
    "BrC(Br)Br",                          #
    "[13CH4]",                            # isotope skipped
    "[C@@H](N)(C)C(=O)O",                 # chirality tokens skipped
    "CC(C)(C)c1ccc(O)cc1",                # branches
    "C%10CC%10",                          # %nn ring labels
    "c1cc[se]c1",                         # selenophene (bracket aromatic)
    "N.CCO",                              # dot-separated fragments
    "S(=O)(=O)(O)O",                      # multivalent sulfur
    "P(=O)(O)(O)O",                       # phosphate (P valence 5)
    "[Na+].[Cl-]",                        # salt
    "[nH]1cccc1",                         # pyrrole aromatic N with H
    "C(",      # unbalanced paren: python's parser accepts (no check) —
               # the twin replicates that quirk bit-for-bit
]

BAD = ["X", "C1CC", "[Qq]", "c1ccccc1%"]


def test_native_matches_python_bitwise():
    outs = featurize_batch_native(MOLECULES)
    for s, got in zip(MOLECULES, outs):
        assert got is not None, f"native failed on {s!r}"
        x_n, ei_n, ea_n = got
        x_p, ei_p, ea_p = smiles_to_graph_arrays(s)
        np.testing.assert_array_equal(x_n, x_p, err_msg=s)
        np.testing.assert_array_equal(ei_n, ei_p, err_msg=s)
        np.testing.assert_array_equal(ea_n, ea_p, err_msg=s)


def test_native_rejects_what_python_rejects():
    outs = featurize_batch_native(BAD)
    for s, got in zip(BAD, outs):
        assert got is None, f"native accepted {s!r}"
        with pytest.raises((SmilesError, ValueError, IndexError)):
            smiles_to_graph_arrays(s)


def test_native_batch_threads_deterministic():
    outs1 = featurize_batch_native(MOLECULES * 20, n_threads=1)
    outs4 = featurize_batch_native(MOLECULES * 20, n_threads=4)
    for a, b in zip(outs1, outs4):
        for aa, bb in zip(a, b):
            np.testing.assert_array_equal(aa, bb)


def _gen_smiles(rng, depth=0):
    """Random parseable-ish SMILES: chains with bonds, branches, rings,
    brackets; validity is judged by the PYTHON parser (the golden)."""
    frags = []
    n = int(rng.integers(1, 7))
    open_ring = False
    for i in range(n):
        a = rng.choice(["C", "N", "O", "S", "P", "F", "Cl", "Br", "c",
                        "n", "[NH4+]", "[O-]", "[13CH4]", "[Se]"])
        if i > 0:
            a = rng.choice(["", "", "", "=", "#", "/", ":"]) + a
        frags.append(a)
        if not open_ring and rng.random() < 0.25 and n - i > 2:
            frags.append(str(rng.integers(1, 9)))
            ring_label = frags[-1]
            open_ring = True
        elif open_ring and rng.random() < 0.6:
            frags.append(ring_label)
            open_ring = False
        if depth < 2 and rng.random() < 0.2:
            frags.append("(" + _gen_smiles(rng, depth + 1) + ")")
    if open_ring:
        frags.append(ring_label)
    return "".join(frags)


def test_native_fuzz_parity():
    rng = np.random.default_rng(0)
    mols = [_gen_smiles(rng) for _ in range(400)]
    outs = featurize_batch_native(mols)
    n_ok = 0
    for s, got in zip(mols, outs):
        try:
            ref = smiles_to_graph_arrays(s)
        except Exception:
            assert got is None, f"python rejected but native accepted {s!r}"
            continue
        assert got is not None, f"python accepted but native rejected {s!r}"
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(a, b, err_msg=s)
        n_ok += 1
    assert n_ok > 200          # the generator mostly emits parseable strings


def test_native_ring_digit_before_atom_rejected():
    """Leading/dangling ring digits (python raises a catchable TypeError
    building a bond from None) must come back as clean native errors,
    not crashes."""
    outs = featurize_batch_native(["1CC1", "N.1CC1", "C.=1CC=1", "%12CC"])
    assert all(o is None for o in outs)
