"""Dependency-free SMILES -> graph featurizer + PCQM4M-LSC loader.

The reference's PCQM4M runner featurizes SMILES with
`ogb.utils.smiles2graph` (rdkit) before training
(/root/reference/experiments/run_transformer_gengcn_pcqm4m.py:30-32,277).
rdkit is not available in this image, so this module implements the part
of that pipeline the model actually consumes: a SMILES parser for the
organic chemistry PCQM4M covers (organic-subset + bracket atoms, ring
closures, branches, aromatic forms, charges) emitting graphs in the SAME
schema `ogb.utils.smiles2graph` produces — int node features [n, 9],
edge features [E, 3] (both edge directions), homolumogap float target.

Faithful columns: atomic number index, total degree, formal charge,
total H count (Daylight implicit-valence rules), aromatic flag,
in-ring flag (bridge-edge analysis, equals rdkit's IsInRing), bond type.
Approximated columns (documented; rdkit perception not reproduced):
chirality (always unspecified — the reference's model never consumes it:
OGB atom encoders embed each column independently and PCQM4M training is
2D), hybridization (derived from bond orders: triple/cumulated->SP,
double/aromatic->SP2, else SP3), radical electrons (0), bond stereo (0),
conjugation (both endpoints sp2/aromatic).
"""

from __future__ import annotations

import csv
import gzip
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from feta_tmlr_tpu.data.batch import Graph

_SYMBOLS = {
    "H": 1, "He": 2, "Li": 3, "Be": 4, "B": 5, "C": 6, "N": 7, "O": 8,
    "F": 9, "Ne": 10, "Na": 11, "Mg": 12, "Al": 13, "Si": 14, "P": 15,
    "S": 16, "Cl": 17, "Ar": 18, "K": 19, "Ca": 20, "Ti": 22, "Cr": 24,
    "Mn": 25, "Fe": 26, "Co": 27, "Ni": 28, "Cu": 29, "Zn": 30, "Ga": 31,
    "Ge": 32, "As": 33, "Se": 34, "Br": 35, "Zr": 40, "Mo": 42, "Ru": 44,
    "Rh": 45, "Pd": 46, "Ag": 47, "Cd": 48, "In": 49, "Sn": 50, "Sb": 51,
    "Te": 52, "I": 53, "Ba": 56, "W": 74, "Pt": 78, "Au": 79, "Hg": 80,
    "Pb": 82, "Bi": 83,
}
# two-character organic-subset shorthands come first when tokenizing
_ORGANIC = {"B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I"}
_AROMATIC_SHORT = {"b": "B", "c": "C", "n": "N", "o": "O", "p": "P",
                   "s": "S", "se": "Se", "as": "As", "te": "Te"}
# Daylight default valences for implicit-H assignment (organic subset);
# multi-valent S/P pick the smallest legal valence >= bond-order sum
_VALENCES = {"B": (3,), "C": (4,), "N": (3,), "O": (2,), "P": (3, 5),
             "S": (2, 4, 6), "F": (1,), "Cl": (1,), "Br": (1,), "I": (1,)}

AROMATIC_ORDER = 1.5


class _Atom:
    __slots__ = ("z", "aromatic", "charge", "h_count", "explicit_h",
                 "in_ring")

    def __init__(self, z, aromatic=False, charge=0, h_count=None):
        self.z = z
        self.aromatic = aromatic
        self.charge = charge
        self.h_count = h_count          # None -> implicit (organic subset)
        self.explicit_h = h_count is not None
        self.in_ring = False


class SmilesError(ValueError):
    pass


def parse_smiles(s: str) -> Tuple[List[_Atom], List[Tuple[int, int, float]]]:
    """-> (atoms, bonds) with bond order 1/2/3/1.5 (aromatic)."""
    atoms: List[_Atom] = []
    bonds: List[Tuple[int, int, float]] = []
    stack: List[int] = []
    prev: Optional[int] = None
    pending_bond: Optional[float] = None
    rings: Dict[str, Tuple[int, Optional[float]]] = {}
    i, n = 0, len(s)

    def add_atom(atom: _Atom) -> None:
        nonlocal prev, pending_bond
        atoms.append(atom)
        idx = len(atoms) - 1
        if prev is not None:
            order = pending_bond
            if order is None:
                order = (AROMATIC_ORDER
                         if atoms[prev].aromatic and atom.aromatic else 1.0)
            bonds.append((prev, idx, order))
        prev = idx
        pending_bond = None

    def close_ring(label: str) -> None:
        nonlocal pending_bond
        if label in rings:
            other, order0 = rings.pop(label)
            order = pending_bond if pending_bond is not None else order0
            if order is None:
                order = (AROMATIC_ORDER if atoms[other].aromatic
                         and atoms[prev].aromatic else 1.0)
            bonds.append((other, prev, order))
        else:
            rings[label] = (prev, pending_bond)
        pending_bond = None

    while i < n:
        ch = s[i]
        if ch == "[":
            j = s.index("]", i)
            body = s[i + 1: j]
            k = 0
            while k < len(body) and body[k].isdigit():   # isotope: ignored
                k += 1
            sym = None
            for ln in (2, 1):
                cand = body[k: k + ln]
                if cand in _SYMBOLS or cand.capitalize() in _SYMBOLS \
                        or cand in _AROMATIC_SHORT:
                    sym = cand
                    k += ln
                    break
            if sym is None:
                raise SmilesError(f"bad bracket atom [{body}]")
            aromatic = sym[0].islower()
            canonical = _AROMATIC_SHORT.get(sym, sym.capitalize()
                                            if aromatic else sym)
            z = _SYMBOLS[canonical]
            h_count, charge = 0, 0
            while k < len(body):
                c = body[k]
                if c == "@":                      # chirality: not encoded
                    k += 1
                elif c == "H":
                    k += 1
                    d = ""
                    while k < len(body) and body[k].isdigit():
                        d += body[k]
                        k += 1
                    h_count = int(d) if d else 1
                elif c in "+-":
                    sign = 1 if c == "+" else -1
                    k += 1
                    d = ""
                    while k < len(body) and body[k].isdigit():
                        d += body[k]
                        k += 1
                    if d:
                        charge += sign * int(d)
                    else:
                        charge += sign
                        while k < len(body) and body[k] == c:
                            charge += sign
                            k += 1
                elif c == ":":                    # atom-map class: ignored
                    k += 1
                    while k < len(body) and body[k].isdigit():
                        k += 1
                else:
                    raise SmilesError(f"bad bracket token {c!r} in [{body}]")
            add_atom(_Atom(z, aromatic, charge, h_count))
            i = j + 1
        elif ch.isalpha():
            two = s[i: i + 2]
            if two in ("Cl", "Br"):
                add_atom(_Atom(_SYMBOLS[two]))
                i += 2
            elif ch in _ORGANIC:
                add_atom(_Atom(_SYMBOLS[ch]))
                i += 1
            elif ch in _AROMATIC_SHORT:
                add_atom(_Atom(_SYMBOLS[_AROMATIC_SHORT[ch]],
                               aromatic=True))
                i += 1
            else:
                raise SmilesError(f"unknown atom {ch!r} in {s!r}")
        elif ch in "-=#:":
            pending_bond = {"-": 1.0, "=": 2.0, "#": 3.0,
                            ":": AROMATIC_ORDER}[ch]
            i += 1
        elif ch in "/\\":
            pending_bond = 1.0                    # cis/trans: single bond
            i += 1
        elif ch.isdigit():
            close_ring(ch)
            i += 1
        elif ch == "%":
            close_ring(s[i + 1: i + 3])
            i += 3
        elif ch == "(":
            stack.append(prev)
            i += 1
        elif ch == ")":
            prev = stack.pop()
            i += 1
        elif ch == ".":
            prev = None
            i += 1
        else:
            raise SmilesError(f"unexpected {ch!r} in {s!r}")
    if rings:
        raise SmilesError(f"unclosed ring bond(s) {sorted(rings)} in {s!r}")
    return atoms, bonds


def _mark_rings(atoms: List[_Atom], bonds) -> List[bool]:
    """Cycle membership per bond via bridge detection (iterative DFS);
    an atom is in a ring iff it touches a non-bridge edge."""
    n = len(atoms)
    adj: List[List[Tuple[int, int]]] = [[] for _ in range(n)]
    for bi, (a, b, _) in enumerate(bonds):
        adj[a].append((b, bi))
        adj[b].append((a, bi))
    disc = [-1] * n
    low = [0] * n
    is_bridge = [False] * len(bonds)
    timer = 0
    for root in range(n):
        if disc[root] >= 0:
            continue
        work = [(root, -1, iter(adj[root]))]
        disc[root] = low[root] = timer
        timer += 1
        while work:
            u, pedge, it = work[-1]
            advanced = False
            for v, bi in it:
                if bi == pedge:
                    continue
                if disc[v] < 0:
                    disc[v] = low[v] = timer
                    timer += 1
                    work.append((v, bi, iter(adj[v])))
                    advanced = True
                    break
                low[u] = min(low[u], disc[v])
            if not advanced:
                work.pop()
                if work:
                    p = work[-1][0]
                    low[p] = min(low[p], low[u])
                    if low[u] > disc[p]:
                        is_bridge[pedge] = True
    in_cycle = [not is_bridge[bi] for bi in range(len(bonds))]
    for bi, (a, b, _) in enumerate(bonds):
        if in_cycle[bi]:
            atoms[a].in_ring = True
            atoms[b].in_ring = True
    return in_cycle


def _assign_hydrogens(atoms: List[_Atom], bonds) -> None:
    import math
    order_sum = [0.0] * len(atoms)
    for a, b, o in bonds:
        order_sum[a] += o
        order_sum[b] += o
    for ai, atom in enumerate(atoms):
        if atom.explicit_h:
            continue
        sym = next((k for k, v in _SYMBOLS.items() if v == atom.z), None)
        vals = _VALENCES.get(sym)
        if vals is None:
            atom.h_count = 0
            continue
        need = math.ceil(order_sum[ai] - 1e-9)
        val = next((v for v in vals if v >= need), vals[-1])
        # charge shifts capacity (e.g. [O-] handled via brackets; organic
        # subset atoms always have charge 0 here)
        atom.h_count = max(val - need, 0)


_HYB_SP, _HYB_SP2, _HYB_SP3 = 0, 1, 2


def smiles_to_graph_arrays(s: str):
    """-> (x [n,9] int, edge_index [2,E] int, edge_attr [E,3] int), with
    both edge directions, in ogb.utils.smiles2graph's column schema."""
    atoms, bonds = parse_smiles(s)
    in_cycle = _mark_rings(atoms, bonds)
    _assign_hydrogens(atoms, bonds)
    n = len(atoms)
    max_order = [0.0] * n
    n_double = [0] * n
    heavy_deg = [0] * n
    for a, b, o in bonds:
        heavy_deg[a] += 1
        heavy_deg[b] += 1
        for u in (a, b):
            max_order[u] = max(max_order[u], o)
            if o == 2.0:
                n_double[u] += 1
    x = np.zeros((n, 9), np.int32)
    for ai, atom in enumerate(atoms):
        if max_order[ai] >= 3.0 or n_double[ai] >= 2:
            hyb = _HYB_SP
        elif atom.aromatic or max_order[ai] == 2.0:
            hyb = _HYB_SP2
        else:
            hyb = _HYB_SP3
        x[ai] = (atom.z - 1,                     # atomic number index
                 0,                              # chirality: unspecified
                 heavy_deg[ai] + atom.h_count,   # total degree (incl. H)
                 atom.charge + 5,                # formal charge index
                 atom.h_count,                   # total num H
                 0,                              # radical electrons
                 hyb,                            # hybridization (approx)
                 int(atom.aromatic),
                 int(atom.in_ring))
    ei, ea = [], []
    for bi, (a, b, o) in enumerate(bonds):
        btype = {1.0: 0, 2.0: 1, 3.0: 2, AROMATIC_ORDER: 3}[o]
        sp2 = [atoms[u].aromatic or max_order[u] >= 2.0 for u in (a, b)]
        conj = int(o == AROMATIC_ORDER or (sp2[0] and sp2[1]))
        for u, v in ((a, b), (b, a)):
            ei.append((u, v))
            ea.append((btype, 0, conj))
    edge_index = (np.asarray(ei, np.int32).T if ei
                  else np.zeros((2, 0), np.int32))
    edge_attr = (np.asarray(ea, np.int32) if ea
                 else np.zeros((0, 3), np.int32))
    return x, edge_index, edge_attr


def graph_from_arrays(x, ei, ea, y=None) -> Graph:
    g = Graph(x=x, edge_index=ei,
              y=(np.float32(y) if y is not None else None))
    g.edge_attr = ea
    g.edge_type = ((ea[:, 0] + 1).astype(np.int32) if len(ea)
                   else np.zeros(0, np.int32))
    g.compute_degree_feature()
    return g


def smiles_to_graph(s: str, y=None) -> Graph:
    return graph_from_arrays(*smiles_to_graph_arrays(s), y)


# ------------------------------------------------------------- LSC layout
def load_pcqm4m_lsc(root: str, name: str = "pcqm4m_kddcup2021",
                    max_graphs: Optional[int] = None):
    """Read the REAL OGB-LSC on-disk layout: <root>/<name>/raw/data.csv.gz
    (columns idx,smiles,homolumogap) + split_dict.pt when present.

    Returns (train, valid, test) Graph lists. Test rows carry NaN gaps in
    the real dataset; they are kept (the reference evaluates valid only).

    Split selection runs BEFORE featurization, so `max_graphs` (per
    split) only parses the molecules it keeps. Molecules the parser
    cannot handle are skipped with a count, never aborting the load.
    """
    path = os.path.join(root, name, "raw", "data.csv.gz")
    if not os.path.isfile(path):
        raise FileNotFoundError(path)
    rows: List[Tuple[str, float]] = []           # (smiles, gap) per line
    with gzip.open(path, "rt") as f:
        for row in csv.DictReader(f):
            gap = row.get("homolumogap", "")
            rows.append((row["smiles"],
                         float(gap) if gap not in ("", None)
                         else float("nan")))
    split_path = os.path.join(root, name, "split_dict.pt")
    if os.path.isfile(split_path):
        import torch
        split = torch.load(split_path, weights_only=False)
        idx = {k: np.asarray(v).reshape(-1) for k, v in split.items()}
    else:
        n = len(rows)
        c1, c2 = int(0.8 * n), int(0.9 * n)
        idx = {"train": np.arange(0, c1), "valid": np.arange(c1, c2),
               "test": np.arange(c2, n)}
    # native C++ batch featurizer when built (4-8 worker threads,
    # bit-identical to the python path — tests/test_smiles_native.py);
    # molecules it rejects are retried in python below
    from feta_tmlr_tpu.data.smiles_native import (
        featurize_batch_native,
        native_available,
    )
    use_native = native_available() and \
        os.environ.get("FETA_NATIVE_SMILES", "1") == "1"
    out = {}
    skipped = 0
    for key in ("train", "valid", "test"):
        take = [i for i in idx[key] if i < len(rows)]
        if max_graphs is not None:
            take = take[:max_graphs]
        graphs: List[Graph] = []
        native_arrays = (featurize_batch_native(
            [rows[i][0] for i in take]) if use_native else None)
        for t, i in enumerate(take):
            s, y = rows[i]
            try:
                if native_arrays is not None and \
                        native_arrays[t] is not None:
                    graphs.append(graph_from_arrays(*native_arrays[t], y))
                else:
                    graphs.append(smiles_to_graph(s, y))
            except Exception:      # out-of-scope chemistry: skip, count
                skipped += 1
        out[key] = graphs
    if skipped:
        print(f"[warn] smiles featurizer skipped {skipped} "
              f"unparseable molecule(s)")
    return out["train"], out["valid"], out["test"]
