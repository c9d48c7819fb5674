"""ctypes binding for the native SMILES featurizer
(native/libsmilesfeat.so) — C++ twin of `data/smiles.py`, bit-identical
outputs (tests/test_smiles_native.py).

The reference featurizes PCQM4M's 3.8M molecules up front
(run_transformer_gengcn_pcqm4m.py:30-32,277); at that scale the pure
Python parse is an hours-long host bottleneck. The native batch path
parses with a std::thread pool and is used automatically by
`load_pcqm4m_lsc` when the library is built (the Python featurizer stays
the golden reference and the fallback). Molecules the native parser
rejects are retried in Python, so error behavior is a superset."""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libsmilesfeat.so")

_I32P = ctypes.POINTER(ctypes.c_int32)
_I64P = ctypes.POINTER(ctypes.c_int64)

CAP_ATOMS = 256
CAP_EDGES = 1024


def _load_lib():
    global _LIB
    if _LIB is None and os.path.isfile(_LIB_PATH):
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            # committed binary built for another architecture —
            # the Python twin takes over
            return None
        lib.smiles_featurize_batch.argtypes = [
            ctypes.c_char_p, _I64P, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            _I32P, _I32P, _I32P, _I32P, _I32P, _I32P,
        ]
        lib.smiles_featurize_batch.restype = ctypes.c_int32
        _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load_lib() is not None


def featurize_batch_native(
    smiles: Sequence[str], n_threads: Optional[int] = None,
    chunk: int = 8192,
) -> List[Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]]:
    """-> per molecule (x [n,9], edge_index [2,E], edge_attr [E,3]) in
    ogb.utils.smiles2graph's schema, or None where the native parser
    failed (caller falls back to Python there). Processes in `chunk`-
    sized slices so the capacity-padded staging buffers stay ~250 MB
    (x 75 + edge_index 67 + edge_attr 100 MB at chunk=8192) regardless
    of dataset size (PCQM4M is 3.8M molecules)."""
    if len(smiles) > chunk:
        out: List = []
        for lo in range(0, len(smiles), chunk):
            out.extend(featurize_batch_native(
                smiles[lo: lo + chunk], n_threads=n_threads))
        return out
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native featurizer not built (make -C native)")
    n = len(smiles)
    if n == 0:
        return []
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 8)
    enc = [s.encode() for s in smiles]
    offsets = np.zeros(n + 1, np.int64)
    offsets[1:] = np.cumsum([len(e) for e in enc])
    buf = b"".join(enc)
    x = np.zeros((n, CAP_ATOMS, 9), np.int32)
    ei = np.zeros((n, 2, CAP_EDGES), np.int32)
    ea = np.zeros((n, CAP_EDGES, 3), np.int32)
    n_atoms = np.zeros(n, np.int32)
    n_edges = np.zeros(n, np.int32)
    status = np.zeros(n, np.int32)
    p32 = lambda a: a.ctypes.data_as(_I32P)
    lib.smiles_featurize_batch(
        buf, offsets.ctypes.data_as(_I64P), n, CAP_ATOMS, CAP_EDGES,
        int(n_threads), p32(x), p32(ei), p32(ea), p32(n_atoms),
        p32(n_edges), p32(status))
    out = []
    for i in range(n):
        if status[i] != 0:
            out.append(None)
            continue
        na, ne = int(n_atoms[i]), int(n_edges[i])
        out.append((x[i, :na].copy(),
                    ei[i, :, :ne].copy() if ne
                    else np.zeros((2, 0), np.int32),
                    ea[i, :ne].copy() if ne
                    else np.zeros((0, 3), np.int32)))
    return out
