"""ctypes binding for the native TU-format file reader (native/tuparse.cpp).

The TU ingest hotspot is tokenizing the big text files (`*_A.txt` is
~300k comma-separated int pairs for NCI1); the reference does this with
Python per-line loops (gckn/data_io.py:27-160), as does the fallback in
data/tu.py. The native reader slurps each file once and tokenizes in C.
Used automatically by `load_tu_dataset` when `native/libtuparse.so` has
been built (`make -C native`); the Python parser is the golden reference
(bit-identical graphs asserted in tests/test_collate_native.py).
Measured at NCI1 scale (4k graphs, 240k edge lines, 4-core host):
0.63-0.80 s python vs 0.14-0.21 s native, ~4.6x faster.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libtuparse.so")

_F32P = ctypes.POINTER(ctypes.c_float)
_I64P = ctypes.POINTER(ctypes.c_longlong)


def _load_lib():
    global _LIB
    if _LIB is None and os.path.isfile(_LIB_PATH):
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            # committed binary built for another architecture —
            # the Python twin takes over
            return None
        lib.tu_read_ints.argtypes = [ctypes.c_char_p, _I64P,
                                     ctypes.c_longlong]
        lib.tu_read_ints.restype = ctypes.c_longlong
        lib.tu_read_floats.argtypes = [ctypes.c_char_p, _F32P,
                                       ctypes.c_longlong, _I64P]
        lib.tu_read_floats.restype = ctypes.c_longlong
        _LIB = lib
    return _LIB


def available() -> bool:
    return _load_lib() is not None


def read_ints(path: str) -> np.ndarray:
    """All integer tokens of `path` as an int64 array (C tokenizer)."""
    lib = _load_lib()
    assert lib is not None
    # worst case one token per 2 bytes ("1\n"); +1 for a final bare token
    cap = os.path.getsize(path) // 2 + 1
    out = np.empty(cap, dtype=np.int64)
    n = lib.tu_read_ints(path.encode(), out.ctypes.data_as(_I64P),
                         ctypes.c_longlong(cap))
    if n < 0:
        raise IOError(f"tu_read_ints failed for {path}")
    assert n <= cap, (n, cap)
    return out[:n].copy()


def read_float_matrix(path: str) -> np.ndarray:
    """Float tokens of `path` as a [rows, cols] float32 matrix."""
    lib = _load_lib()
    assert lib is not None
    cap = os.path.getsize(path) // 2 + 1
    out = np.empty(cap, dtype=np.float32)
    rows = ctypes.c_longlong(0)
    n = lib.tu_read_floats(path.encode(), out.ctypes.data_as(_F32P),
                           ctypes.c_longlong(cap), ctypes.byref(rows))
    if n < 0:
        raise IOError(f"tu_read_floats failed for {path}")
    assert n <= cap, (n, cap)
    r = int(rows.value)
    if r == 0:
        return np.zeros((0, 0), dtype=np.float32)
    assert n % r == 0, f"ragged float matrix in {path}: {n} tokens, {r} rows"
    return out[:n].reshape(r, n // r).copy()
