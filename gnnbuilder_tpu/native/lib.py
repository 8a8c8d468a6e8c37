"""ctypes loader for the native packing library.

Falls back gracefully (``available() -> False``) when the shared library has
not been built; ``python -m gnnbuilder_tpu.native.build`` builds it with g++.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libgnnb_packing.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
    lib.gnnb_sort_and_csr.argtypes = [
        i64p,  # senders [num_edges]
        i64p,  # receivers [num_edges]
        ctypes.c_int64,  # num_edges
        ctypes.c_int64,  # num_nodes
        ctypes.c_int64,  # n_pad
        ctypes.c_int64,  # e_pad
        ctypes.c_int64,  # ghost
        i32p,  # out senders [e_pad]
        i32p,  # out receivers [e_pad]
        i64p,  # out perm [num_edges]
        i32p,  # out row_offsets [n_pad+1]
        i32p,  # out in_degree [n_pad]
    ]
    lib.gnnb_sort_and_csr.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def sort_and_csr(senders, receivers, num_nodes, n_pad, e_pad, ghost):
    lib = _load()
    assert lib is not None
    num_edges = int(senders.shape[0])
    s_out = np.empty((e_pad,), dtype=np.int32)
    r_out = np.empty((e_pad,), dtype=np.int32)
    perm = np.empty((num_edges,), dtype=np.int64)
    row_offsets = np.empty((n_pad + 1,), dtype=np.int32)
    in_degree = np.empty((n_pad,), dtype=np.int32)
    rc = lib.gnnb_sort_and_csr(
        np.ascontiguousarray(senders, dtype=np.int64),
        np.ascontiguousarray(receivers, dtype=np.int64),
        num_edges,
        num_nodes,
        n_pad,
        e_pad,
        ghost,
        s_out,
        r_out,
        perm,
        row_offsets,
        in_degree,
    )
    if rc != 0:
        raise RuntimeError(f"gnnb_sort_and_csr failed with code {rc}")
    return s_out, r_out, perm, row_offsets, in_degree
