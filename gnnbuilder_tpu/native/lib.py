"""ctypes loader for the native packing library.

Falls back gracefully (``available() -> False``) when the shared library has
not been built; ``python -m gnnbuilder_tpu.native.build`` builds it with g++.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_ABI_VERSION = 2  # must match gnnb_abi_version() in packing.cpp
# ABI-versioned filename: dlopen caches by path within a process, so a
# rebuild after an ABI bump must land at a NEW path to be loadable without
# restarting (stale versions are just ignored)
_SO_PATH = os.path.join(_HERE, f"libgnnb_packing.abi{_ABI_VERSION}.so")

_lib = None


_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    from gnnbuilder_tpu.native import build as _build

    def _open():
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        try:
            if lib.gnnb_abi_version() != _ABI_VERSION:
                return None
        except AttributeError:
            return None
        return lib

    lib = _open() if os.path.exists(_SO_PATH) else None
    if lib is None:
        # missing or stale: lazy rebuild (no-op without a toolchain)
        if not _build.build(verbose=False):
            _load_failed = True
            return None
        lib = _open()
    if lib is None:
        _load_failed = True
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
    lib.gnnb_concat_edges.argtypes = [
        i64p,  # edge_counts [num_graphs]
        i64p,  # node_counts [num_graphs]
        i64p,  # edges_concat [2 * total_edges]
        ctypes.c_int64,  # num_graphs
        ctypes.c_int64,  # total_edges
        i64p,  # out senders [total_edges]
        i64p,  # out receivers [total_edges]
        i32p,  # out node_graph [total_nodes]
        ctypes.c_int64,  # total_nodes
    ]
    lib.gnnb_concat_edges.restype = ctypes.c_int
    lib.gnnb_build_ell.argtypes = [
        i32p,  # sorted_senders [e_pad]
        i32p,  # row_offsets [n_pad+1]
        ctypes.c_int64,  # n_pad
        ctypes.c_int64,  # e_pad
        ctypes.c_int64,  # ell_width
        ctypes.c_int64,  # ghost
        i32p,  # out nbr_nodes [n_pad * ell_width]
        i32p,  # out nbr_edges [n_pad * ell_width]
    ]
    lib.gnnb_build_ell.restype = ctypes.c_int
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


def concat_edges(edge_counts, node_counts, edges_concat, total_nodes):
    """Offset per-graph edge ids into global ids + emit per-node graph ids.

    ``edges_concat`` is [2, total_edges] (graph-major concatenation of raw
    per-graph edge_index arrays).  Returns (senders[total_edges] i64,
    receivers[total_edges] i64, node_graph[total_nodes] i32).
    """
    lib = _load()
    assert lib is not None
    num_graphs = int(edge_counts.shape[0])
    total_edges = int(edges_concat.shape[1])
    s_out = np.empty((total_edges,), dtype=np.int64)
    r_out = np.empty((total_edges,), dtype=np.int64)
    node_graph = np.empty((total_nodes,), dtype=np.int32)
    rc = lib.gnnb_concat_edges(
        np.ascontiguousarray(edge_counts, dtype=np.int64),
        np.ascontiguousarray(node_counts, dtype=np.int64),
        np.ascontiguousarray(edges_concat, dtype=np.int64).reshape(-1),
        num_graphs,
        total_edges,
        s_out,
        r_out,
        node_graph,
        total_nodes,
    )
    if rc != 0:
        raise RuntimeError(f"gnnb_concat_edges failed with code {rc}")
    return s_out, r_out, node_graph


def build_ell(sorted_senders, row_offsets, e_pad, ell_width, ghost):
    """Dense [n_pad, ell_width] neighbor-node and edge-id tables from CSR."""
    lib = _load()
    assert lib is not None
    n_pad = int(row_offsets.shape[0]) - 1
    nbr_nodes = np.empty((n_pad, ell_width), dtype=np.int32)
    nbr_edges = np.empty((n_pad, ell_width), dtype=np.int32)
    rc = lib.gnnb_build_ell(
        np.ascontiguousarray(sorted_senders, dtype=np.int32),
        np.ascontiguousarray(row_offsets, dtype=np.int32),
        n_pad,
        int(e_pad),
        int(ell_width),
        int(ghost),
        nbr_nodes.reshape(-1),
        nbr_edges.reshape(-1),
    )
    if rc != 0:
        raise RuntimeError(f"gnnb_build_ell failed with code {rc}")
    return nbr_nodes, nbr_edges
