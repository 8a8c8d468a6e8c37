"""Native C++ packer vs numpy-fallback parity.

The reference builds its graph-format tables (degree/neighbor tables,
gnn_builder_lib.h:1051-1166) in native code on the accelerator and unit-tests
them against a numpy/networkx cross-check (gen_test_data.py:129-173).  Here
the native code runs on the host; these tests pin it bit-for-bit to the
vectorized numpy fallback in core/packing.py.
"""

import numpy as np
import pytest

from gnnbuilder_tpu.core import packing
from gnnbuilder_tpu.native import lib as native


def _numpy_sort_and_csr(s, r, num_nodes, n_pad, e_pad, ghost):
    E = s.shape[0]
    perm = np.argsort(r, kind="stable") if E else np.zeros((0,), np.int64)
    so = np.full((e_pad,), ghost, np.int32)
    ro = np.full((e_pad,), ghost, np.int32)
    if E:
        so[:E] = s[perm]
        ro[:E] = r[perm]
    deg = np.zeros((n_pad,), np.int32)
    if E:
        np.add.at(deg, r.astype(np.int64), 1)
    counts = deg.copy()
    counts[ghost] += e_pad - E
    offs = np.zeros((n_pad + 1,), np.int32)
    offs[1:] = np.cumsum(counts)
    return so, ro, perm, offs, deg


@pytest.mark.skipif(not native.available(), reason="native lib not built")
@pytest.mark.parametrize("seed,num_nodes,num_edges", [(0, 100, 450), (1, 7, 3), (2, 1, 0), (3, 513, 4096)])
def test_sort_and_csr_native_matches_numpy(seed, num_nodes, num_edges):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, num_nodes, num_edges).astype(np.int64)
    r = rng.integers(0, num_nodes, num_edges).astype(np.int64)
    n_pad = ((num_nodes + 1 + 7) // 8) * 8
    e_pad = ((max(num_edges, 1) + 7) // 8) * 8
    ghost = n_pad - 1
    got = native.sort_and_csr(s, r, num_nodes, n_pad, e_pad, ghost)
    want = _numpy_sort_and_csr(s, r, num_nodes, n_pad, e_pad, ghost)
    for g, w, name in zip(got, want, ["senders", "receivers", "perm", "row_offsets", "in_degree"]):
        np.testing.assert_array_equal(g, w, err_msg=name)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_concat_edges_native_matches_numpy():
    rng = np.random.default_rng(7)
    num_graphs = 32
    node_counts = rng.integers(1, 30, num_graphs).astype(np.int64)
    edge_counts = (node_counts * 2).astype(np.int64)
    total_nodes = int(node_counts.sum())
    total_edges = int(edge_counts.sum())
    cols = []
    for g in range(num_graphs):
        cols.append(rng.integers(0, node_counts[g], (2, edge_counts[g])))
    edge_index = np.concatenate(cols, axis=1).astype(np.int64)

    got = native.concat_edges(edge_counts, node_counts, edge_index, total_nodes)

    node_offsets = np.zeros((num_graphs,), np.int64)
    np.cumsum(node_counts[:-1], out=node_offsets[1:])
    per_edge = np.repeat(node_offsets, edge_counts)
    np.testing.assert_array_equal(got[0], edge_index[0] + per_edge)
    np.testing.assert_array_equal(got[1], edge_index[1] + per_edge)
    np.testing.assert_array_equal(
        got[2], np.repeat(np.arange(num_graphs, dtype=np.int32), node_counts)
    )


def test_row_offsets_consistent_with_sorted_receivers():
    """CSR invariant: receivers[row_offsets[v]:row_offsets[v+1]] == v."""
    rng = np.random.default_rng(11)
    num_nodes, num_edges = 50, 200
    s = rng.integers(0, num_nodes, num_edges).astype(np.int64)
    r = rng.integers(0, num_nodes, num_edges).astype(np.int64)
    n_pad, e_pad = 56, 208
    ghost = n_pad - 1
    so, ro, perm, offs, deg = packing.sort_and_csr(s, r, num_nodes, n_pad, e_pad, ghost)
    for v in range(n_pad):
        seg = ro[offs[v] : offs[v + 1]]
        assert (seg == v).all()
    assert offs[-1] == e_pad


@pytest.mark.skipif(not native.available(), reason="native lib not built")
@pytest.mark.parametrize("seed,num_nodes,num_edges,W", [(0, 100, 450, 12), (5, 40, 80, 8)])
def test_build_ell_native_matches_numpy(seed, num_nodes, num_edges, W):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, num_nodes, num_edges).astype(np.int64)
    r = rng.integers(0, num_nodes, num_edges).astype(np.int64)
    n_pad = ((num_nodes + 8) // 8) * 8
    e_pad = ((num_edges + 7) // 8) * 8
    ghost = n_pad - 1
    so, ro, perm, offs, deg = packing.sort_and_csr(s, r, num_nodes, n_pad, e_pad, ghost)
    W = max(W, int(deg.max()))
    got = native.build_ell(so, offs, e_pad, W, ghost)

    # numpy fallback path (force by calling the module-level implementation)
    nbr_nodes = np.full((n_pad, W), ghost, np.int32)
    nbr_edges = np.full((n_pad, W), e_pad - 1, np.int32)
    for v in range(n_pad):
        lo, hi = offs[v], offs[v + 1]
        ln = min(hi - lo, W)
        nbr_nodes[v, :ln] = so[lo : lo + ln]
        nbr_edges[v, :ln] = np.arange(lo, lo + ln)
    np.testing.assert_array_equal(got[0], nbr_nodes)
    np.testing.assert_array_equal(got[1], nbr_edges)

    # semantic check: ELL gather-sum == scatter segment-sum on real rows
    x = rng.standard_normal((n_pad, 16)).astype(np.float32)
    mask = np.arange(W)[None, :] < deg[:, None]
    ell_sum = np.where(mask[..., None], x[got[0]], 0.0).sum(axis=1)
    seg = np.zeros_like(x)
    np.add.at(seg, r, x[s])
    np.testing.assert_allclose(ell_sum[:num_nodes], seg[:num_nodes], atol=1e-5)
