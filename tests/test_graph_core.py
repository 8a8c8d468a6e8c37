"""Core graph substrate tests: packing, CSR tables, padding invariants.

Mirrors the reference's table-builder tests (test.cpp:884-1055) including the
numpy-vs-networkx cross-check idea from gen_test_data.py:129-173.
"""

import networkx as nx
import numpy as np

from gnnbuilder_tpu.core.graph import build_graph_batch, pad_sizes
from gnnbuilder_tpu.data.datasets import FakeDataset, er_graph


def test_pad_sizes_multiples():
    n, e, g = pad_sizes(10, 21, 3, node_multiple=8, edge_multiple=8)
    assert n % 8 == 0 and n >= 11
    assert e % 8 == 0 and e >= 21
    assert g == 4


def test_batch_single_er_graph_csr_vs_networkx():
    g = er_graph(n=50, p=0.1, seed=3)
    batch = build_graph_batch([g])
    s = np.asarray(batch.senders)
    r = np.asarray(batch.receivers)
    ro = np.asarray(batch.row_offsets)
    deg = np.asarray(batch.in_degree)

    G = nx.DiGraph()
    G.add_nodes_from(range(g.num_nodes))
    G.add_edges_from(zip(g.edge_index[0], g.edge_index[1]))

    # in-degree table matches networkx
    for v in range(g.num_nodes):
        assert deg[v] == G.in_degree(v)

    # receivers sorted; CSR row slices contain exactly the predecessors
    assert np.all(np.diff(r) >= 0)
    for v in range(g.num_nodes):
        neigh = sorted(s[ro[v]: ro[v + 1]].tolist())
        assert neigh == sorted(G.predecessors(v)), v
        assert np.all(r[ro[v]: ro[v + 1]] == v)


def test_batch_multiple_graphs_offsets_and_masks():
    graphs = FakeDataset(num_graphs=5, avg_num_nodes=10, seed=1)
    batch = build_graph_batch(graphs)
    total_nodes = sum(g.num_nodes for g in graphs)
    total_edges = sum(g.num_edges for g in graphs)

    assert int(np.asarray(batch.node_mask).sum()) == total_nodes
    assert int(np.asarray(batch.edge_mask).sum()) == total_edges
    assert int(np.asarray(batch.graph_mask).sum()) == 5
    assert batch.num_graphs == 6  # +1 ghost

    ng = np.asarray(batch.node_graph)
    nn_ = np.asarray(batch.n_node)
    for gi, g in enumerate(graphs):
        assert (ng == gi).sum() == g.num_nodes == nn_[gi]
    # pad nodes all in ghost graph
    assert np.all(ng[total_nodes:] == batch.num_graphs - 1)

    # pad edges are ghost->ghost self edges
    s = np.asarray(batch.senders)
    r = np.asarray(batch.receivers)
    ghost = batch.num_nodes - 1
    assert np.all(s[total_edges:] == ghost)
    assert np.all(r[total_edges:] == ghost)

    # edge feature permutation consistent: edge_attr[k] belongs to edge
    # (senders[k], receivers[k])
    ef = np.asarray(batch.edge_feat)
    lookup = {}
    off = 0
    for g in graphs:
        for j in range(g.num_edges):
            key = (g.edge_index[0, j] + off, g.edge_index[1, j] + off)
            lookup.setdefault(key, []).append(g.edge_attr[j])
        off += g.num_nodes
    for k in range(total_edges):
        cands = lookup[(s[k], r[k])]
        assert any(np.allclose(ef[k], c) for c in cands)


def test_budgets_respected():
    graphs = FakeDataset(num_graphs=3, avg_num_nodes=6, seed=2)
    batch = build_graph_batch(
        graphs, node_budget=128, edge_budget=256, graph_budget=8
    )
    assert batch.num_nodes == 128
    assert batch.num_edges == 256
    assert batch.num_graphs == 8


def test_validate_batch_passes_and_catches():
    """validate_batch (the sanitizer, gen_test_data.py:129-173 analog)
    accepts packer output and rejects corrupted batches."""
    import dataclasses

    import jax.numpy as jnp
    import pytest

    from gnnbuilder_tpu.core.validate import validate_batch
    from gnnbuilder_tpu.data.datasets import FakeDataset

    graphs = FakeDataset(num_graphs=6, avg_num_nodes=12, node_dim=8, seed=9)
    b = build_graph_batch(graphs)
    validate_batch(b)

    # corrupt the sort order
    bad = b.replace(
        receivers=jnp.asarray(np.asarray(b.receivers)[::-1].copy())
    )
    with pytest.raises(AssertionError):
        validate_batch(bad)

    # corrupt the degree table
    bad2 = b.replace(in_degree=b.in_degree + 1)
    with pytest.raises(AssertionError):
        validate_batch(bad2)
