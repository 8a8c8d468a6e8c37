"""Block-diagonal packing (build_graph_batch block_size=B): bin-packed
graphs never cross a B-row boundary and the batch adjacency materializes
as dense [N/B, B, B] blocks — the layout that turns the aggregation SpMM
into one MXU-native batched matmul (ops/block.py).  Model outputs must be
IDENTICAL to standard packing on every path (the layout only moves the
padding between graphs); the validator checks the structural invariants
(core/validate.py).  Reference analog: the packed testbench data layout,
code_gen.py:227-305."""

import jax
import numpy as np
import pytest

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.core.graph import build_graph_batch
from gnnbuilder_tpu.core.validate import validate_batch
from gnnbuilder_tpu.data.datasets import Graph, load_dataset


def _graphs(n=24, seed=0):
    return load_dataset("qm9", n=n, seed=seed)


def test_block_batch_validates():
    b = build_graph_batch(_graphs(), block_size=128)
    validate_batch(b)
    assert b.block_size_static == 128
    assert b.num_nodes % 128 == 0
    assert b.block_adj is not None
    assert b.block_adj.shape == (b.num_nodes // 128, 128, 128)
    # ghost row stays padding even under bin-packing
    assert not bool(np.asarray(b.node_mask)[-1])


def test_block_adj_row_sums_match_degree():
    b = build_graph_batch(_graphs(), block_size=128)
    A = np.asarray(b.block_adj, dtype=np.float32)
    deg = np.asarray(b.in_degree)
    np.testing.assert_array_equal(A.sum(axis=2).reshape(-1), deg)


def test_no_graph_crosses_block_boundary():
    b = build_graph_batch(_graphs(64), block_size=128)
    gs = np.asarray(b.graph_starts)
    nn = np.asarray(b.n_node)
    for gi in range(b.num_graphs - 1):
        s, n = int(gs[gi]), int(nn[gi])
        assert s // 128 == (s + n - 1) // 128


def test_graph_too_large_raises():
    g = Graph(
        x=np.zeros((130, 4), np.float32),
        edge_index=np.zeros((2, 0), np.int64),
    )
    with pytest.raises(AssertionError, match="block_size"):
        build_graph_batch([g], block_size=128)


def test_graph_starts_standard_packing_is_cumsum():
    b = build_graph_batch(_graphs(8))
    gs = np.asarray(b.graph_starts)
    nn = np.asarray(b.n_node)
    np.testing.assert_array_equal(gs[:8], np.cumsum(nn[:8]) - nn[:8])
    assert gs[8] == nn[:8].sum()  # ghost entry = first pad row


@pytest.mark.parametrize("conv", ["gcn", "gin", "sage", "pna", "gat"])
def test_model_forward_identical_to_standard_packing(conv):
    graphs = _graphs(32, seed=3)
    b_std = build_graph_batch(graphs)
    b_blk = build_graph_batch(graphs, block_size=128)
    validate_batch(b_blk)
    model = gnnb.GNNModel(
        graph_input_feature_dim=11,
        gnn_hidden_dim=16,
        gnn_num_layers=2,
        gnn_output_dim=8,
        gnn_conv=conv,
        pooling_aggrs=("add", "mean", "max"),
        mlp_out_dim=1,
        gnn_skip_connection=True,
    )
    params = model.init(jax.random.PRNGKey(0), b_std)
    o_std = np.asarray(model.apply(params, b_std))[:32]
    o_blk = np.asarray(model.apply(params, b_blk))[:32]
    np.testing.assert_allclose(o_blk, o_std, atol=1e-6)


def test_block_batch_edge_features_follow_sort():
    graphs = load_dataset("esol", n=16, seed=1)
    assert graphs[0].edge_attr is not None
    b_std = build_graph_batch(graphs)
    b_blk = build_graph_batch(graphs, block_size=128)
    # per real edge, (sender graph-local id, edge features) multisets match
    for b in (b_std, b_blk):
        validate_batch(b)
    e = int(np.asarray(b_std.edge_mask).sum())
    ef_std = np.asarray(b_std.edge_feat)[:e]
    ef_blk = np.asarray(b_blk.edge_feat)[:e]
    # sort both by a stable edge signature (graph id, local src, local dst)
    def sig(batch, ef):
        gs = np.asarray(batch.graph_starts)
        ng = np.asarray(batch.node_graph)
        snd = np.asarray(batch.senders)[:e]
        rcv = np.asarray(batch.receivers)[:e]
        gid = ng[rcv]
        loc_s = snd - gs[gid]
        loc_r = rcv - gs[gid]
        order = np.lexsort((loc_s, loc_r, gid))
        return np.concatenate(
            [np.stack([gid, loc_r, loc_s], 1)[order], ef[order]], axis=1
        )
    np.testing.assert_allclose(sig(b_std, ef_std), sig(b_blk, ef_blk))


def test_node_budget_respects_block_multiple():
    graphs = _graphs(8)
    b = build_graph_batch(graphs, block_size=128, node_budget=512)
    assert b.num_nodes == 512
    validate_batch(b)
    with pytest.raises(AssertionError):
        build_graph_batch(graphs, block_size=128, node_budget=520)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_block_packing_fuzz_random_sizes(seed):
    """Random graph-size mixes (1..block_size nodes, incl. edgeless and
    exactly-full blocks): pack, validate, and check GIN forward parity
    vs standard packing."""
    import jax

    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(20):
        n = int(rng.integers(1, 129))
        e = int(rng.integers(0, max(2 * n, 1)))
        ei = rng.integers(0, n, size=(2, e)).astype(np.int64)
        graphs.append(Graph(
            x=rng.normal(size=(n, 6)).astype(np.float32),
            edge_index=ei,
        ))
    b_std = build_graph_batch(graphs, ell_width=0)
    b_blk = build_graph_batch(graphs, block_size=128, ell_width=0)
    validate_batch(b_blk, strict_ell=False)

    import gnnbuilder_tpu as gnnb

    model = gnnb.GNNModel(
        graph_input_feature_dim=6, gnn_hidden_dim=8, gnn_num_layers=2,
        gnn_output_dim=4, gnn_conv="gin", pooling_aggrs=("add", "mean"),
        mlp_out_dim=1,
    )
    params = model.init(jax.random.PRNGKey(0), b_std)
    o1 = np.asarray(model.apply(params, b_std))[:20]
    o2 = np.asarray(model.apply(params, b_blk))[:20]
    np.testing.assert_allclose(o2, o1, atol=1e-5)


def test_block_size_auto_policy():
    """block_size="auto" picks block packing only above the measured node
    crossover, and never when a graph exceeds one block (the round-5
    auto-packing policy, core/graph.resolve_block_size)."""
    from gnnbuilder_tpu.core import graph as cg

    small = _graphs(n=24)  # ~400 QM9 nodes, far below the crossover
    b = build_graph_batch(small, block_size="auto")
    assert b.block_size_static == 0

    # a batch past the crossover packs block128
    n_needed = cg._BLOCK_AUTO_MIN_NODES
    many = _graphs(n=-(-n_needed // 12))  # qm9 graphs are >=12 nodes here
    assert sum(g.x.shape[0] for g in many) >= n_needed
    b2 = build_graph_batch(many, block_size="auto")
    assert b2.block_size_static == 128
    validate_batch(b2, strict_ell=False)

    # oversized graph forces standard packing regardless of batch size
    rng = np.random.default_rng(0)
    big = Graph(
        x=rng.normal(size=(200, 6)).astype(np.float32),
        edge_index=rng.integers(0, 200, size=(2, 300)).astype(np.int64),
    )
    small6 = [
        Graph(x=g.x[:, :6].astype(np.float32), edge_index=g.edge_index)
        for g in small
    ]
    b3 = build_graph_batch(small6 + [big] * 700, block_size="auto")
    assert b3.block_size_static == 0
