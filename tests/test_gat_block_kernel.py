"""Parity tests for the fused block-dense GAT attention kernel
(ops/pallas/gat_block.py) — interpret mode on CPU, pinned against the
XLA block attention (ops/block.block_gat_attention) and the GATConv
XLA paths."""

import jax
import jax.numpy as jnp
import numpy as np

from gnnbuilder_tpu.core.graph import build_graph_batch
from gnnbuilder_tpu.data.datasets import FakeDataset
from gnnbuilder_tpu.ops.pallas.gat_block import (
    _reference,
    fused_gat_block_layer,
    gat_block_layer_auto,
)


def _block_batch(num_graphs=24, node_dim=8, seed=0):
    graphs = FakeDataset(
        num_graphs=num_graphs, avg_num_nodes=12, node_dim=node_dim,
        edge_dim=4, seed=seed,
    )
    return graphs, build_graph_batch(
        graphs, block_size=128, node_multiple=128, edge_multiple=8
    )


def _params(key, f_in, heads, c):
    ks = jax.random.split(key, 4)
    s = 1.0 / np.sqrt(f_in)
    return (
        jax.random.normal(ks[0], (f_in, heads * c)) * s,   # w
        jax.random.normal(ks[1], (1, heads, c)) * 0.3,     # att_src
        jax.random.normal(ks[2], (1, heads, c)) * 0.3,     # att_dst
        jax.random.normal(ks[3], (heads * c,)) * 0.1,      # bias
    )


def test_gat_block_kernel_matches_xla_block_attention():
    _, g = _block_batch(node_dim=8)
    N, F, H, C = g.num_nodes, 128, 4, 32
    x = jax.random.normal(jax.random.PRNGKey(1), (N, F))
    w, a_s, a_d, b = _params(jax.random.PRNGKey(2), F, H, C)
    out = fused_gat_block_layer(
        x, g.block_adj, w, a_s, a_d, b, H,
        block_size=128, tile_rows=128, interpret=True, mm="f32",
        act="relu",
    )
    ref = _reference(x, g.block_adj, w, a_s, a_d, b, H, 0.2, True,
                     None, "relu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


def test_gat_block_kernel_no_self_loops_and_skip():
    _, g = _block_batch(node_dim=8, seed=4)
    N, F, H, C = g.num_nodes, 128, 2, 64
    x = jax.random.normal(jax.random.PRNGKey(3), (N, F))
    w, a_s, a_d, b = _params(jax.random.PRNGKey(5), F, H, C)
    skip = jax.random.normal(jax.random.PRNGKey(6), (N, H * C))
    out = fused_gat_block_layer(
        x, g.block_adj, w, a_s, a_d, b, H, self_loops=False,
        skip=skip, act=None,
        block_size=128, tile_rows=128, interpret=True, mm="f32",
    )
    ref = _reference(x, g.block_adj, w, a_s, a_d, b, H, 0.2, False,
                     skip, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)
    assert np.isfinite(np.asarray(out)).all()


def test_gat_block_auto_padding_unaligned_dims():
    # raw 11-dim input, H=4 heads x 16 channels (H*C = 64, needs per-head
    # lane padding to 4 x 32)
    _, g = _block_batch(node_dim=11, seed=7)
    N, H, C = g.num_nodes, 4, 16
    x = jnp.asarray(g.node_feat)[:, :11]
    w, a_s, a_d, b = _params(jax.random.PRNGKey(8), 11, H, C)
    out = gat_block_layer_auto(
        x, g.block_adj, w, a_s, a_d, b, H,
        block_size=128, tile_rows=128, interpret=True, mm="f32",
        act="relu",
    )
    ref = _reference(x, g.block_adj, w, a_s, a_d, b, H, 0.2, True,
                     None, "relu")
    assert out.shape == (N, H * C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


def test_gat_block_grad_matches_reference():
    _, g = _block_batch(node_dim=8, num_graphs=12, seed=9)
    N, F, H, C = g.num_nodes, 128, 4, 32
    x = jax.random.normal(jax.random.PRNGKey(10), (N, F))
    w, a_s, a_d, b = _params(jax.random.PRNGKey(11), F, H, C)

    def f_kernel(xx, ww):
        return jnp.sum(gat_block_layer_auto(
            xx, g.block_adj, ww, a_s, a_d, b, H,
            block_size=128, tile_rows=128, interpret=True, mm="f32",
        ) ** 2)

    def f_ref(xx, ww):
        return jnp.sum(_reference(
            xx, g.block_adj, ww, a_s, a_d, b, H, 0.2, True, None, None
        ) ** 2)

    gk = jax.grad(f_kernel, argnums=(0, 1))(x, w)
    gr = jax.grad(f_ref, argnums=(0, 1))(x, w)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-3, rtol=2e-3)


def test_gatconv_dispatches_block_kernel_in_inference():
    """GATConv on a block batch inside always-mode + inference scope runs
    the block kernel and matches the mode=never XLA forward."""
    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.ops import dispatch

    _, g = _block_batch(node_dim=11, num_graphs=16, seed=12)
    model = gnnb.GNNModel(
        graph_input_feature_dim=11,
        gnn_hidden_dim=128,
        gnn_num_layers=2,
        gnn_output_dim=64,
        gnn_conv="gat",
        conv_kwargs={"heads": 1},
        pooling_aggrs=("add", "mean"),
        mlp_hidden_dim=32,
        mlp_hidden_layers=1,
    )
    params = model.init(jax.random.PRNGKey(0), g)

    from gnnbuilder_tpu.ops.pallas import gat_block

    calls = {"n": 0}
    orig = gat_block.gat_block_layer_auto

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    dispatch.set_fused_mode("never")
    try:
        ref = model.apply(params, g)
    finally:
        dispatch.set_fused_mode("auto")

    gat_block.gat_block_layer_auto = counting
    try:
        dispatch.set_fused_mode("always")
        with dispatch.inference_mode():
            out = model.apply(params, g)
    finally:
        gat_block.gat_block_layer_auto = orig
        dispatch.set_fused_mode("auto")
    assert calls["n"] == 2, f"block kernel calls: {calls['n']}"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def _simple_block_batch(num_graphs=24, node_dim=8, seed=0):
    """FakeDataset with duplicate edges removed (simple graphs): the
    dense per-pair edge-logit table is exact only when multigraph_static
    is False, which is the molecular-dataset case."""
    from gnnbuilder_tpu.data.datasets import Graph

    graphs = FakeDataset(num_graphs=num_graphs, avg_num_nodes=12,
                         node_dim=node_dim, edge_dim=4, seed=seed)
    out = []
    for g in graphs:
        key = g.edge_index[0] * (g.num_nodes + 1) + g.edge_index[1]
        _, idx = np.unique(key, return_index=True)
        out.append(Graph(x=g.x, edge_index=g.edge_index[:, idx],
                         edge_attr=g.edge_attr[idx]))
    b = build_graph_batch(out, block_size=128, node_multiple=128,
                          edge_multiple=8)
    assert not b.multigraph_static
    return out, b


def test_gat_block_mean_mode_matches_reference():
    """concat=False (PyG head averaging) through the block kernel — the
    mode the round-4 kernel rejected (VERDICT r4 next #8)."""
    _, g = _block_batch(node_dim=8)
    N, F, H, C = g.num_nodes, 128, 4, 32
    x = jax.random.normal(jax.random.PRNGKey(3), (N, F))
    w, a_s, a_d, _ = _params(jax.random.PRNGKey(4), F, H, C)
    b = jax.random.normal(jax.random.PRNGKey(5), (C,)) * 0.1
    out = gat_block_layer_auto(
        x, g.block_adj, w, a_s, a_d, b, H,
        block_size=128, tile_rows=128, interpret=True, mm="f32",
        act="relu", concat=False,
    )
    ref = _reference(x, g.block_adj, w, a_s, a_d, b, H, 0.2, True,
                     None, "relu", concat=False)
    assert out.shape == (N, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


def test_gat_block_edge_features_match_windowed_conv():
    """edge_dim attention through the block kernel == the windowed/XLA
    GATConv path on the same batch (the per-pair logit table is exact on
    simple graphs; FakeDataset produces none)."""
    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.ops import dispatch
    from gnnbuilder_tpu.ops.pallas.gat_block import build_block_edge_logits

    graphs, g = _simple_block_batch(node_dim=8)
    assert not g.multigraph_static
    conv = gnnb.GATConv(in_channels=8, out_channels=16, heads=2,
                        edge_dim=4)
    params = conv.init(jax.random.PRNGKey(7), g, g.node_feat)
    want = np.asarray(conv.apply(params, g, g.node_feat))

    with dispatch.inference_mode():
        dispatch.set_fused_mode("always")
        try:
            got = np.asarray(conv.apply(params, g, g.node_feat))
        finally:
            dispatch.set_fused_mode("auto")
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_gat_block_edge_mean_combo():
    """edge_dim + concat=False together through the model-level dispatch."""
    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.ops import dispatch

    graphs, g = _simple_block_batch(node_dim=8, seed=9)
    conv = gnnb.GATConv(in_channels=8, out_channels=24, heads=4,
                        concat=False, edge_dim=4)
    params = conv.init(jax.random.PRNGKey(8), g, g.node_feat)
    want = np.asarray(conv.apply(params, g, g.node_feat))
    with dispatch.inference_mode():
        dispatch.set_fused_mode("always")
        try:
            got = np.asarray(conv.apply(params, g, g.node_feat))
        finally:
            dispatch.set_fused_mode("auto")
    assert got.shape == (g.num_nodes, 24)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
