"""Parity tests for the fused block-local EdgeConv kernel
(ops/pallas/edge_block.py) — interpret mode on CPU, pinned against
EdgeConv's ELL path semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnbuilder_tpu.core.graph import build_graph_batch
from gnnbuilder_tpu.data.datasets import FakeDataset
from gnnbuilder_tpu.ops.pallas.edge_block import (
    edge_block_layer_auto,
    edge_block_reference,
    fused_edge_block_layer,
)


def _block_batch(num_graphs=24, node_dim=8, seed=0):
    graphs = FakeDataset(
        num_graphs=num_graphs, avg_num_nodes=12, node_dim=node_dim,
        edge_dim=4, seed=seed,
    )
    return graphs, build_graph_batch(
        graphs, block_size=128, node_multiple=128, edge_multiple=8
    )


def _params(key, f_in, f, f_out):
    ks = jax.random.split(key, 4)
    s = 1.0 / np.sqrt(2 * f_in)
    return (
        jax.random.normal(ks[0], (2 * f_in, f)) * s,   # w_pair
        jax.random.normal(ks[1], (f,)) * 0.1,          # b0
        jax.random.normal(ks[2], (f, f_out)) * s,      # w1
        jax.random.normal(ks[3], (f_out,)) * 0.1,      # b1
    )


@pytest.mark.parametrize("aggregation", ["max", "sum", "mean"])
def test_edge_block_kernel_matches_reference(aggregation):
    _, g = _block_batch(node_dim=8)
    N, F = g.num_nodes, 128
    x = jax.random.normal(jax.random.PRNGKey(1), (N, F))
    w_pair, b0, w1, b1 = _params(jax.random.PRNGKey(2), F, F, F)
    out = fused_edge_block_layer(
        x, g.nbr_nodes, g.in_degree, w_pair, b0, w1, b1,
        aggregation=aggregation, act="relu",
        block_size=128, tile_rows=128, interpret=True,
        gather_mode="split2", mm="f32",
    )
    ref = edge_block_reference(
        x, g.nbr_nodes, g.in_degree, w_pair, b0, w1, b1,
        aggregation=aggregation, act="relu",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


def test_edge_block_auto_padding_and_skip():
    _, g = _block_batch(node_dim=11, seed=3)
    N = g.num_nodes
    x = jnp.asarray(g.node_feat)[:, :11]
    w_pair, b0, w1, b1 = _params(jax.random.PRNGKey(5), 11, 64, 64)
    skip = jax.random.normal(jax.random.PRNGKey(6), (N, 64))
    out = edge_block_layer_auto(
        x, g.nbr_nodes, g.in_degree, w_pair, b0, w1, b1,
        aggregation="max", skip=skip, act="relu",
        block_size=128, tile_rows=128, interpret=True,
        gather_mode="split2", mm="f32",
    )
    ref = edge_block_reference(
        x, g.nbr_nodes, g.in_degree, w_pair, b0, w1, b1,
        aggregation="max", skip=skip, act="relu",
    )
    assert out.shape == (N, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


def test_edge_block_grad_matches_reference():
    _, g = _block_batch(node_dim=8, num_graphs=12, seed=7)
    N, F = g.num_nodes, 128
    x = jax.random.normal(jax.random.PRNGKey(8), (N, F))
    w_pair, b0, w1, b1 = _params(jax.random.PRNGKey(9), F, F, F)

    def f_kernel(xx, wp):
        return jnp.sum(edge_block_layer_auto(
            xx, g.nbr_nodes, g.in_degree, wp, b0, w1, b1,
            aggregation="max", block_size=128, tile_rows=128,
            interpret=True, gather_mode="split2", mm="f32",
        ) ** 2)

    def f_ref(xx, wp):
        return jnp.sum(edge_block_reference(
            xx, g.nbr_nodes, g.in_degree, wp, b0, w1, b1,
            aggregation="max",
        ) ** 2)

    gk = jax.grad(f_kernel, argnums=(0, 1))(x, w_pair)
    gr = jax.grad(f_ref, argnums=(0, 1))(x, w_pair)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-3, rtol=2e-3)


def test_edgeconv_dispatches_block_kernel_in_inference():
    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.ops import dispatch

    _, g = _block_batch(node_dim=11, num_graphs=16, seed=10)
    model = gnnb.GNNModel(
        graph_input_feature_dim=11,
        gnn_hidden_dim=128,
        gnn_num_layers=2,
        gnn_output_dim=64,
        gnn_conv="edge",
        pooling_aggrs=("add", "mean"),
        mlp_hidden_dim=32,
        mlp_hidden_layers=1,
    )
    params = model.init(jax.random.PRNGKey(0), g)

    from gnnbuilder_tpu.ops.pallas import edge_block

    calls = {"n": 0}
    orig = edge_block.edge_block_layer_auto

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    dispatch.set_fused_mode("never")
    try:
        ref = model.apply(params, g)
    finally:
        dispatch.set_fused_mode("auto")

    edge_block.edge_block_layer_auto = counting
    try:
        dispatch.set_fused_mode("always")
        with dispatch.inference_mode():
            out = model.apply(params, g)
    finally:
        edge_block.edge_block_layer_auto = orig
        dispatch.set_fused_mode("auto")
    assert calls["n"] == 2, f"edge block kernel calls: {calls['n']}"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
