"""Parity tests for the whole-stack block-local PNA kernel
(ops/pallas/pna_block.py) — interpret mode on CPU, pinned against the
layer-iterated XLA reference (the golden semantics of GNNModel's conv
loop, reference models.py:551-566)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnbuilder_tpu.core.graph import build_graph_batch
from gnnbuilder_tpu.data.datasets import FakeDataset
from gnnbuilder_tpu.ops.pallas.pna_block import (
    fused_pna_block_stack,
    pna_block_stack_auto,
    pna_stack_reference,
    _stack_params,
)


def _block_batch(num_graphs=24, node_dim=8, seed=0):
    graphs = FakeDataset(
        num_graphs=num_graphs, avg_num_nodes=12, node_dim=node_dim,
        edge_dim=4, seed=seed,
    )
    return graphs, build_graph_batch(
        graphs, block_size=128, node_multiple=128, edge_multiple=8
    )


def _layer(key, f_in, f, f_out):
    ks = jax.random.split(key, 6)
    # modest scales keep 3-layer-chain magnitudes O(1): the
    # kernel reorders u-outside-the-reduce like the windowed
    # kernel (same contract: atol 5e-4 / rtol 1e-3 per layer)
    s = 0.3 / np.sqrt(f_in + 1)
    return (
        jax.random.normal(ks[0], (2 * f_in, f)) * s,      # w_pre
        jax.random.normal(ks[1], (f,)) * 0.1,             # b_pre
        jax.random.normal(ks[2], (f_in + 12 * f, f_out)) * s,  # k_post
        jax.random.normal(ks[3], (f_out,)) * 0.1,         # b_post
        jax.random.normal(ks[4], (f_out, f_out)) * s,     # w_lin
        jax.random.normal(ks[5], (f_out,)) * 0.1,         # b_lin
    )


def test_stack_kernel_matches_reference_chain():
    _, g = _block_batch(node_dim=8)
    N = g.num_nodes
    F = 128
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(9), (N, F))
    L = 3
    layers = [_layer(jax.random.fold_in(key, i), F, F, F)
              for i in range(L)]
    deltas = (2.0,) * L
    skips = (False, True, False)

    stacked = _stack_params(tuple(layers), F)
    out = fused_pna_block_stack(
        x, g.nbr_nodes, g.in_degree, *stacked,
        deltas=deltas, skips=skips, act="relu",
        block_size=128, tile_rows=128, interpret=True,
        gather_mode="split2", mm="f32",
    )
    ref = pna_stack_reference(
        x, g.nbr_nodes, g.in_degree, layers, deltas, skips, act="relu"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=2e-3)


def test_stack_kernel_multiblock_tile():
    # one grid step covering two 128-blocks (TN = 256): the fori_loop
    # block path with dynamic ref offsets
    _, g = _block_batch(num_graphs=30, node_dim=8, seed=3)
    if g.num_nodes % 256:
        pytest.skip("batch did not pack to a 256 multiple")
    N, F = g.num_nodes, 128
    x = jax.random.normal(jax.random.PRNGKey(1), (N, F))
    layers = [_layer(jax.random.PRNGKey(11), F, F, F)]
    stacked = _stack_params(tuple(layers), F)
    out = fused_pna_block_stack(
        x, g.nbr_nodes, g.in_degree, *stacked,
        deltas=(1.5,), skips=(False,), act=None,
        block_size=128, tile_rows=256, interpret=True,
        gather_mode="split2", mm="f32",
    )
    ref = pna_stack_reference(
        x, g.nbr_nodes, g.in_degree, layers, (1.5,), (False,), act=None
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=2e-3)


def test_stack_auto_padding_nonuniform_dims():
    # the canonical shape: raw 11-dim input -> hidden 128 -> output 64;
    # auto-padding must keep parity with the unpadded reference chain
    _, g = _block_batch(node_dim=11)
    N = g.num_nodes
    x = jnp.asarray(g.node_feat)[:, :11]
    key = jax.random.PRNGKey(2)
    layers = [
        _layer(jax.random.fold_in(key, 0), 11, 11, 128),
        _layer(jax.random.fold_in(key, 1), 128, 128, 128),
        _layer(jax.random.fold_in(key, 2), 128, 128, 64),
    ]
    deltas = (2.0, 2.0, 2.0)
    skips = (False, True, False)
    out = pna_block_stack_auto(
        x, g.nbr_nodes, g.in_degree, layers, deltas, skips, act="relu",
        out_dim=64, block_size=128, tile_rows=128, interpret=True,
        gather_mode="split2", mm="f32",
    )
    ref = pna_stack_reference(
        x, g.nbr_nodes, g.in_degree, layers, deltas, skips, act="relu"
    )
    assert out.shape == (N, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=2e-3)


def test_stack_auto_grad_matches_reference():
    _, g = _block_batch(node_dim=8, num_graphs=12)
    N, F = g.num_nodes, 128
    x = jax.random.normal(jax.random.PRNGKey(4), (N, F))
    layers = [_layer(jax.random.PRNGKey(21), F, F, F)]

    def f_kernel(xx):
        return jnp.sum(pna_block_stack_auto(
            xx, g.nbr_nodes, g.in_degree, layers, (2.0,), (False,),
            act="relu", out_dim=F, block_size=128, tile_rows=128,
            interpret=True, gather_mode="split2", mm="f32",
        ) ** 2)

    def f_ref(xx):
        return jnp.sum(pna_stack_reference(
            xx, g.nbr_nodes, g.in_degree, layers, (2.0,), (False,),
            act="relu",
        ) ** 2)

    gk = jax.grad(f_kernel)(x)
    gr = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               atol=2e-3, rtol=3e-3)


def test_model_level_stack_dispatch_parity():
    """GNNModel forward with the stack kernel active (always-mode +
    inference scope on a block batch) == the per-layer XLA path."""
    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.ops import dispatch

    graphs, g = _block_batch(node_dim=11, num_graphs=16, seed=5)
    model = gnnb.GNNModel(
        graph_input_feature_dim=11,
        gnn_hidden_dim=128,
        gnn_num_layers=3,
        gnn_output_dim=64,
        gnn_conv="pna",
        gnn_skip_connection=True,
        pooling_aggrs=("add", "mean", "max"),
        mlp_hidden_dim=32,
        mlp_hidden_layers=1,
        conv_kwargs={"delta": 2.0},
    )
    params = model.init(jax.random.PRNGKey(0), g)

    from gnnbuilder_tpu.nn import model as model_mod
    from gnnbuilder_tpu.ops.pallas import pna_block

    calls = {"n": 0}
    orig = pna_block.pna_block_stack_auto

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    dispatch.set_fused_mode("never")
    try:
        ref = model.apply(params, g)
    finally:
        dispatch.set_fused_mode("auto")

    pna_block.pna_block_stack_auto = counting
    try:
        dispatch.set_fused_mode("always")
        with dispatch.inference_mode():
            out = model.apply(params, g)
    finally:
        pna_block.pna_block_stack_auto = orig
        dispatch.set_fused_mode("auto")
    assert calls["n"] == 1, "stack kernel was not dispatched"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=2e-3)


def test_stack_not_dispatched_outside_inference():
    """Training traces (no inference scope) must keep the per-layer path:
    the stack kernel's backward is an XLA recompute."""
    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.ops import dispatch

    _, g = _block_batch(node_dim=11, num_graphs=8, seed=6)
    model = gnnb.GNNModel(
        graph_input_feature_dim=11, gnn_hidden_dim=128,
        gnn_num_layers=2, gnn_output_dim=64, gnn_conv="pna",
        conv_kwargs={"delta": 2.0},
    )
    params = model.init(jax.random.PRNGKey(0), g)
    assert dispatch.pna_stack_cfg(g) is None  # auto mode, no scope, CPU


def test_stack_kernel_sched_v2_matches_v1():
    """The round-5 v2/v3 schedules (hoisted/HBM-prebuilt one-hot, fused split2
    hi/lo dot, bf16 agg scratch) is numerically equivalent to v1 at the
    kernel's contract tolerance, for both gather modes and multi-block
    tiles."""
    graphs = FakeDataset(num_graphs=30, avg_num_nodes=12, node_dim=8,
                         edge_dim=4, seed=4)
    g = build_graph_batch(graphs, block_size=128, node_multiple=256,
                          edge_multiple=8)
    assert g.num_nodes % 256 == 0
    N, F = g.num_nodes, 128
    x = jax.random.normal(jax.random.PRNGKey(2), (N, F))
    L = 2
    layers = [_layer(jax.random.PRNGKey(20 + i), F, F, F)
              for i in range(L)]
    stacked = _stack_params(tuple(layers), F)
    for gm, mm, tol in [("split2", "f32", 2e-6), ("bf16", "bf16", 5e-3)]:
        kw = dict(
            deltas=(2.0,) * L, skips=(False, True), act="relu",
            block_size=128, tile_rows=256, interpret=True,
            gather_mode=gm, mm=mm,
        )
        o1 = fused_pna_block_stack(
            x, g.nbr_nodes, g.in_degree, *stacked, sched="v1", **kw
        )
        o2 = fused_pna_block_stack(
            x, g.nbr_nodes, g.in_degree, *stacked, sched="v2", **kw
        )
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                                   atol=tol, rtol=tol)
        for sc in ("v3", "v4"):
            o3 = fused_pna_block_stack(
                x, g.nbr_nodes, g.in_degree, *stacked, sched=sc, **kw
            )
            np.testing.assert_allclose(np.asarray(o3), np.asarray(o1),
                                       atol=tol, rtol=tol)
        if gm == "split2":  # bf16 gather is lossy vs the f32 reference
            ref = pna_stack_reference(
                x, g.nbr_nodes, g.in_degree, layers, (2.0,) * L,
                (False, True), act="relu",
            )
            np.testing.assert_allclose(np.asarray(o2), np.asarray(ref),
                                       atol=1e-3, rtol=2e-3)


def test_pna_stack_int8_matches_xla_int8():
    """int8 serving through the PNA stack kernel (round-5 quant
    epilogues on all five Linear dot families) vs the XLA int8 policy
    path.  The weight-scale GROUPING differs slightly (the XLA path
    quantizes pre_nn [2F,F] / post_nn [13F,F] jointly; the kernel
    quantizes the split operands per piece), so the bar is the
    established int8-vs-f32 accumulation tolerance rather than
    bit-parity."""
    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.data.datasets import FakeDataset
    from gnnbuilder_tpu.ops import dispatch

    graphs = FakeDataset(num_graphs=24, avg_num_nodes=12, node_dim=8,
                         seed=6)
    g = build_graph_batch(graphs, block_size=128, node_multiple=128,
                          edge_multiple=8)
    model = gnnb.GNNModel(
        graph_input_feature_dim=8, gnn_hidden_dim=128, gnn_num_layers=3,
        gnn_output_dim=128, gnn_conv="pna",
        conv_kwargs={"delta": 2.0}, pooling_aggrs=("mean",),
        mlp_out_dim=1,
    )
    prog = gnnb.Program(
        model, max_nodes=g.num_nodes, max_edges=g.num_edges,
        max_graphs=g.num_graphs, block_size=128,
    )
    prog.init_params(g)

    p8_ref = gnnb.Program(
        model, max_nodes=g.num_nodes, max_edges=g.num_edges,
        max_graphs=g.num_graphs, precision="int8", block_size=128,
    )
    p8_ref.set_params(prog.params)
    dispatch.set_fused_mode("never")
    try:
        ref = np.asarray(p8_ref.forward(g))
    finally:
        dispatch.set_fused_mode("auto")

    from gnnbuilder_tpu.ops.pallas import pna_block as _pb

    calls = {"n": 0}
    orig = _pb.pna_block_stack_auto

    def counting(*a, **k):
        calls["n"] += 1
        assert k.get("quant"), "int8 policy did not reach the stack"
        return orig(*a, **k)

    p8 = gnnb.Program(
        model, max_nodes=g.num_nodes, max_edges=g.num_edges,
        max_graphs=g.num_graphs, precision="int8", block_size=128,
    )
    p8.set_params(prog.params)
    _pb.pna_block_stack_auto = counting
    dispatch.set_fused_mode("always")
    try:
        got = np.asarray(p8.forward(g))
    finally:
        dispatch.set_fused_mode("auto")
        _pb.pna_block_stack_auto = orig
    assert calls["n"] >= 1

    mask = np.asarray(g.graph_mask)
    denom = np.abs(ref[mask]).max() + 1e-6
    rel = np.abs(got[mask] - ref[mask]).max() / denom
    assert rel < 0.05, rel
