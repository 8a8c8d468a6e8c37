"""Whole-stack block kernel for the mp conv family (gcn/gin/sage).

Round 4b: ops/pallas/mp_block.py runs the entire conv stack in one
kernel on block-packed batches (hidden state VMEM-resident), the same
structure the PNA stack proved.  These tests pin

* kernel-vs-XLA-reference parity per conv (interpret mode, same
  contract as test_pna_block_stack: atol 1e-3 over a 3-layer chain),
* the WHOLE-MODEL path: _fused_mp_stack output == the per-layer conv
  loop (dispatch staged gate forced on / off),
* gradient flow through the custom VJP (XLA-recompute backward),
* nonuniform dims (9-dim input, distinct hidden/output widths).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.core.graph import build_graph_batch
from gnnbuilder_tpu.data.datasets import FakeDataset
from gnnbuilder_tpu.ops import dispatch
from gnnbuilder_tpu.ops.pallas.mp_block import (
    mp_block_stack_auto,
    mp_stack_reference,
)


def _batch(node_dim=8, seed=0):
    graphs = FakeDataset(num_graphs=24, avg_num_nodes=12, node_dim=node_dim,
                         seed=seed)
    return graphs, build_graph_batch(
        graphs, block_size=128, node_multiple=128, edge_multiple=8
    )


def _layers(conv, key, f_in, f, f_out, L):
    out = []
    for i in range(L):
        a = f_in if i == 0 else f
        b = f_out if i == L - 1 else f
        ks = jax.random.split(jax.random.fold_in(key, i), 4)
        s = 0.4 / np.sqrt(a + 1)
        if conv == "gcn":
            out.append((jax.random.normal(ks[0], (a, b)) * s,
                        jax.random.normal(ks[1], (b,)) * 0.1, None, None))
        elif conv == "gin":
            out.append((jax.random.normal(ks[0], (a, b)) * s,
                        jax.random.normal(ks[1], (b,)) * 0.1,
                        jax.random.normal(ks[2], (b, b)) * s,
                        jax.random.normal(ks[3], (b,)) * 0.1))
        else:  # sage
            out.append((jax.random.normal(ks[0], (a, b)) * s,
                        jax.random.normal(ks[1], (b,)) * 0.1,
                        jax.random.normal(ks[2], (a, b)) * s, None))
    return out


@pytest.mark.parametrize("conv", ["gcn", "gin", "sage"])
def test_stack_matches_reference(conv):
    _, g = _batch()
    N, F = g.num_nodes, 128
    x = jax.random.normal(jax.random.PRNGKey(3), (N, F))
    L = 3
    layers = _layers(conv, jax.random.PRNGKey(7), F, F, F, L)
    epss = (0.1, 0.2, 0.3)
    skips = (False, True, False)
    out = mp_block_stack_auto(
        x, g.block_adj, g.in_degree, conv, layers, epss=epss, skips=skips,
        act="relu", block_size=128, tile_rows=128, interpret=True,
        gather_mode="split2", mm="f32",
    )
    pad = [(w if w is not None else None,
            b if b is not None else None, w1, b1)
           for (w, b, w1, b1) in layers]
    ref_layers = [(w, b if b is not None else jnp.zeros(w.shape[1]),
                   w1 if w1 is not None else jnp.zeros((w.shape[1],) * 2),
                   b1 if b1 is not None else jnp.zeros(w.shape[1]))
                  for (w, b, w1, b1) in pad]
    ref = mp_stack_reference(x, g.block_adj, g.in_degree, conv, ref_layers,
                             epss, skips, act="relu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=2e-3)


@pytest.mark.parametrize("conv", ["gcn", "gin", "sage"])
def test_model_stack_matches_per_layer_loop(conv):
    """The whole-model fused path (forced on) == the per-layer conv loop
    (forced off) on the same params/batch — ghost rows included."""
    graphs, g = _batch(node_dim=9)
    model = gnnb.GNNModel(
        graph_input_feature_dim=9, gnn_hidden_dim=128, gnn_num_layers=3,
        gnn_output_dim=128, gnn_conv=conv, gnn_skip_connection=True,
        pooling_aggrs=("add", "mean", "max"), mlp_hidden_dim=16,
        mlp_hidden_layers=1, mlp_out_dim=1,
    )
    params = model.init(jax.random.PRNGKey(0), g)

    mode0 = dispatch.get_fused_mode()
    r4b0 = dispatch._STAGED_R4B
    try:
        dispatch.set_fused_mode("never")
        ref = np.asarray(model.apply(params, g))
        dispatch.set_fused_mode("always")  # bypasses staged gates, interpret
        dispatch._STAGED_R4B = True
        with dispatch.inference_mode():
            cfg = dispatch.mp_stack_cfg(g, conv, 3)
            assert cfg is not None, "stack gate did not open"
            out = np.asarray(model.apply(params, g))
    finally:
        dispatch.set_fused_mode(mode0)
        dispatch._STAGED_R4B = r4b0
    real = np.asarray(g.graph_mask, bool)
    np.testing.assert_allclose(out[real], ref[real], atol=2e-3, rtol=4e-3)


def test_stack_grad_flows():
    _, g = _batch()
    N, F = g.num_nodes, 128
    x = jax.random.normal(jax.random.PRNGKey(1), (N, F))
    layers = _layers("gin", jax.random.PRNGKey(2), F, F, F, 2)

    def loss(xx):
        return jnp.sum(mp_block_stack_auto(
            xx, g.block_adj, g.in_degree, "gin", layers,
            epss=(0.0, 0.0), skips=(False, False), act="relu",
            block_size=128, tile_rows=128, interpret=True,
        ) ** 2)

    dx = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(dx)).all() and float(
        np.abs(np.asarray(dx)).max()) > 0


def test_stack_nonuniform_dims():
    _, g = _batch(node_dim=8)
    N = g.num_nodes
    x = jax.random.normal(jax.random.PRNGKey(4), (N, 8))
    layers = _layers("sage", jax.random.PRNGKey(5), 8, 48, 24, 3)
    out = mp_block_stack_auto(
        x, g.block_adj, g.in_degree, "sage", layers,
        epss=(0,) * 3, skips=(False, True, False), act="gelu",
        block_size=128, tile_rows=128, interpret=True,
    )
    assert out.shape == (N, 24)
    ref_layers = [(w, b, w1, jnp.zeros(w.shape[1]))
                  for (w, b, w1, _b) in layers]
    xp = jnp.pad(x, ((0, 0), (0, 120)))
    pl_ = []
    F_p = 128
    for (w, b, w1, b1) in ref_layers:
        pw = jnp.zeros((F_p, F_p)).at[:w.shape[0], :w.shape[1]].set(w)
        pb = jnp.zeros((F_p,)).at[:b.shape[0]].set(b)
        pw1 = jnp.zeros((F_p, F_p)).at[:w1.shape[0], :w1.shape[1]].set(w1)
        pb1 = jnp.zeros((F_p,))
        pl_.append((pw, pb, pw1, pb1))
    ref = mp_stack_reference(xp, g.block_adj, g.in_degree, "sage", pl_,
                             (0,) * 3, (False, True, False), act="gelu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref)[:, :24],
                               atol=1e-3, rtol=2e-3)


@pytest.mark.parametrize("conv", ["gcn", "sage", "gin"])
def test_mp_stack_int8_matches_xla_int8(conv):
    """int8 serving through the stack kernel (round-5 quant epilogue) ==
    the XLA int8 policy path at the established tol 0.02 — restores the
    "every family fused under int8 serving" claim for the BEST kernels
    (VERDICT r4 weak #6)."""
    graphs, g = _batch(node_dim=8, seed=5)
    model = gnnb.GNNModel(
        graph_input_feature_dim=8, gnn_hidden_dim=128, gnn_num_layers=3,
        gnn_output_dim=128, gnn_conv=conv, pooling_aggrs=("mean",),
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

    from gnnbuilder_tpu.ops.pallas import mp_block as _mb

    calls = {"n": 0}
    orig = _mb.mp_block_stack_auto

    def counting(*a, **k):
        calls["n"] += 1
        if conv in ("gcn", "sage"):
            assert k.get("quant"), "int8 policy did not reach the stack"
        return orig(*a, **k)

    p8 = gnnb.Program(
        model, max_nodes=g.num_nodes, max_edges=g.num_edges,
        max_graphs=g.num_graphs, precision="int8", block_size=128,
    )
    p8.set_params(prog.params)
    _mb.mp_block_stack_auto = counting
    dispatch.set_fused_mode("always")
    try:
        got = np.asarray(p8.forward(g))
    finally:
        dispatch.set_fused_mode("auto")
        _mb.mp_block_stack_auto = orig
    assert calls["n"] >= 1

    mask = np.asarray(g.graph_mask)
    denom = np.abs(ref[mask]).max() + 1e-6
    rel = np.abs(got[mask] - ref[mask]).max() / denom
    assert rel < 0.02, rel
