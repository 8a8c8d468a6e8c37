"""Fused GAT layer kernel vs the XLA reference (interpret mode).

The reference TODO'd GAT entirely (gnn_builder_lib.h:2343); here it is
both implemented (nn/conv.py::GATConv) and fused
(ops/pallas/gat_layer.py).  These tests pin the fused kernel against the
ELL XLA path: forward parity across head counts / self-loop modes /
skip+activation epilogues, gradient flow through the custom VJP, and the
dispatch gate at the conv level.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnnbuilder_tpu.core.graph import build_graph_batch
from gnnbuilder_tpu.ops.pallas.gat_layer import (
    fused_gat_layer_vjp,
    gat_layer_reference,
)


class _G:
    def __init__(self, n, e, rng, F=8):
        self.x = rng.standard_normal((n, F)).astype(np.float32)
        self.edge_index = rng.integers(0, n, size=(2, e))
        self.edge_attr = None


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(13)
    gs = [_G(int(rng.integers(3, 12)), int(rng.integers(4, 20)), rng)
          for _ in range(9)]
    b = build_graph_batch(gs)
    deg = np.asarray(b.in_degree)[np.asarray(b.node_mask)]
    assert (deg == 0).any()  # empty receivers exercised
    return b


def _params(rng, F, H, C):
    r = lambda *s, sc=0.3: jnp.asarray(
        rng.standard_normal(s).astype(np.float32) * sc
    )
    return dict(
        w=r(F, H * C), att_src=r(1, H, C), att_dst=r(1, H, C),
        bias=r(H * C, sc=0.1),
    )


@pytest.mark.parametrize("heads,C", [(1, 16), (4, 8), (2, 12)])
@pytest.mark.parametrize("self_loops", [True, False])
def test_forward_parity(batch, heads, C, self_loops):
    b = batch
    rng = np.random.default_rng(heads)
    p = _params(rng, b.node_feat.shape[1], heads, C)
    got = fused_gat_layer_vjp(
        b.node_feat, b.nbr_nodes, b.in_degree, **p, heads=heads,
        self_loops=self_loops, tile_rows=b.num_nodes, window_slack=0,
        interpret=True, act="relu",
    )
    ref = gat_layer_reference(
        b.node_feat, b.nbr_nodes, b.in_degree, p["w"], p["att_src"],
        p["att_dst"], p["bias"], heads, self_loops=self_loops, act="relu",
    )
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_skip_and_grads(batch):
    b = batch
    H, C = 2, 16
    rng = np.random.default_rng(0)
    p = _params(rng, b.node_feat.shape[1], H, C)
    skip = jnp.asarray(
        rng.standard_normal((b.num_nodes, H * C)).astype(np.float32)
    )

    def loss_fused(pp):
        return (fused_gat_layer_vjp(
            b.node_feat, b.nbr_nodes, b.in_degree, **pp, heads=H,
            skip=skip, act="tanh", tile_rows=b.num_nodes, window_slack=0,
            interpret=True) ** 2).sum()

    def loss_ref(pp):
        return (gat_layer_reference(
            b.node_feat, b.nbr_nodes, b.in_degree, pp["w"], pp["att_src"],
            pp["att_dst"], pp["bias"], H, skip=skip, act="tanh") ** 2).sum()

    gf = jax.grad(loss_fused)(p)
    gr = jax.grad(loss_ref)(p)
    for k in p:
        rel = float(jnp.abs(gf[k] - gr[k]).max()
                    / (jnp.abs(gr[k]).max() + 1e-9))
        assert rel < 1e-4, (k, rel)


def test_conv_dispatch_parity(batch):
    """GATConv routes through the fused kernel under 'always' dispatch
    (aligned head width) and matches the XLA path."""
    from gnnbuilder_tpu.nn.conv import GATConv
    from gnnbuilder_tpu.ops import dispatch

    b = batch
    conv = GATConv(in_channels=b.node_feat.shape[1], out_channels=128,
                   heads=1)
    params = conv.init(jax.random.PRNGKey(0), b, b.node_feat)
    mode = dispatch.get_fused_mode()
    try:
        dispatch.set_fused_mode("never")
        ref = conv.apply(params, b, b.node_feat)
        dispatch.set_fused_mode("always")
        got = conv.apply(params, b, b.node_feat)
    finally:
        dispatch.set_fused_mode(mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_head_width_auto_padding(batch):
    """Unaligned per-head widths pad to MXU lanes per head block (zero att
    and value lanes are inert through the softmax); forward + grads match
    the XLA reference, and the conv-level gate dispatches at scale."""
    from gnnbuilder_tpu.nn.conv import GATConv
    from gnnbuilder_tpu.ops import dispatch
    from gnnbuilder_tpu.ops.pallas.gat_layer import (
        fused_gat_layer_vjp,
        gat_layer_reference,
    )

    b = batch
    rng = np.random.default_rng(9)
    N, F = b.node_feat.shape
    H, C = 4, 16  # HC = 64 -> pads to C_p = 32 per head
    r = lambda *s, sc=0.3: jnp.asarray(
        rng.standard_normal(s).astype(np.float32) * sc
    )
    w, att_s, att_d = r(F, H * C), r(1, H, C), r(1, H, C)
    bias, skip = r(H * C, sc=0.1), r(N, H * C, sc=1.0)
    kw = dict(tile_rows=N, window_slack=0, interpret=True, mm="f32")

    ref = gat_layer_reference(b.node_feat, b.nbr_nodes, b.in_degree,
                              w, att_s, att_d, bias, H, skip=skip,
                              act="relu")
    got = fused_gat_layer_vjp(b.node_feat, b.nbr_nodes, b.in_degree,
                              w, att_s, att_d, bias, H, skip=skip,
                              act="relu", **kw)
    assert got.shape == (N, H * C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)

    def lf(xx, ww, asr):
        return (fused_gat_layer_vjp(xx, b.nbr_nodes, b.in_degree, ww, asr,
                                    att_d, bias, H, **kw) ** 2).sum()

    def lr(xx, ww, asr):
        return (gat_layer_reference(xx, b.nbr_nodes, b.in_degree, ww, asr,
                                    att_d, bias, H) ** 2).sum()

    gf = jax.grad(lf, argnums=(0, 1, 2))(b.node_feat, w, att_s)
    gr = jax.grad(lr, argnums=(0, 1, 2))(b.node_feat, w, att_s)
    for a, c in zip(gf, gr):
        rel = float(jnp.abs(a - c).max() / (jnp.abs(c).max() + 1e-9))
        assert rel < 1e-3

    # conv-level: unaligned head width dispatches under 'always' (the
    # size gate passes: N >= 512) and matches the XLA path
    conv = GATConv(in_channels=F, out_channels=16, heads=4)
    params = conv.init(jax.random.PRNGKey(0), b, b.node_feat)
    mode = dispatch.get_fused_mode()
    try:
        dispatch.set_fused_mode("never")
        cref = conv.apply(params, b, b.node_feat)
        dispatch.set_fused_mode("always")
        cgot = conv.apply(params, b, b.node_feat)
    finally:
        dispatch.set_fused_mode(mode)
    np.testing.assert_allclose(np.asarray(cgot), np.asarray(cref),
                               atol=2e-4, rtol=1e-3)


def test_fused_gat_edge_dim_parity():
    """Round-4: edge-featured attention through the fused kernel (the
    edge_dim fusion gate removed) — GATConv with edge_dim under
    always-mode matches the mode=never XLA path, values and gradients."""
    import jax

    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.core.graph import build_graph_batch
    from gnnbuilder_tpu.data.datasets import FakeDataset
    from gnnbuilder_tpu.nn.conv import GATConv
    from gnnbuilder_tpu.ops import dispatch

    graphs = FakeDataset(num_graphs=20, avg_num_nodes=12, node_dim=128,
                         edge_dim=6, seed=21)
    g = build_graph_batch(graphs, node_multiple=128, edge_multiple=8)
    conv = GATConv(in_channels=128, out_channels=32, heads=4, edge_dim=6)
    params = conv.init(jax.random.PRNGKey(0), g, g.node_feat)

    dispatch.set_fused_mode("never")
    try:
        ref = conv.apply(params, g, g.node_feat)
    finally:
        dispatch.set_fused_mode("auto")

    from gnnbuilder_tpu.ops.pallas import gat_layer

    calls = {"n": 0}
    orig = gat_layer.fused_gat_layer_vjp

    def counting(*a, **k):
        calls["n"] += 1
        assert k.get("edge_logits") is not None
        return orig(*a, **k)

    gat_layer.fused_gat_layer_vjp = counting
    try:
        dispatch.set_fused_mode("always")
        out = conv.apply(params, g, g.node_feat)
    finally:
        gat_layer.fused_gat_layer_vjp = orig
        dispatch.set_fused_mode("auto")
    assert calls["n"] == 1, "fused edge path was not taken"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)

    # gradients reach lin_edge / att_edge through the edge-logit table
    def loss(fused):
        def f(p):
            if fused:
                dispatch.set_fused_mode("always")
            try:
                return (conv.apply(p, g, g.node_feat) ** 2).sum()
            finally:
                dispatch.set_fused_mode("auto")
        return f

    import jax as _jax

    gk = _jax.grad(loss(True))(params)
    dispatch.set_fused_mode("never")
    try:
        gr = _jax.grad(loss(False))(params)
    finally:
        dispatch.set_fused_mode("auto")
    for a, r in zip(_jax.tree.leaves(gk), _jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-3, rtol=2e-3)
    ge = gk["params"]["att_edge"]
    assert float(np.abs(np.asarray(ge)).max()) > 0.0
