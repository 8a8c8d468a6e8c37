"""Per-conv golden parity: JAX layer vs pure-torch PyG-semantics reference on
the seeded ER fixture graph — the analog of the reference's per-conv kernel
tests vs PyG goldens (test.cpp:1056-1928, fixtures gen_test_data.py:75-98)."""

import numpy as np
import pytest
import torch

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.core.graph import build_graph_batch
from gnnbuilder_tpu.data.datasets import er_graph
from gnnbuilder_tpu.verify import port
from gnnbuilder_tpu.verify import torch_ref as tr

ATOL = 2e-4  # f32; reference parity bar was 1e-3 (test.cpp:1146)

F_IN, F_OUT = 8, 12


def _setup(conv_type, seed=0, ell=True, **kw):
    g = er_graph(n=100, p=0.05, node_dim=F_IN, edge_dim=4, seed=seed)
    # ell_width=None -> auto ELL fast path; 0 -> flat sorted-segment path
    batch = build_graph_batch([g], ell_width=None if ell else 0)
    assert (batch.nbr_nodes is not None) == ell
    n_real = g.num_nodes

    torch.manual_seed(seed)
    f_out = kw.pop("f_out", F_OUT)
    tcls = tr.TORCH_CONVS[conv_type]
    tconv = tcls(F_IN, f_out, **kw)

    tx = torch.tensor(g.x)
    tei = torch.tensor(g.edge_index)
    tea = torch.tensor(g.edge_attr)
    with torch.no_grad():
        golden = tconv(tx, tei, tea).numpy()
    return g, batch, n_real, tconv, golden


def _run_jax(conv, batch, params):
    out = conv.apply(params, batch, batch.node_feat)
    return np.asarray(out)


@pytest.mark.parametrize("ell", [True, False], ids=["ell", "flat"])
@pytest.mark.parametrize(
    "conv_type,kw",
    [
        ("gcn", {}),
        ("gin", {"eps": 0.1}),
        ("gine", {"edge_dim": 4, "eps": 0.05}),
        ("sage", {}),
        ("pna", {"delta": 2.5}),
        ("lg", {"f_out": F_IN}),
        ("simple", {"f_out": F_IN, "aggregation": "sum"}),
        ("simple", {"f_out": F_IN, "aggregation": "mean"}),
        ("simple", {"f_out": F_IN, "aggregation": "max"}),
        ("simple", {"f_out": F_IN, "aggregation": "min"}),
        ("edge", {"aggregation": "max"}),
        ("edge", {"aggregation": "mean"}),
        ("edge", {"aggregation": "sum"}),
    ],
)
def test_conv_parity(conv_type, kw, ell):
    kw = dict(kw)
    f_out = kw.get("f_out", F_OUT)
    tkw = dict(kw)
    jkw = dict(kw)
    jkw.pop("f_out", None)
    g, batch, n_real, tconv, golden = _setup(conv_type, ell=ell, **tkw)

    jcls = gnnb.SUPPORTED_GNN_CONVS[conv_type]
    conv = jcls(in_channels=F_IN, out_channels=f_out, **jkw)
    ported = port.port_conv(conv_type, tconv)
    params = {"params": ported} if ported else {"params": {}}
    out = _run_jax(conv, batch, params)

    np.testing.assert_allclose(out[:n_real], golden, atol=ATOL, rtol=1e-4)


@pytest.mark.parametrize("ell", [True, False], ids=["ell", "flat"])
@pytest.mark.parametrize("heads,concat", [(1, True), (4, True), (4, False)])
def test_gat_parity(heads, concat, ell):
    """GAT — the layer the reference only TODO'd (gnn_builder_lib.h:2343)."""
    g, batch, n_real, tconv, golden = _setup(
        "gat", heads=heads, concat=concat, ell=ell
    )
    conv = gnnb.GATConv(
        in_channels=F_IN, out_channels=F_OUT, heads=heads, concat=concat
    )
    params = {"params": port.port_conv("gat", tconv)}
    out = _run_jax(conv, batch, params)
    np.testing.assert_allclose(out[:n_real], golden, atol=ATOL, rtol=1e-4)


@pytest.mark.parametrize("ell", [True, False], ids=["ell", "flat"])
@pytest.mark.parametrize("heads", [1, 4])
def test_gat_edge_features_parity(heads, ell):
    """GAT with edge features in the attention logits (PyG GATConv
    edge_dim; the reference's unexported GATEdgeConv_GNNB wrapper,
    models.py:166), incl. the fill_value='mean' self-loop edge attrs."""
    g, batch, n_real, tconv, golden = _setup(
        "gat", heads=heads, edge_dim=4, ell=ell
    )
    conv = gnnb.GATConv(
        in_channels=F_IN, out_channels=F_OUT, heads=heads, edge_dim=4
    )
    params = {"params": port.port_conv("gat", tconv)}
    out = _run_jax(conv, batch, params)
    np.testing.assert_allclose(out[:n_real], golden, atol=ATOL, rtol=1e-4)


def test_gcn_parity_wide_then_narrow():
    """GCN picks transform-first vs aggregate-first by dims; both must match."""
    # f_out > f_in -> aggregate first branch
    g, batch, n_real, tconv, golden = _setup("gcn", f_out=32)
    conv = gnnb.GCNConv(in_channels=F_IN, out_channels=32)
    params = {"params": port.port_conv("gcn", tconv)}
    out = _run_jax(conv, batch, params)
    np.testing.assert_allclose(out[:n_real], golden, atol=ATOL, rtol=1e-4)
