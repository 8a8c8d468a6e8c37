"""Triple-implementation agreement for GAT and EdgeConv.

These two convs have no reference golden fixture (the reference never
implemented them: gnn_builder_lib.h:2343 TODO, :2636-2703 skeleton), so
parity previously bottomed out in this repo's own torch_ref.  The
from-the-paper numpy oracle (verify/numpy_oracle.py — naive edge loops,
no scatter/segment machinery) closes the loop: oracle, torch_ref, and
the JAX layer must agree pairwise at the reference's 1e-3 bar
(test.cpp:1146) on seeded ER graphs, including an isolated-node graph.
Pattern: the reference's networkx cross-check, gen_test_data.py:129-173.
"""

import numpy as np
import pytest
import torch

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.core.graph import build_graph_batch
from gnnbuilder_tpu.data.datasets import er_graph
from gnnbuilder_tpu.verify import port
from gnnbuilder_tpu.verify import torch_ref as tr
from gnnbuilder_tpu.verify.numpy_oracle import (
    edge_conv_oracle,
    gat_conv_oracle,
)

F_IN, F_OUT = 8, 12
ATOL = 1e-3


def _graph(seed, sparse=False):
    # sparse=True leaves isolated nodes (empty neighborhoods)
    return er_graph(n=60, p=0.01 if sparse else 0.06, node_dim=F_IN,
                    edge_dim=4, seed=seed)


def _np(p):
    return p.detach().numpy().astype(np.float32)


@pytest.mark.parametrize("sparse", [False, True], ids=["dense", "sparse"])
@pytest.mark.parametrize("heads,concat,edge_dim", [
    (1, True, None), (4, True, None), (4, False, None), (2, True, 4),
])
def test_gat_three_way(heads, concat, edge_dim, sparse):
    g = _graph(seed=3, sparse=sparse)
    torch.manual_seed(7)
    tconv = tr.TorchGATConv(F_IN, F_OUT, heads=heads, concat=concat,
                            edge_dim=edge_dim)
    with torch.no_grad():
        golden = tconv(torch.tensor(g.x), torch.tensor(g.edge_index),
                       torch.tensor(g.edge_attr)).numpy()

    # oracle from the same weights, paper orientation ([in, out])
    kw = {}
    if edge_dim is not None:
        kw = dict(edge_attr=g.edge_attr,
                  W_edge=_np(tconv.lin_edge.weight).T,
                  att_edge=_np(tconv.att_edge)[0])
    oracle = gat_conv_oracle(
        g.x, g.edge_index,
        W=_np(tconv.lin.weight).T,
        att_src=_np(tconv.att_src)[0],
        att_dst=_np(tconv.att_dst)[0],
        bias=_np(tconv.bias),
        heads=heads, out_channels=F_OUT, concat=concat, **kw,
    )
    np.testing.assert_allclose(oracle, golden, atol=ATOL, rtol=1e-4)

    # JAX layer from ported weights: all three implementations agree
    batch = build_graph_batch([g])
    conv = gnnb.GATConv(in_channels=F_IN, out_channels=F_OUT, heads=heads,
                        concat=concat, edge_dim=edge_dim)
    params = {"params": port.port_conv("gat", tconv)}
    out = np.asarray(conv.apply(params, batch, batch.node_feat))
    np.testing.assert_allclose(out[:g.num_nodes], oracle, atol=ATOL,
                               rtol=1e-4)


@pytest.mark.parametrize("sparse", [False, True], ids=["dense", "sparse"])
@pytest.mark.parametrize("aggr", ["max", "mean", "sum"])
def test_edge_conv_three_way(aggr, sparse):
    g = _graph(seed=11, sparse=sparse)
    torch.manual_seed(13)
    tconv = tr.TorchEdgeConv(F_IN, F_OUT, aggregation=aggr)
    with torch.no_grad():
        golden = tconv(torch.tensor(g.x), torch.tensor(g.edge_index)).numpy()

    oracle = edge_conv_oracle(
        g.x, g.edge_index,
        W0=_np(tconv.lin0.weight).T, b0=_np(tconv.lin0.bias),
        W1=_np(tconv.lin1.weight).T, b1=_np(tconv.lin1.bias),
        aggregation=aggr,
    )
    np.testing.assert_allclose(oracle, golden, atol=ATOL, rtol=1e-4)

    batch = build_graph_batch([g])
    conv = gnnb.EdgeConv(in_channels=F_IN, out_channels=F_OUT,
                         aggregation=aggr)
    params = {"params": port.port_conv("edge", tconv)}
    out = np.asarray(conv.apply(params, batch, batch.node_feat))
    np.testing.assert_allclose(out[:g.num_nodes], oracle, atol=ATOL,
                               rtol=1e-4)
