"""Whole-model golden parity: full GNNModel forward (convs + skip + pooling +
MLP head + output activation) vs the torch reference, batched over several
graphs — the analog of the reference's generated end-to-end testbench MAE
check (model_tb.cpp.jinja:242-258, code_gen.py:384-395)."""

import numpy as np
import pytest
import torch

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.data.datasets import FakeDataset
from gnnbuilder_tpu.verify import port
from gnnbuilder_tpu.verify import torch_ref as tr

ATOL = 5e-4


def _golden_forward(tmodel, graphs):
    outs = []
    for g in graphs:
        tx = torch.tensor(g.x)
        tei = torch.tensor(g.edge_index)
        tea = torch.tensor(g.edge_attr) if g.edge_attr is not None else None
        with torch.no_grad():
            outs.append(
                tmodel(tx, tei, num_graphs=1, edge_attr=tea).numpy()[0]
            )
    return np.stack(outs)


@pytest.mark.parametrize(
    "conv_type,skip,pool,out_act",
    [
        ("gcn", False, ("mean",), None),
        ("gcn", True, ("add", "mean", "max"), None),
        ("gin", True, ("add",), None),
        ("sage", False, ("add", "mean", "max"), None),
        ("pna", True, ("add", "mean", "max"), None),
        ("gat", False, ("mean",), None),
        ("gine", False, ("add",), None),
        ("edge", True, ("add", "max"), None),
        ("gcn", False, ("mean",), "softmax"),
    ],
)
def test_model_parity(conv_type, skip, pool, out_act):
    torch.manual_seed(42)
    F_IN, HID, OUT, L = 8, 16, 12, 4
    conv_kwargs = {"delta": 2.0} if conv_type == "pna" else {}
    mlp_out = 3 if out_act else 1

    tmodel = tr.TorchGNNModel(
        graph_input_feature_dim=F_IN,
        gnn_hidden_dim=HID,
        gnn_num_layers=L,
        gnn_output_dim=OUT,
        gnn_conv=conv_type,
        gnn_activation="relu",
        gnn_skip_connection=skip,
        graph_input_edge_dim=4,
        pooling_aggrs=pool,
        mlp_hidden_dim=16,
        mlp_hidden_layers=2,
        mlp_out_dim=mlp_out,
        output_activation=out_act,
        conv_kwargs=conv_kwargs,
    )

    jmodel = gnnb.GNNModel(
        graph_input_feature_dim=F_IN,
        gnn_hidden_dim=HID,
        gnn_num_layers=L,
        gnn_output_dim=OUT,
        gnn_conv=conv_type,
        gnn_activation="relu",
        gnn_skip_connection=skip,
        graph_input_edge_dim=4,
        pooling_aggrs=pool,
        mlp_hidden_dim=16,
        mlp_hidden_layers=2,
        mlp_out_dim=mlp_out,
        output_activation=out_act,
        conv_kwargs=conv_kwargs,
    )

    graphs = FakeDataset(num_graphs=6, avg_num_nodes=14, node_dim=F_IN,
                         edge_dim=4, seed=7)
    batch = gnnb.build_graph_batch(graphs)
    params = port.port_model(conv_type, tmodel)

    out = np.asarray(jmodel.apply(params, batch))
    golden = _golden_forward(tmodel, graphs)

    np.testing.assert_allclose(out[:6], golden, atol=ATOL, rtol=1e-4)


def test_model_gelu_activation_parity():
    torch.manual_seed(0)
    tmodel = tr.TorchGNNModel(8, 16, 3, 8, "gcn", gnn_activation="gelu")
    jmodel = gnnb.GNNModel(
        graph_input_feature_dim=8,
        gnn_hidden_dim=16,
        gnn_num_layers=3,
        gnn_output_dim=8,
        gnn_conv="gcn",
        gnn_activation="gelu",
    )
    graphs = FakeDataset(num_graphs=3, avg_num_nodes=10, node_dim=8, seed=9)
    batch = gnnb.build_graph_batch(graphs)
    params = port.port_model("gcn", tmodel)
    out = np.asarray(jmodel.apply(params, batch))
    golden = _golden_forward(tmodel, graphs)
    np.testing.assert_allclose(out[:3], golden, atol=ATOL, rtol=1e-4)
