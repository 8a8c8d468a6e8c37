"""Real-data ingestion pinned end-to-end: the committed hand-encoded
real-molecule fixture (tests/fixtures/esol.npz, scripts/make_esol_fixture.py)
through load_dataset -> build_graph_batch -> GNNModel forward -> torch
parity.  Guards the exact flat .npz contract scripts/export_pyg_datasets.py
emits, so the synthetic-generator fallback is not the only exercised path
(reference benchmarks on real MoleculeNet downloads,
build_gnnbuilder_benchmarks.py:121-148)."""

import os

import numpy as np
import torch

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.data.datasets import load_dataset
from gnnbuilder_tpu.verify import port
from gnnbuilder_tpu.verify import torch_ref as tr

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_fixture_is_loaded_not_synthesized():
    graphs = load_dataset("esol", root=FIXTURES)
    # the fixture's real molecules, in order: ethanol, benzene, acetic
    # acid, phenol, pyridine, caffeine — sizes pin the loader to the file
    assert [g.num_nodes for g in graphs] == [3, 6, 4, 7, 6, 14]
    assert [g.num_edges for g in graphs] == [4, 12, 6, 14, 12, 30]
    # benzene: six aromatic ring carbons, undirected (both directions)
    benzene = graphs[1]
    assert np.all(benzene.x[:, 0] == 6)       # atomic number
    assert np.all(benzene.x[:, 7] == 1)       # aromatic flag
    assert np.all(benzene.edge_attr[:, 0] == 12)  # aromatic bond type
    # real measured log-solubility targets survive the round trip
    np.testing.assert_allclose(
        np.concatenate([g.y for g in graphs]),
        [-0.77, -1.64, 0.09, -0.04, 0.76, -0.88], atol=1e-6,
    )
    # every edge endpoint is graph-local
    for g in graphs:
        assert g.edge_index.min() >= 0
        assert g.edge_index.max() < g.num_nodes


def test_truncated_load_respects_n():
    graphs = load_dataset("esol", n=2, root=FIXTURES)
    assert len(graphs) == 2
    assert graphs[1].num_nodes == 6  # benzene


def test_fixture_forward_torch_parity():
    """load -> pack -> forward on the real molecules, vs the torch
    reference per graph — the ingestion analog of the reference's
    generated-testbench MAE check (model_tb.cpp.jinja:242-258)."""
    graphs = load_dataset("esol", root=FIXTURES)
    torch.manual_seed(3)
    kw = dict(
        graph_input_feature_dim=9,
        gnn_hidden_dim=16,
        gnn_num_layers=3,
        gnn_output_dim=12,
        gnn_conv="gine",
        gnn_skip_connection=True,
        graph_input_edge_dim=3,
        pooling_aggrs=("add", "mean", "max"),
        mlp_hidden_dim=16,
        mlp_hidden_layers=2,
        mlp_out_dim=1,
    )
    tmodel = tr.TorchGNNModel(**kw)
    jmodel = gnnb.GNNModel(**kw)
    batch = gnnb.build_graph_batch(graphs)
    params = port.port_model("gine", tmodel)
    out = np.asarray(jmodel.apply(params, batch))

    golden = []
    for g in graphs:
        with torch.no_grad():
            golden.append(
                tmodel(
                    torch.tensor(g.x), torch.tensor(g.edge_index),
                    num_graphs=1, edge_attr=torch.tensor(g.edge_attr),
                ).numpy()[0]
            )
    np.testing.assert_allclose(
        out[: len(graphs)], np.stack(golden), atol=5e-4, rtol=1e-4
    )


def test_all_molnet_fixtures_load_and_run():
    """Round-4 breadth (VERDICT r3 item 9): the remaining four datasets
    ship committed real-molecule fixtures (scripts/make_molnet_fixtures.py)
    exercising the same flat .npz ingestion contract, including QM9's
    explicit-hydrogen 11/4-dim encoding and an edgeless single-heavy-atom
    graph (methane in freesolv)."""
    from gnnbuilder_tpu.data.datasets import DATASET_SPECS

    expected = {
        "freesolv": dict(sizes=[2, 3, 1, 6, 7, 7], y0=-5.11),
        "lipo": dict(sizes=[6, 7, 7, 6, 14, 3], y0=2.13),
        "hiv": dict(sizes=[19, 6, 7, 6, 14, 3], y0=1.0),
        "qm9": dict(sizes=[5, 3, 4, 6, 6, 9], y0=0.0),
    }
    for name, exp in expected.items():
        graphs = load_dataset(name, root=FIXTURES)
        spec = DATASET_SPECS[name]
        assert [g.num_nodes for g in graphs] == exp["sizes"], name
        assert graphs[0].y[0] == np.float32(exp["y0"]), name
        for g in graphs:
            assert g.x.shape[1] == spec.node_dim, name
            if g.edge_attr is not None and g.num_edges:
                assert g.edge_attr.shape[1] == spec.edge_dim, name
            if g.num_edges:
                assert g.edge_index.min() >= 0
                assert g.edge_index.max() < g.num_nodes
        # pack + forward: finite predictions for every real graph
        model = gnnb.GNNModel(
            graph_input_feature_dim=spec.node_dim,
            gnn_hidden_dim=16,
            gnn_num_layers=2,
            gnn_output_dim=8,
            gnn_conv="gcn",
            pooling_aggrs=("add", "mean"),
            mlp_hidden_dim=8,
            mlp_hidden_layers=1,
            mlp_out_dim=1,
        )
        batch = gnnb.build_graph_batch(graphs)
        import jax

        params = model.init(jax.random.PRNGKey(0), batch)
        out = np.asarray(model.apply(params, batch))
        assert np.isfinite(out[: len(graphs)]).all(), name


def test_hiv_fixture_labels_are_binary():
    graphs = load_dataset("hiv", root=FIXTURES)
    ys = np.concatenate([g.y for g in graphs])
    assert set(np.unique(ys)) <= {0.0, 1.0}
    assert ys[0] == 1.0  # zidovudine (AZT) is an HIV active
