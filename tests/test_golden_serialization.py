"""Golden-data serializer: reference binary format round trip + MAE parity
(the generated-testbench flow of code_gen.py:227-305 / :339-395)."""

import os

import numpy as np

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.data.datasets import FakeDataset
from gnnbuilder_tpu.verify import golden


def _program():
    model = gnnb.GNNModel(
        graph_input_feature_dim=8,
        gnn_hidden_dim=16,
        gnn_num_layers=2,
        gnn_output_dim=8,
        gnn_conv="gcn",
        pooling_aggrs=("mean",),
        mlp_out_dim=3,
    )
    return gnnb.Program(model, max_nodes=64, max_edges=128, max_graphs=2)


def test_serialize_and_parity_roundtrip(tmp_path):
    graphs = FakeDataset(num_graphs=5, avg_num_nodes=10, node_dim=8, seed=1)
    prog = _program()
    prog.init_params(prog.batch([graphs[0]]))

    out_dir = str(tmp_path / "tb_data")
    info = prog.gen_testbench_data(graphs, out_dir)
    assert info["num_graphs"] == 5 and info["out_dim"] == 3

    # parameter binaries exist, raw float32
    pdir = os.path.join(out_dir, "model_parameters")
    bins = sorted(os.listdir(pdir))
    assert bins and all(b.endswith(".bin") for b in bins)
    first = np.fromfile(os.path.join(pdir, bins[0]), dtype=np.float32)
    assert first.size > 0

    # per-graph binaries live under graphs/ and decode to the original
    # inputs; coo is edge_index.T ([E,2] (from,to) pairs, code_gen.py:262)
    gdir = os.path.join(out_dir, "graphs")
    info0 = np.fromfile(
        os.path.join(gdir, "graph_0_info.bin"), dtype=np.int32
    )
    assert info0[0] == graphs[0].num_nodes
    assert info0[1] == graphs[0].num_edges
    coo = np.fromfile(
        os.path.join(gdir, "graph_0_coo.bin"), dtype=np.int32
    ).reshape(-1, 2)
    np.testing.assert_array_equal(coo.T, graphs[0].edge_index)
    nf = np.fromfile(
        os.path.join(gdir, "graph_0_node_features.bin"), dtype=np.float32
    ).reshape(graphs[0].num_nodes, 8)
    np.testing.assert_allclose(nf, graphs[0].x)

    # dataset_info.txt uses the reference header format
    with open(os.path.join(out_dir, "dataset_info.txt")) as f:
        assert f.readline().strip() == "num_graphs 5"

    # golden outputs load + parity against the same program is ~exact
    outs = golden.load_golden_outputs(out_dir)
    assert len(outs) == 5 and outs[0].shape == (3,)
    rep = prog.run_parity_check(graphs, out_dir)
    assert rep["num_graphs"] == 5
    assert rep["model_output_mae"] < 1e-6

    # a perturbed program reports a nonzero MAE (the check actually checks)
    import jax

    prog2 = _program()
    prog2.set_params(
        jax.tree.map(lambda p: p + 0.05, prog.params)
    )
    rep2 = prog2.run_parity_check(graphs, out_dir)
    assert rep2["model_output_mae"] > 1e-4


def test_param_serialization_names(tmp_path):
    prog = _program()
    graphs = FakeDataset(num_graphs=1, avg_num_nodes=8, node_dim=8, seed=2)
    prog.init_params(prog.batch([graphs[0]]))
    written = golden.serialize_params(prog.params, str(tmp_path))
    names = {os.path.basename(p) for p in written}
    # reference naming: <layer path>_<param>.bin (utils.py:99-100)
    assert any("kernel.bin" in n for n in names)
    assert any("bias.bin" in n for n in names)


def test_program_export_roundtrip(tmp_path):
    """StableHLO export/load — the deployable-artifact analog of the
    reference's generated project (code_gen.py:201-213)."""
    import numpy as np

    graphs = FakeDataset(num_graphs=1, avg_num_nodes=10, node_dim=8, seed=5)
    prog = _program()
    batch = prog.batch(graphs)
    prog.init_params(batch)
    want = np.asarray(prog.forward(batch))

    p = prog.export(str(tmp_path / "model.stablehlo"), batch)
    fn = gnnb.Program.load_exported(p)
    got = np.asarray(fn(prog.params, batch))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_program_from_dataset_buckets_fit():
    graphs = FakeDataset(num_graphs=40, avg_num_nodes=15, node_dim=8, seed=6)
    prog = gnnb.Program.from_dataset(_program().model, graphs, batch_size=8)
    # any 8-graph batch from the dataset fits the bucket
    for i in range(0, 40, 8):
        b = prog.batch(graphs[i : i + 8])
        assert b.num_nodes == prog.bucket.max_nodes


def test_task_output_encodings(tmp_path):
    """The reference's pyg_output_encoding switch (code_gen.py:101-109,
    270-277): classification_integer expands an int label to a one-hot
    float vector; onehot/regression write y as-is; bad names raise."""
    import numpy as np
    import pytest

    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.data.datasets import FakeDataset
    from gnnbuilder_tpu.verify.golden import gen_testbench_data

    graphs = list(FakeDataset(num_graphs=3, avg_num_nodes=8, node_dim=4,
                              seed=0))
    for i, g in enumerate(graphs):
        g.y = np.asarray([i % 2], np.int64)  # integer class labels
    model = gnnb.GNNModel(
        graph_input_feature_dim=4, gnn_hidden_dim=8, gnn_num_layers=2,
        gnn_output_dim=4, gnn_conv="gcn", pooling_aggrs=("mean",),
        mlp_out_dim=2,
    )
    prog = gnnb.Program(model, max_nodes=128, max_edges=256, max_graphs=2)
    prog.init_params(prog.batch(graphs[:1]))

    d = tmp_path / "int_enc"
    gen_testbench_data(prog, graphs, str(d),
                       output_encoding="classification_integer",
                       num_classes=2)
    t = np.fromfile(
        str(d / "graphs" / "graph_1_task_golden_output.bin"), np.float32
    )
    np.testing.assert_array_equal(t, [0.0, 1.0])

    with pytest.raises(ValueError, match="output_encoding"):
        gen_testbench_data(prog, graphs, str(tmp_path / "bad"),
                           output_encoding="nope")
    with pytest.raises(ValueError, match="num_classes"):
        gen_testbench_data(prog, graphs, str(tmp_path / "bad2"),
                           output_encoding="classification_integer")
