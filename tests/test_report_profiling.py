"""Results reporting (pivot/plot/LaTeX) + profiling report — the
process_and_plot_data.py / print_graph_stats.py analogs."""

import os

import numpy as np

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.bench import report
from gnnbuilder_tpu.data.datasets import FakeDataset
from gnnbuilder_tpu.utils.profiling import profile_program


def _write_flat(d, metric, backend, conv, ds, v):
    with open(os.path.join(d, f"{metric}_{backend}_{conv}_{ds}.txt"), "w") as f:
        f.write(f"{v}\n")


def test_load_pivot_plot(tmp_path):
    d = str(tmp_path)
    for conv, v in [("gcn", 1e-3), ("pna", 3e-3)]:
        for ds, m in [("esol", 1.0), ("qm9", 2.0)]:
            _write_flat(d, "latency_s", "tpu", conv, ds, v * m)
    df = report.load_results(d)
    assert len(df) == 4
    piv = report.pivot(df, "latency_s", backend="tpu")
    assert piv.loc["pna", "qm9"] == 6e-3
    out = report.plot_runtimes(df, str(tmp_path / "plot.png"))
    assert os.path.exists(out)


def test_dataset_stats_latex():
    tex = report.dataset_stats_table(["esol"], n=16)
    assert "esol" in tex and tex.startswith(r"\begin{tabular}")


def test_profile_program_report():
    graphs = FakeDataset(num_graphs=4, avg_num_nodes=10, node_dim=8, seed=0)
    model = gnnb.GNNModel(
        graph_input_feature_dim=8, gnn_hidden_dim=8, gnn_num_layers=2,
        gnn_output_dim=8, gnn_conv="gcn", pooling_aggrs=("mean",),
        mlp_out_dim=1,
    )
    prog = gnnb.Program(model, max_nodes=64, max_edges=128, max_graphs=5)
    b = prog.batch(graphs)
    prog.init_params(b)
    rep = profile_program(prog, b, iters=4)
    for key in ("latency_s", "fraction_of_roofline", "edges_per_s", "bound"):
        assert key in rep
    assert rep["edges_per_s"] > 0


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import optax

    from gnnbuilder_tpu import train as T

    graphs = FakeDataset(num_graphs=4, avg_num_nodes=10, node_dim=8, seed=0)
    model = gnnb.GNNModel(
        graph_input_feature_dim=8, gnn_hidden_dim=8, gnn_num_layers=2,
        gnn_output_dim=8, gnn_conv="gcn", pooling_aggrs=("mean",),
        mlp_out_dim=1,
    )
    prog = gnnb.Program(model, max_nodes=64, max_edges=128, max_graphs=5)
    b = prog.batch(graphs)
    params = prog.init_params(b)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    p = T.save_checkpoint(str(tmp_path / "ckpt"), params, opt_state, step=7)
    restored = T.load_checkpoint(
        p, like={"params": params, "opt_state": opt_state, "step": 7}
    )
    assert restored["step"] == 7
    for a, bb in zip(jax.tree.leaves(params), jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
