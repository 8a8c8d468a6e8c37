"""Smoke demo: the whole flow on a fake dataset, no hardware assumptions.

TPU-native counterpart of the reference's demos/simple_test.py:49-145 —
model spec -> compiled Program -> golden-data serialization -> parity check
-> benchmark, using synthetic graphs.  Runs on CPU or TPU as available.

    python demos/simple_test.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.data.datasets import FakeDataset


def main():
    graphs = FakeDataset(num_graphs=16, avg_num_nodes=20, node_dim=8, seed=0)

    model = gnnb.GNNModel(
        graph_input_feature_dim=8,
        gnn_hidden_dim=16,
        gnn_num_layers=2,
        gnn_output_dim=8,
        gnn_conv="gcn",
        gnn_activation="relu",
        pooling_aggrs=("add", "mean", "max"),
        mlp_hidden_dim=16,
        mlp_hidden_layers=2,
        mlp_out_dim=1,
    )

    prog = gnnb.Program(model, max_nodes=512, max_edges=1024, max_graphs=17)
    batch = prog.batch(graphs)
    prog.init_params(batch)

    out = prog.forward(batch)
    print(f"forward: {out.shape} (last row is the ghost graph)")

    with tempfile.TemporaryDirectory() as d:
        prog.gen_testbench_data(graphs, d)
        report = prog.run_parity_check(graphs, d)
        print(f"parity: MAE={report['model_output_mae']:.2e} "
              f"over {report['num_graphs']} graphs")

    bench = prog.benchmark(batch, iters=10)
    print(f"benchmark: {bench['latency_s'] * 1e6:.1f} us/batch, "
          f"{bench['graphs_per_s']:,.0f} graphs/s")

    cost = prog.cost_analysis(batch)
    print(f"cost analysis: {cost.get('flops', 0) / 1e6:.1f} MFLOP, "
          f"{cost.get('bytes accessed', 0) / 1e6:.1f} MB accessed")


if __name__ == "__main__":
    main()
