"""End-to-end demo: 6-layer GraphSAGE on HIV-like molecular graphs.

TPU-native counterpart of the reference's demos/demo.py:45-132 (MoleculeNet
HIV, SAGE, 6 layers): declare the model, train a few steps, compile the
inference Program, verify golden parity against the serialized outputs, and
benchmark.  Where the reference then generates HLS C++ and calls Vitis, the
Program here IS the compiled accelerator binary (one XLA executable per
padding bucket).

    python demos/demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import jax
import numpy as np
import optax

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.data.datasets import load_dataset
from gnnbuilder_tpu.train import (
    make_train_step,
    masked_bce_logits_loss,
    roc_auc,
    stack_targets,
)
from gnnbuilder_tpu.utils.stats import (
    compute_average_nodes_and_edges,
    compute_max_nodes_and_edges,
)


def main():
    graphs = load_dataset("hiv", n=256)
    max_n, max_e = compute_max_nodes_and_edges(graphs)
    avg_n, avg_e = compute_average_nodes_and_edges(graphs)
    print(f"dataset: {len(graphs)} graphs, max {max_n}n/{max_e}e, "
          f"avg {avg_n:.1f}n/{avg_e:.1f}e")

    model = gnnb.GNNModel(
        graph_input_feature_dim=graphs[0].x.shape[1],
        gnn_hidden_dim=64,
        gnn_num_layers=6,
        gnn_output_dim=64,
        gnn_conv="sage",
        gnn_skip_connection=True,
        pooling_aggrs=("add", "mean", "max"),
        mlp_hidden_dim=64,
        mlp_hidden_layers=2,
        mlp_out_dim=1,  # binary classification logit
    )

    # --- train a few steps (the reference trains in vanilla PyTorch; here
    # training is first-class, train.py) ---
    bs = 32
    prog = gnnb.Program(
        model,
        max_nodes=bs * (max_n + 1),
        max_edges=bs * (max_e + 1),
        max_graphs=bs + 1,
    )
    batches = [
        prog.batch(graphs[i : i + bs])
        for i in range(0, 128, bs)
    ]
    targets = [
        stack_targets(graphs[i : i + bs], bs + 1)
        for i in range(0, 128, bs)
    ]
    prog.init_params(batches[0])
    tx = optax.adam(1e-3)
    step = make_train_step(model, tx, loss_fn=masked_bce_logits_loss)
    opt_state = tx.init(prog.params)
    params = prog.params
    for epoch in range(3):
        losses = []
        for b, t in zip(batches, targets):
            params, opt_state, loss = step(params, opt_state, b, t)
            losses.append(float(loss))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f}")
    prog.set_params(params)

    # --- eval ROC-AUC (the reference's classification parity metric) ---
    scores, labels = [], []
    for b, t in zip(batches, targets):
        out = np.asarray(prog.forward(b))
        m = np.asarray(b.graph_mask)
        scores.extend(out[m, 0].tolist())
        labels.extend(np.asarray(t)[m, 0].tolist())
    print(f"train ROC-AUC: {roc_auc(np.array(scores), np.array(labels)):.3f}")

    # --- golden serialization + parity (the generated-testbench flow) ---
    with tempfile.TemporaryDirectory() as d:
        prog.gen_testbench_data(graphs[:16], d)
        report = prog.run_parity_check(graphs[:16], d)
        print(f"parity MAE: {report['model_output_mae']:.2e}")

    # --- benchmark ---
    bench = prog.benchmark(batches[0], iters=10)
    print(f"benchmark: {bench['graphs_per_s']:,.0f} graphs/s "
          f"({bench['latency_s'] * 1e3:.2f} ms/batch of {bs})")


if __name__ == "__main__":
    main()
