"""Training parity experiment: torch vs JAX, same init, same data, same
optimizer — the downstream-accuracy parity check of BASELINE.json ("match
MAE/ROC-AUC on ESOL/FreeSolv/Lipo/HIV/QM9 vs PyG").

The reference trains its models in vanilla PyTorch and only verifies
inference parity; this experiment goes further: port the torch model's
initial weights into the JAX model, run both training loops with identical
Adam hyperparameters and batch order, and compare loss curves and the final
eval metric.  Divergence beyond f32 noise accumulation indicates a gradient
bug; matching curves certify the whole differentiable path.

    python experiments/train_parity.py --dataset esol --steps 40
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def run(dataset="esol", steps=40, batch_size=16, hidden=32, layers=3,
        lr=1e-3, conv="gcn", seed=0, verbose=True, block_size=0):
    """Regression (MSE) or binary classification (BCE-with-logits) is picked
    from the dataset spec; classification additionally reports torch-vs-JAX
    ROC-AUC on the training pool (the HIV-style end-to-end parity the
    BASELINE.json asks for)."""
    import jax
    import optax
    import torch

    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.data.datasets import DATASET_SPECS, load_dataset
    from gnnbuilder_tpu.train import (
        make_train_step,
        masked_bce_logits_loss,
        masked_mse_loss,
        roc_auc,
        stack_targets,
    )
    from gnnbuilder_tpu.verify import port
    from gnnbuilder_tpu.verify import torch_ref as tr

    spec = DATASET_SPECS[dataset]
    classify = spec.task == "binary_classification"
    graphs = load_dataset(dataset, n=batch_size * 4, seed=seed)
    kw = dict(
        graph_input_feature_dim=spec.node_dim,
        gnn_hidden_dim=hidden,
        gnn_num_layers=layers,
        gnn_output_dim=hidden,
        gnn_conv=conv,
        pooling_aggrs=("mean",),
        mlp_hidden_dim=hidden,
        mlp_hidden_layers=1,
        mlp_out_dim=1,
    )
    torch.manual_seed(seed)
    # pin torch to one thread: multi-threaded CPU reductions are order-
    # nondeterministic and 25+ chained optimizer steps amplify the noise
    # chaotically (parity must compare math, not thread schedules)
    torch.set_num_threads(1)
    tmodel = tr.TorchGNNModel(**kw)
    jmodel = gnnb.GNNModel(**kw)
    jparams = port.port_model(conv, tmodel)

    # identical batches
    chunks = [graphs[i : i + batch_size] for i in range(0, len(graphs), batch_size)]
    jbatches = [gnnb.build_graph_batch(c, block_size=block_size or None)
                for c in chunks]
    jtargets = [stack_targets(c, b.num_graphs) for c, b in zip(chunks, jbatches)]

    # --- JAX training ---
    tx = optax.adam(lr)
    jloss_fn = masked_bce_logits_loss if classify else masked_mse_loss
    step = make_train_step(jmodel, tx, loss_fn=jloss_fn, donate=False)
    opt_state = tx.init(jparams)
    jlosses = []
    p = jparams
    for s in range(steps):
        b = jbatches[s % len(jbatches)]
        t = jtargets[s % len(jbatches)]
        p, opt_state, loss = step(p, opt_state, b, t)
        jlosses.append(float(loss))

    # --- torch training (same init, same order, same adam defaults) ---
    opt = torch.optim.Adam(tmodel.parameters(), lr=lr)
    tlosses = []
    for s in range(steps):
        c = chunks[s % len(chunks)]
        opt.zero_grad()
        preds = []
        for g in c:
            preds.append(
                tmodel(torch.tensor(g.x), torch.tensor(g.edge_index),
                       num_graphs=1)[0]
            )
        pred = torch.stack(preds)
        tgt = torch.tensor(
            np.stack([np.asarray(g.y, np.float32).reshape(-1)[:1] for g in c])
        )
        if classify:
            loss = torch.nn.functional.binary_cross_entropy_with_logits(
                pred, tgt
            )
        else:
            loss = torch.mean((pred - tgt) ** 2)
        loss.backward()
        opt.step()
        tlosses.append(float(loss))

    jlosses, tlosses = np.array(jlosses), np.array(tlosses)
    rel = np.abs(jlosses - tlosses) / (np.abs(tlosses) + 1e-6)
    aucs = None
    if classify:
        # final-model ROC-AUC parity over the training pool
        labels = np.concatenate([
            np.asarray(g.y, np.float32).reshape(-1)[:1] for g in graphs
        ])
        jscores, tscores = [], []
        for c in chunks:
            b = gnnb.build_graph_batch(c, block_size=block_size or None)
            out = np.asarray(jmodel.apply(p, b))
            jscores.append(out[: len(c), 0])
            with torch.no_grad():
                for g in c:
                    tscores.append(float(tmodel(
                        torch.tensor(g.x), torch.tensor(g.edge_index),
                        num_graphs=1)[0, 0]))
        aucs = (roc_auc(np.concatenate(jscores), labels),
                roc_auc(np.asarray(tscores), labels))
    if verbose:
        for s in range(0, steps, max(1, steps // 8)):
            print(f"step {s:3d}: torch {tlosses[s]:.5f}  jax {jlosses[s]:.5f}  "
                  f"rel {rel[s]:.2e}")
        print(f"final: torch {tlosses[-1]:.5f} jax {jlosses[-1]:.5f} "
              f"max rel dev {rel.max():.2e}")
        if aucs is not None:
            print(f"ROC-AUC: jax {aucs[0]:.4f}  torch {aucs[1]:.4f}  "
                  f"dev {abs(aucs[0]-aucs[1]):.4f}")
    return (jlosses, tlosses, rel, aucs) if classify else (jlosses, tlosses, rel)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="esol")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--conv", default="gcn")
    args = ap.parse_args()
    run(dataset=args.dataset, steps=args.steps, conv=args.conv)


if __name__ == "__main__":
    main()
