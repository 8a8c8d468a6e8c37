"""Classification/regression results tables over all 5 datasets.

Two tables, both committed to results_tpu/accuracy_tables.json:

* ``parity``: torch-vs-JAX trained-model parity at a small config for every
  dataset x conv in the reference's benchmark grid ({gcn,gin,pna,sage} x
  {qm9,esol,freesolv,lipo,hiv}, build_gnnbuilder_benchmarks.py:121-148) —
  same init, same batches, same Adam; reports final-loss relative deviation
  and (HIV) ROC-AUC deviation.  This is the BASELINE.json "match MAE/ROC-AUC
  vs PyG" check, run as *trained* parity, which is stronger than the
  reference's inference-only verification (verify.py:61-103).
* ``canonical``: the canonical benchmark model (6 layers, hidden 128 —
  bench/canonical.py) trained from scratch per dataset x conv with a held-out
  test split; reports test MAE (regression, vs the predict-train-mean
  baseline) or test ROC-AUC (classification, vs 0.5 chance).

Data note (documented limitation): network egress is blocked and no PyG /
rdkit is available in this image, so datasets are the seeded synthetic
statistics-matched generators of data/datasets.py; regression targets carry
a graph-size signal and classification labels a structural signal, so the
tables measure genuine end-to-end learning, while absolute values are not
comparable to published MoleculeNet numbers.

    python experiments/results_tables.py --mode parity
    python experiments/results_tables.py --mode canonical
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONVS = ("gcn", "gin", "pna", "sage")
DATASETS = ("qm9", "esol", "freesolv", "lipo", "hiv")
OUT_JSON = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "results_tpu", "accuracy_tables.json",
)


def parity_table(steps=40, verbose=True):
    from experiments.train_parity import run as parity_run

    rows = []
    for ds in DATASETS:
        for conv in CONVS:
            res = parity_run(dataset=ds, steps=steps, conv=conv,
                             verbose=False)
            if len(res) == 4:
                jl, tl, rel, aucs = res
            else:
                (jl, tl, rel), aucs = res, None
            row = dict(
                dataset=ds, conv=conv,
                final_loss_jax=float(jl[-1]), final_loss_torch=float(tl[-1]),
                max_rel_dev=float(rel.max()),
            )
            if aucs is not None:
                row["auc_jax"], row["auc_torch"] = map(float, aucs)
                row["auc_dev"] = float(abs(aucs[0] - aucs[1]))
            rows.append(row)
            if verbose:
                extra = (f"  auc j={row['auc_jax']:.3f} t={row['auc_torch']:.3f}"
                         if aucs is not None else "")
                print(f"parity {ds:9s} {conv:5s}: loss j={jl[-1]:.5f} "
                      f"t={tl[-1]:.5f} maxrel={rel.max():.2e}{extra}",
                      flush=True)
    return rows


def _pack_chunks(graphs, batch_size):
    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.train import stack_targets

    chunks = [graphs[i:i + batch_size]
              for i in range(0, len(graphs), batch_size)]
    chunks = [c for c in chunks if len(c) == batch_size]
    max_n = max(sum(g.num_nodes for g in c) for c in chunks)
    max_e = max(sum(g.num_edges for g in c) for c in chunks)
    batches = [
        gnnb.build_graph_batch(
            c, node_budget=((max_n + 8) // 8) * 8,
            edge_budget=((max_e + 7) // 8) * 8,
            graph_budget=batch_size + 1,
        )
        for c in chunks
    ]
    targets = [stack_targets(c, b.num_graphs) for c, b in zip(chunks, batches)]
    return chunks, batches, targets


def canonical_table(epochs=30, batch_size=128, n_train=512, n_test=256,
                    seed=0, verbose=True):
    import jax
    import optax

    from gnnbuilder_tpu.bench.canonical import canonical_model
    from gnnbuilder_tpu.data.datasets import DATASET_SPECS, load_dataset
    from gnnbuilder_tpu.train import (
        make_train_step, masked_bce_logits_loss, masked_mse_loss, roc_auc,
    )

    rows = []
    for ds in DATASETS:
        spec = DATASET_SPECS[ds]
        classify = spec.task == "binary_classification"
        graphs = load_dataset(ds, n=n_train + n_test, seed=seed)
        train_g, test_g = graphs[:n_train], graphs[n_train:]
        _, tr_batches, tr_targets = _pack_chunks(train_g, batch_size)
        _, te_batches, te_targets = _pack_chunks(test_g, batch_size)
        ys_train = np.concatenate(
            [np.asarray(g.y, np.float32).reshape(-1)[:1] for g in train_g]
        )
        for conv in CONVS:
            model = canonical_model(conv, ds, graphs=train_g)
            params = model.init(jax.random.PRNGKey(seed), tr_batches[0])
            tx = optax.adam(1e-3)
            loss_fn = masked_bce_logits_loss if classify else masked_mse_loss
            step = make_train_step(model, tx, loss_fn=loss_fn, donate=False)
            opt_state = tx.init(params)
            for _ in range(epochs):
                for b, t in zip(tr_batches, tr_targets):
                    params, opt_state, loss = step(params, opt_state, b, t)
            # held-out evaluation
            preds, tgts = [], []
            for b, t in zip(te_batches, te_targets):
                out = np.asarray(model.apply(params, b))
                m = np.asarray(b.graph_mask) > 0
                preds.append(out[m, 0])
                tgts.append(np.asarray(t)[m, 0])
            preds = np.concatenate(preds)
            tgts = np.concatenate(tgts)
            row = dict(dataset=ds, conv=conv,
                       final_train_loss=float(loss))
            if classify:
                row["test_roc_auc"] = float(roc_auc(preds, tgts))
                row["chance"] = 0.5
                msg = f"test AUC {row['test_roc_auc']:.3f} (chance 0.5)"
            else:
                mae = float(np.mean(np.abs(preds - tgts)))
                base = float(np.mean(np.abs(tgts - ys_train.mean())))
                row["test_mae"] = mae
                row["predict_mean_mae"] = base
                msg = f"test MAE {mae:.4f} (predict-mean {base:.4f})"
            rows.append(row)
            if verbose:
                print(f"canonical {ds:9s} {conv:5s}: {msg}", flush=True)
    return rows


def write_markdown(payload, path):
    lines = ["# Accuracy results (all 5 datasets)", ""]
    lines.append(payload.get("data_note", ""))
    lines.append("")
    if "canonical" in payload:
        lines += ["## Canonical model (6 layers, hidden 128): held-out test",
                  "",
                  "| dataset | conv | metric | value | naive baseline |",
                  "|---|---|---|---|---|"]
        for r in payload["canonical"]:
            if "test_mae" in r:
                lines.append(
                    f"| {r['dataset']} | {r['conv']} | test MAE "
                    f"| {r['test_mae']:.4f} | {r['predict_mean_mae']:.4f} |"
                )
            else:
                lines.append(
                    f"| {r['dataset']} | {r['conv']} | test ROC-AUC "
                    f"| {r['test_roc_auc']:.3f} | 0.500 |"
                )
        lines.append("")
    if "parity" in payload:
        lines += ["## Trained torch-vs-JAX parity (same init/batches/Adam)",
                  "",
                  "| dataset | conv | final loss (jax) | final loss (torch) "
                  "| max rel dev | AUC dev |",
                  "|---|---|---|---|---|---|"]
        for r in payload["parity"]:
            auc = f"{r['auc_dev']:.4f}" if "auc_dev" in r else "—"
            lines.append(
                f"| {r['dataset']} | {r['conv']} | {r['final_loss_jax']:.5f} "
                f"| {r['final_loss_torch']:.5f} | {r['max_rel_dev']:.2e} "
                f"| {auc} |"
            )
        lines.append("")
    with open(path, "w") as f:
        f.write("\n".join(lines))


DATA_NOTE = (
    "Datasets are seeded statistics-matched synthetic generators "
    "(data/datasets.py) — no network egress / PyG in this environment; "
    "regression targets carry a graph-size signal, classification labels a "
    "structural signal, so values demonstrate end-to-end learning but are "
    "not comparable to published MoleculeNet numbers."
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=["parity", "canonical", "both"],
                    default="both")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--platform", default="cpu",
                    help="accuracy numbers are platform-independent; cpu "
                         "keeps the TPU free and parity exact (CLAUDE.md)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", args.platform)

    payload = {}
    if os.path.exists(OUT_JSON):
        with open(OUT_JSON) as f:
            payload = json.load(f)
    payload["data_note"] = DATA_NOTE
    if args.mode in ("canonical", "both"):
        payload["canonical"] = canonical_table(epochs=args.epochs)
    if args.mode in ("parity", "both"):
        payload["parity"] = parity_table(steps=args.steps)
    os.makedirs(os.path.dirname(OUT_JSON), exist_ok=True)
    with open(OUT_JSON, "w") as f:
        json.dump(payload, f, indent=1)
    write_markdown(payload, OUT_JSON.replace(".json", ".md"))
    print(f"wrote {OUT_JSON}")


if __name__ == "__main__":
    main()
