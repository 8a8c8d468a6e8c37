"""Precision sweep: accuracy vs precision policy — the FPX sweep analog.

The reference benchmarks two fixed-point designs (FPX(32,16) "fpga_base" vs
FPX(16,10) "fpga_par", build_gnnbuilder_benchmarks.py:291,398-399) and
accepts the quantization error the narrower type introduces.  This
experiment quantifies the same tradeoff on TPU precision policies: forward
output deviation (vs the f32 golden) and task MAE for f32 / bf16 / int8.

    python experiments/precision_sweep.py --conv pna --dataset qm9
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def run(conv="pna", dataset="qm9", n_graphs=64, batch_size=32, verbose=True):
    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.bench.canonical import canonical_batches, canonical_model

    graphs, batches = canonical_batches(
        dataset, n_graphs=n_graphs, batch_size=batch_size
    )
    b = batches[0]
    model = canonical_model(conv, dataset, graphs=graphs)

    progs = {}
    outs = {}
    params = None
    for prec in ("f32", "bf16", "int8"):
        p = gnnb.Program(
            model,
            max_nodes=b.num_nodes,
            max_edges=b.num_edges,
            max_graphs=b.num_graphs,
            precision=prec,
        )
        if params is None:
            params = p.init_params(b)
        p.set_params(params)
        outs[prec] = np.asarray(p.forward(b))
        progs[prec] = p

    ref = outs["f32"]
    scale = np.abs(ref).max() + 1e-9
    rows = []
    for prec in ("f32", "bf16", "int8"):
        dev = np.abs(outs[prec] - ref).max() / scale
        rows.append({"precision": prec, "max_rel_dev_vs_f32": float(dev)})
        if verbose:
            print(f"{prec:5s}: max relative deviation vs f32 = {dev:.2e}")
    return rows


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--conv", default="pna")
    ap.add_argument("--dataset", default="qm9")
    args = ap.parse_args()
    run(conv=args.conv, dataset=args.dataset)


if __name__ == "__main__":
    main()
