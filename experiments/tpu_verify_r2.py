"""On-hardware verification of the round-2 session kernels.

Covers what experiments/tpu_verify.py (the original cosim-analog) does
not: window_mode='tile' DMA schedules, the fused GINE layer, the fused
readout (pooling + MLP), and the int8 quant epilogues.  Each check is
fused-vs-XLA on the SAME params/batch on the real chip; structural
breakage (window bugs, miscompiles) shows up as O(1) relative error.

Writes results_tpu/fused_parity_tpu_r2.json.  Run serialized (one TPU
job at a time), nohup, generous timeout — never kill mid-compile.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import numpy as np  # noqa: E402

import gnnbuilder_tpu as gnnb  # noqa: E402
from gnnbuilder_tpu.bench.canonical import (  # noqa: E402
    canonical_batches,
    canonical_model,
)
from gnnbuilder_tpu.ops import dispatch  # noqa: E402

OUT = os.path.join(ROOT, "results_tpu", "fused_parity_tpu_r2.json")


def _masked_rel(got, ref, mask):
    err = float(np.abs((got - ref)[mask]).max())
    scale = float(np.abs(ref[mask]).max())
    return err / max(scale, 1e-9)


def check(report, name, fn, tol=0.05):
    t0 = time.time()
    try:
        rel = fn()
        entry = {"rel": rel, "tol": tol, "pass": bool(rel <= tol),
                 "elapsed_s": round(time.time() - t0, 1)}
    except Exception as e:  # noqa: BLE001
        entry = {"error": f"{type(e).__name__}: {e}", "pass": False,
                 "elapsed_s": round(time.time() - t0, 1)}
    report[name] = entry
    print(f"{name}: {entry}", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    report = {}

    graphs, batches = canonical_batches(
        "qm9", n_graphs=512, batch_size=256, node_multiple=256
    )
    b = batches[0]
    mask = np.asarray(b.graph_mask)

    # 1. window_mode='tile' on the whole-model forward (PNA + GIN)
    for conv in ("pna", "gin"):
        model = canonical_model(conv, "qm9", graphs=graphs)
        params = model.init(jax.random.PRNGKey(0), b)

        def run(conv=conv, model=model, params=params):
            dispatch.set_fused_mode("always")
            try:
                base = np.asarray(jax.jit(model.apply)(params, b))
                dispatch.set_kernel_overrides(window_mode="tile")
                tile = np.asarray(jax.jit(model.apply)(params, b))
            finally:
                dispatch.set_kernel_overrides(window_mode=None)
                dispatch.set_fused_mode("auto")
            return _masked_rel(tile, base, mask)

        # tile vs sub is a pure DMA-schedule change: bit-level agreement
        check(report, f"window_tile_{conv}", run, tol=1e-6)

    # 2. fused GINE layer (fwd, fused vs XLA)
    def run_gine():
        model = gnnb.GNNModel(
            graph_input_feature_dim=11, gnn_hidden_dim=128,
            gnn_num_layers=3, gnn_output_dim=128, gnn_conv="gine",
            pooling_aggrs=("mean",), mlp_out_dim=1,
            conv_kwargs={"edge_dim": b.edge_feat.shape[1]},
        )
        params = model.init(jax.random.PRNGKey(0), b)
        dispatch.set_fused_mode("never")
        ref = np.asarray(jax.jit(model.apply)(params, b))
        dispatch.set_fused_mode("always")
        try:
            got = np.asarray(jax.jit(model.apply)(params, b))
        finally:
            dispatch.set_fused_mode("auto")
        return _masked_rel(got, ref, mask)

    check(report, "gine_layer", run_gine)

    # 3. fused readout (pooling + MLP), canonical add+mean+max model
    def run_readout():
        model = canonical_model("gcn", "qm9", graphs=graphs)
        params = model.init(jax.random.PRNGKey(0), b)
        dispatch.set_fused_mode("never")
        ref = np.asarray(jax.jit(model.apply)(params, b))
        dispatch.set_fused_mode("always")
        try:
            got = np.asarray(jax.jit(model.apply)(params, b))
        finally:
            dispatch.set_fused_mode("auto")
        return _masked_rel(got, ref, mask)

    check(report, "readout", run_readout)

    # 4. int8 quant epilogues: fused int8 error vs f32 golden must match
    #    the XLA int8 path's error (cross-path diffs are quant steps)
    for conv in ("gin", "pna"):
        def run_int8(conv=conv):
            model = canonical_model(conv, "qm9", graphs=graphs)
            kw = dict(max_nodes=b.num_nodes, max_edges=b.num_edges,
                      max_graphs=b.num_graphs)
            pf = gnnb.Program(model, **kw, precision="f32")
            pf.init_params(b)
            dispatch.set_fused_mode("never")
            gold = np.asarray(pf.forward(b))
            pq = gnnb.Program(model, **kw, precision="int8")
            pq.params = pf.params
            ref = np.asarray(pq.forward(b))
            dispatch.set_fused_mode("always")
            try:
                pq2 = gnnb.Program(model, **kw, precision="int8")
                pq2.params = pf.params
                got = np.asarray(pq2.forward(b))
            finally:
                dispatch.set_fused_mode("auto")
            sc = np.abs(gold[mask]).max() + 1e-9
            e_xla = np.abs((ref - gold)[mask]).max() / sc
            e_fus = np.abs((got - gold)[mask]).max() / sc
            # "rel" here = fused error normalized by the XLA path's error
            return e_fus / max(e_xla, 1e-6)

        check(report, f"int8_{conv}", run_int8, tol=2.0)

    # 5. tile-mode backward gather (training path under the override)
    def run_bwd_tile():
        model = canonical_model("gin", "qm9", graphs=graphs)
        params = model.init(jax.random.PRNGKey(0), b)

        def loss(p):
            out = model.apply(p, b)
            return (out * out).sum()

        dispatch.set_fused_mode("always")
        try:
            g0 = jax.jit(jax.grad(loss))(params)
            dispatch.set_kernel_overrides(window_mode="tile")
            g1 = jax.jit(jax.grad(loss))(params)
        finally:
            dispatch.set_kernel_overrides(window_mode=None)
            dispatch.set_fused_mode("auto")
        worst = 0.0
        for a, r in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
            a, r = np.asarray(a), np.asarray(r)
            worst = max(worst, float(np.abs(a - r).max()
                                     / (np.abs(r).max() + 1e-9)))
        return worst

    check(report, "window_tile_backward_gin", run_bwd_tile, tol=1e-6)

    report["all_pass"] = all(
        v.get("pass", False) for v in report.values() if isinstance(v, dict)
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"all_pass": report["all_pass"],
                      "n_checks": sum(1 for v in report.values()
                                      if isinstance(v, dict))}))


if __name__ == "__main__":
    main()
