"""On-hardware verification of the round-3 block-diagonal aggregation.

Checks, each fused-vs-XLA-reference on the SAME params/batch on the real
chip (the reference arm is set_fused_mode("never") — flat/ELL paths):

  * xla_block_fwd_<conv>   — whole canonical model, block-packed b1024,
                             default auto (XLA block einsum path) vs never
  * block_kernel_<conv>    — the Pallas block-matmul fused layer
                             (_STAGED_R3 forced on) vs the XLA block path,
                             forward output
  * block_kernel_bwd_gin   — jax.grad through the block kernel vs never
  * block_train_gin        — one sharded-free train step loss, auto vs never
  * blockpack_fused_pna    — the windowed fused PNA kernel ON a block-packed
                             batch (PNA keeps it under block packing) vs never

Writes results_tpu/block_verify_r3.json.  On all_pass, flip the
dispatch._STAGED_R3 default and commit (runbook step).  Run serialized,
nohup, never kill mid-compile (CLAUDE.md).
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

OUT = os.path.join(ROOT, "results_tpu", "block_verify_r3.json")


def check(report, name, fn, tol=0.05):
    t0 = time.time()
    try:
        rel = float(fn())
        entry = {"rel": rel, "tol": tol, "pass": bool(rel <= tol),
                 "elapsed_s": round(time.time() - t0, 1)}
    except Exception as e:  # noqa: BLE001
        entry = {"error": f"{type(e).__name__}: {e}", "pass": False,
                 "elapsed_s": round(time.time() - t0, 1)}
    report[name] = entry
    print(f"{name}: {entry}", flush=True)


def main():
    import optax

    from gnnbuilder_tpu.bench.canonical import (
        canonical_batches,
        canonical_model,
    )
    from gnnbuilder_tpu.ops import dispatch
    from gnnbuilder_tpu.train import make_train_step, stack_targets

    print(f"devices: {jax.devices()}", flush=True)
    report = {}

    graphs, batches = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024,
        node_multiple=256, block_size=128,
    )
    b = batches[0]
    gmask = np.asarray(b.graph_mask)

    def rel_out(o_auto, o_ref):
        a = np.asarray(o_auto)[gmask]
        r = np.asarray(o_ref)[gmask]
        return float(np.abs(a - r).max()) / max(float(np.abs(r).max()), 1e-9)

    models = {}
    for conv in ("gin", "gcn", "sage", "pna"):
        models[conv] = canonical_model(conv, "qm9", graphs=graphs)

    params = {}
    for conv, model in models.items():
        params[conv] = model.init(jax.random.PRNGKey(0), b)

    def model_rel(conv):
        model = models[conv]
        o_auto = model.apply(params[conv], b)
        dispatch.set_fused_mode("never")
        try:
            o_ref = model.apply(params[conv], b)
        finally:
            dispatch.set_fused_mode("auto")
        return rel_out(o_auto, o_ref)

    for conv in ("gin", "gcn", "sage"):
        check(report, f"xla_block_fwd_{conv}", lambda c=conv: model_rel(c))
    # pna keeps its fused windowed kernel on block batches
    check(report, "blockpack_fused_pna", lambda: model_rel("pna"))

    # ---- the Pallas block kernel (staged r3) vs the XLA block path
    def kernel_rel(conv):
        model = models[conv]
        saved = dispatch._STAGED_R3
        dispatch._STAGED_R3 = False
        try:
            o_xla = model.apply(params[conv], b)  # XLA block einsum path
        finally:
            dispatch._STAGED_R3 = saved
        dispatch._STAGED_R3 = True
        try:
            o_krn = model.apply(params[conv], b)
        finally:
            dispatch._STAGED_R3 = saved
        return rel_out(o_krn, o_xla)

    for conv in ("gin", "gcn", "sage"):
        check(report, f"block_kernel_{conv}", lambda c=conv: kernel_rel(c))

    # ---- backward through the block kernel vs never (gradient parity,
    # floored denominators as in tpu_verify.py)
    def bwd_rel():
        model = models["gin"]
        target = stack_targets(graphs[: b.num_graphs - 1], b.num_graphs)

        def loss_fn(p):
            out = model.apply(p, b)
            m = b.graph_mask.astype(out.dtype)[:, None]
            return ((out - target) ** 2 * m).sum() / m.sum()

        saved = dispatch._STAGED_R3
        dispatch._STAGED_R3 = True
        try:
            g_krn = jax.grad(loss_fn)(params["gin"])
        finally:
            dispatch._STAGED_R3 = saved
        dispatch.set_fused_mode("never")
        try:
            g_ref = jax.grad(loss_fn)(params["gin"])
        finally:
            dispatch.set_fused_mode("auto")
        lk = jax.tree.leaves(g_krn)
        lr = jax.tree.leaves(g_ref)
        gmax = max(float(np.abs(np.asarray(r)).max()) for r in lr)
        worst = 0.0
        for a, r in zip(lk, lr):
            a = np.asarray(a)
            r = np.asarray(r)
            denom = max(float(np.abs(r).max()), 1e-3 * gmax, 1e-9)
            worst = max(worst, float(np.abs(a - r).max()) / denom)
        return worst

    check(report, "block_kernel_bwd_gin", bwd_rel)

    # ---- one full train step, auto (XLA block) vs never
    def train_rel():
        model = models["gin"]
        target = stack_targets(graphs[: b.num_graphs - 1], b.num_graphs)
        opt = optax.adam(1e-3)
        step = make_train_step(model, opt, donate=False)
        p0 = params["gin"]
        s0 = opt.init(p0)
        _, _, loss_a = step(p0, s0, b, target)
        dispatch.set_fused_mode("never")
        try:
            step2 = make_train_step(model, opt, donate=False)
            _, _, loss_r = step2(p0, s0, b, target)
        finally:
            dispatch.set_fused_mode("auto")
        return abs(float(loss_a) - float(loss_r)) / max(
            abs(float(loss_r)), 1e-9
        )

    check(report, "block_train_gin", train_rel)

    # ---- fused readout with block-aware bands (graph_starts spans) vs
    # the XLA pooling+MLP tail on the same block-packed batch
    def readout_rel():
        model = models["gin"]
        cfg = dispatch.readout_config(
            b, aggrs=("add", "mean", "max"), act="relu", out_act=None
        )
        if jax.default_backend() == "tpu":
            assert cfg is not None and cfg.get("block_size") == 128, cfg
        o_fused = model.apply(params["gin"], b)

        # XLA tail: disable just the readout kernel via a geometry-safe
        # monkeypatch-free route — "never" also disables convs, so
        # compare against never and accept the conv-path drift bound
        dispatch.set_fused_mode("never")
        try:
            o_ref = model.apply(params["gin"], b)
        finally:
            dispatch.set_fused_mode("auto")
        return rel_out(o_fused, o_ref)

    check(report, "block_readout", readout_rel)

    report["all_pass"] = all(
        v["pass"] for v in report.values()
        if isinstance(v, dict) and "pass" in v
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1, default=float)
    print(json.dumps({"all_pass": report["all_pass"]}))


if __name__ == "__main__":
    main()
