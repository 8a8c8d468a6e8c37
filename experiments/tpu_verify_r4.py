"""On-hardware verification of the round-4 block-local inference kernels.

Checks, each fused-vs-XLA-reference on the SAME params/batch on the real
chip (reference arm = set_fused_mode("never")):

  * pna_stack_fwd       — whole canonical 6-layer PNA model on a block-
                          packed b1024 batch, the whole-STACK kernel
                          (ops/pallas/pna_block.py) vs never
  * pna_stack_grad      — jax.grad through the stack kernel's custom VJP
                          (XLA recompute backward) vs never
  * pna_stack_bf16      — stack kernel under the bf16 policy vs the bf16
                          XLA path (policy-consistent numerics)
  * gat_block_fwd       — canonical GAT model, fused block-dense attention
                          (ops/pallas/gat_block.py) vs never
  * gat_block_vs_windowed — block-attention kernel vs the fused WINDOWED
                          GAT kernel on the same batch (both fused paths
                          must agree within kernel tolerance)
  * edge_block_fwd      — canonical EdgeConv model, fused block-local
                          layer (ops/pallas/edge_block.py) vs never
  * inner_chain_protocol — Program.benchmark_inner resolves (slope > 0,
                          flat-in-k guard) on the canonical model

Writes results_tpu/r4_verify.json.  On all_pass, flip the
dispatch._STAGED_R4 default and commit (CLAUDE.md staged rollout).
Run serialized, nohup, never kill mid-compile.
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

OUT = os.path.join(ROOT, "results_tpu", "r4_verify.json")


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
    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.bench.canonical import (
        canonical_batches,
        canonical_model,
    )
    from gnnbuilder_tpu.ops import dispatch

    print(f"devices: {jax.devices()}", flush=True)
    report = {}

    graphs, batches = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024,
        node_multiple=1024, block_size=128,
    )
    b = batches[0]
    gmask = np.asarray(b.graph_mask)

    def rel_arr(a, r, mask):
        a = np.asarray(a)[mask]
        r = np.asarray(r)[mask]
        return float(np.abs(a - r).max()) / max(float(np.abs(r).max()), 1e-9)

    saved_r4 = dispatch._STAGED_R4

    def with_stack(fn):
        dispatch._STAGED_R4 = True
        try:
            with dispatch.inference_mode():
                return fn()
        finally:
            dispatch._STAGED_R4 = saved_r4

    def with_never(fn):
        dispatch.set_fused_mode("never")
        try:
            return fn()
        finally:
            dispatch.set_fused_mode("auto")

    # ---- PNA whole-stack kernel
    pna = canonical_model("pna", "qm9", graphs=graphs)
    p_pna = pna.init(jax.random.PRNGKey(0), b)

    from gnnbuilder_tpu.ops.pallas import pna_block as _pb

    calls = {"n": 0}
    orig_stack = _pb.pna_block_stack_auto

    def counting(*a, **k):
        calls["n"] += 1
        return orig_stack(*a, **k)

    def pna_fwd_rel():
        _pb.pna_block_stack_auto = counting
        try:
            o_k = with_stack(lambda: pna.apply(p_pna, b))
        finally:
            _pb.pna_block_stack_auto = orig_stack
        assert calls["n"] >= 1, "stack kernel was not dispatched"
        o_r = with_never(lambda: pna.apply(p_pna, b))
        return rel_arr(o_k, o_r, gmask)

    check(report, "pna_stack_fwd", pna_fwd_rel)

    def pna_grad_rel():
        target = jax.numpy.zeros((b.num_graphs, 1), jax.numpy.float32)

        def loss(p):
            out = pna.apply(p, b)
            m = b.graph_mask.astype(out.dtype)[:, None]
            return ((out - target) ** 2 * m).sum() / m.sum()

        g_k = with_stack(lambda: jax.grad(loss)(p_pna))
        g_r = with_never(lambda: jax.grad(loss)(p_pna))
        lk, lr = jax.tree.leaves(g_k), jax.tree.leaves(g_r)
        gmax = max(float(np.abs(np.asarray(r)).max()) for r in lr)
        worst = 0.0
        for a, r in zip(lk, lr):
            a, r = np.asarray(a), np.asarray(r)
            denom = max(float(np.abs(r).max()), 1e-3 * gmax, 1e-9)
            worst = max(worst, float(np.abs(a - r).max()) / denom)
        return worst

    check(report, "pna_stack_grad", pna_grad_rel)

    def pna_bf16_rel():
        prog_k = gnnb.Program(
            pna, max_nodes=b.num_nodes, max_edges=b.num_edges,
            max_graphs=b.num_graphs, precision="bf16", block_size=128,
        )
        prog_k.set_params(p_pna)
        dispatch._STAGED_R4 = True
        try:
            o_k = prog_k.forward(b)  # inference scope inside _forward_fn
        finally:
            dispatch._STAGED_R4 = saved_r4
        # fresh Program for the reference arm: the fused-mode gate is read
        # at TRACE time, and prog_k's executable is already cached
        prog_r = gnnb.Program(
            pna, max_nodes=b.num_nodes, max_edges=b.num_edges,
            max_graphs=b.num_graphs, precision="bf16", block_size=128,
        )
        prog_r.set_params(p_pna)
        o_r = with_never(lambda: prog_r.forward(b))
        return rel_arr(o_k, o_r, gmask)

    check(report, "pna_stack_bf16", pna_bf16_rel, tol=0.08)

    # ---- GAT block-dense attention
    gat = canonical_model("gat", "qm9", graphs=graphs)
    p_gat = gat.init(jax.random.PRNGKey(1), b)

    from gnnbuilder_tpu.ops.pallas import gat_block as _gb

    gcalls = {"n": 0}
    orig_gat = _gb.gat_block_layer_auto

    def counting_gat(*a, **k):
        gcalls["n"] += 1
        return orig_gat(*a, **k)

    def gat_fwd_rel():
        _gb.gat_block_layer_auto = counting_gat
        try:
            o_k = with_stack(lambda: gat.apply(p_gat, b))
        finally:
            _gb.gat_block_layer_auto = orig_gat
        assert gcalls["n"] >= 1, "gat block kernel was not dispatched"
        o_r = with_never(lambda: gat.apply(p_gat, b))
        return rel_arr(o_k, o_r, gmask)

    check(report, "gat_block_fwd", gat_fwd_rel)

    def gat_vs_windowed_rel():
        o_k = with_stack(lambda: gat.apply(p_gat, b))
        o_w = gat.apply(p_gat, b)  # auto: windowed fused kernel
        return rel_arr(o_k, o_w, gmask)

    check(report, "gat_block_vs_windowed", gat_vs_windowed_rel)

    # ---- EdgeConv block-local layer
    edge = canonical_model("edge", "qm9", graphs=graphs)
    p_edge = edge.init(jax.random.PRNGKey(2), b)

    from gnnbuilder_tpu.ops.pallas import edge_block as _eb

    ecalls = {"n": 0}
    orig_edge = _eb.edge_block_layer_auto

    def counting_edge(*a, **k):
        ecalls["n"] += 1
        return orig_edge(*a, **k)

    def edge_fwd_rel():
        _eb.edge_block_layer_auto = counting_edge
        try:
            o_k = with_stack(lambda: edge.apply(p_edge, b))
        finally:
            _eb.edge_block_layer_auto = orig_edge
        assert ecalls["n"] >= 1, "edge block kernel was not dispatched"
        o_r = with_never(lambda: edge.apply(p_edge, b))
        return rel_arr(o_k, o_r, gmask)

    check(report, "edge_block_fwd", edge_fwd_rel)

    # ---- inner-chain protocol sanity (Program.benchmark_inner)
    def inner_protocol():
        prog = gnnb.Program(
            pna, max_nodes=b.num_nodes, max_edges=b.num_edges,
            max_graphs=b.num_graphs, block_size=128,
        )
        prog.set_params(p_pna)
        r = prog.benchmark_inner(b, iters=15, repeats=5)
        report["inner_chain_detail"] = {
            "latency_us": r["latency_s"] * 1e6,
            "overhead_us": r["overhead_s"] * 1e6,
            "resolved": r["resolved"],
            "times_ms": {k: v * 1e3 for k, v in r["times_s"].items()},
        }
        print("inner chain:", report["inner_chain_detail"], flush=True)
        return 0.0 if r["resolved"] else 1.0

    check(report, "inner_chain_protocol", inner_protocol)

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
