"""Chip verification + within-run A/B for the mp whole-stack kernel
(gcn/gin/sage, ops/pallas/mp_block.py, round 4b).

Per conv, canonical model at b1024 block128:
  1. parity: fused stack forward vs set_fused_mode("never") on the SAME
     params/batch (real Mosaic), rel tol 0.05 — the r4_verify contract.
  2. within-run inner-chain A/B: whole model with the stack gate ON vs
     OFF (per-layer dispatch policy), both in this process.

On all_pass + wins, flip dispatch._STAGED_R4B default and commit with
this artifact (CLAUDE.md staged rollout).  Writes
results_tpu/mp_stack_ab.json.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import numpy as np

    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.bench.canonical import (
        canonical_batches,
        canonical_model,
    )
    from gnnbuilder_tpu.ops import dispatch

    log(f"devices: {jax.devices()}")
    results = {"meta": {"protocol": "inner-chain k=1/5, within-run",
                        "batch": 1024}}
    graphs, batches = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024,
        node_multiple=1024, block_size=128,
    )
    b = batches[0]
    results["meta"]["N"] = b.num_nodes
    all_pass = True

    for conv in ("gcn", "gin", "sage"):
        model = canonical_model(conv, "qm9", graphs=graphs)
        prog = gnnb.Program(model, max_nodes=b.num_nodes,
                            max_edges=b.num_edges, max_graphs=b.num_graphs,
                            block_size=128)
        prog.init_params(b)

        # --- parity: stack (forced) vs never, same params/batch
        from gnnbuilder_tpu.ops.pallas import mp_block as _mb

        calls = {"n": 0}
        orig = _mb.mp_block_stack_auto

        def counting(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        # eager applies: dispatch decisions retrace every call, so the
        # two arms cannot share a cached executable (tpu_verify_r4 pattern)
        params = prog.params
        r4b0 = dispatch._STAGED_R4B
        mode0 = dispatch.get_fused_mode()
        try:
            dispatch._STAGED_R4B = True
            _mb.mp_block_stack_auto = counting
            with dispatch.inference_mode():
                o_k = np.asarray(model.apply(params, b))
            assert calls["n"] >= 1, f"{conv}: stack kernel not dispatched"
            dispatch.set_fused_mode("never")
            o_r = np.asarray(model.apply(params, b))
        finally:
            _mb.mp_block_stack_auto = orig
            dispatch._STAGED_R4B = r4b0
            dispatch.set_fused_mode(mode0)
        mask = np.asarray(b.graph_mask, bool)
        rel = float(np.max(np.abs(o_k[mask] - o_r[mask]))
                    / (np.max(np.abs(o_r[mask])) + 1e-9))
        ok = rel < 0.05
        all_pass &= ok
        results[f"{conv}_parity"] = {"rel": rel, "pass": ok}
        log(f"{conv} parity rel {rel:.2e} pass={ok}")

        # --- within-run A/B: stack ON vs OFF, both via benchmark_inner
        def timed(on):
            r4b = dispatch._STAGED_R4B
            dispatch._STAGED_R4B = on
            try:
                prog._compiled.pop(("inner", 1), None)
                prog._compiled.pop(("inner", 5), None)
                r = prog.benchmark_inner(b, iters=15, repeats=4)
            finally:
                dispatch._STAGED_R4B = r4b
            return r

        r_off = timed(False)
        r_on = timed(True)
        r_off2 = timed(False)
        r_on2 = timed(True)
        off = float(np.median([r_off["latency_s"], r_off2["latency_s"]]))
        on = float(np.median([r_on["latency_s"], r_on2["latency_s"]]))
        results[conv] = {
            "per_layer_us": off * 1e6, "stack_us": on * 1e6,
            "speedup": off / on,
            "runs_us": {"off": [r_off["latency_s"] * 1e6,
                                r_off2["latency_s"] * 1e6],
                        "on": [r_on["latency_s"] * 1e6,
                               r_on2["latency_s"] * 1e6]},
            "resolved": bool(r_on["resolved"] and r_off["resolved"]),
        }
        log(f"{conv}: per-layer {off*1e6:.0f} us vs stack {on*1e6:.0f} us "
            f"-> {off/on:.2f}x")

    results["all_pass"] = all_pass
    out = os.path.join(ROOT, "results_tpu", "mp_stack_ab.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps({c: round(results[c]["speedup"], 3)
                      for c in ("gcn", "gin", "sage")}
                     | {"all_pass": all_pass}))


if __name__ == "__main__":
    main()
