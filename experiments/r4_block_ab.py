"""Within-run A/Bs for the round-4 block-local inference kernels.

All arms run in ONE process with the inner-chain protocol
(Program.benchmark_inner — the ~0.1 ms host-issue floor cancelled), so
the comparisons are immune to the ±25-40% cross-session relay drift
(CLAUDE.md: only within-run pairs are trustworthy).

Arms (canonical 6-layer models, qm9 b1024):
  pna_std_windowed   — standard packing (nm256), per-layer fused windowed
                       kernels (the round-3 configuration)
  pna_block_stack    — block packing (nm1024), the whole-STACK kernel
  gat_block_windowed — block packing, fused windowed GAT kernel
  gat_block_kernel   — block packing, fused block-dense attention
  edge_block_ell     — block packing, ELL XLA path (round-3 EdgeConv)
  edge_block_kernel  — block packing, fused block-local EdgeConv

graphs/s uses REAL graph counts, so block-packing's ~8% node overhead is
priced into its own arm.  Writes results_tpu/r4_block_ab.json.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.bench.canonical import (
        canonical_batches,
        canonical_model,
    )
    from gnnbuilder_tpu.ops import dispatch

    log(f"devices: {jax.devices()}")
    results = {"meta": {
        "protocol": "inner-chain (benchmark_inner, k=1/5), within-run",
        "batch": 1024,
    }}

    graphs_s, std_batches = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024, node_multiple=256,
    )
    bs_std = std_batches[0]
    graphs_b, blk_batches = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024,
        node_multiple=1024, block_size=128,
    )
    bb = blk_batches[0]
    results["meta"]["N_std"] = bs_std.num_nodes
    results["meta"]["N_block"] = bb.num_nodes

    saved_r4 = dispatch._STAGED_R4

    def arm(name, model, batch, block_size, stack: bool, repeats=3):
        prog = gnnb.Program(
            model, max_nodes=batch.num_nodes, max_edges=batch.num_edges,
            max_graphs=batch.num_graphs, block_size=block_size,
        )
        prog.init_params(batch)
        dispatch._STAGED_R4 = stack
        try:
            runs = sorted(
                (prog.benchmark_inner(batch, iters=15, repeats=5)
                 for _ in range(repeats)),
                key=lambda r: r["latency_s"],
            )
            r = runs[repeats // 2]
        finally:
            dispatch._STAGED_R4 = saved_r4
        results[name] = {
            "latency_us": r["latency_s"] * 1e6,
            "overhead_us": r["overhead_s"] * 1e6,
            "graphs_per_s": r["graphs_per_s"],
            "resolved": r["resolved"],
            "runs_us": [x["latency_s"] * 1e6 for x in runs],
        }
        log(f"{name}: {r['latency_s']*1e6:.0f} us "
            f"({r['graphs_per_s']:,.0f} graphs/s, "
            f"resolved={r['resolved']})")
        return r

    pna = canonical_model("pna", "qm9", graphs=graphs_s)
    a = arm("pna_std_windowed", pna, bs_std, 0, stack=False)
    b = arm("pna_block_stack", pna, bb, 128, stack=True)
    results["pna_stack_speedup"] = a["latency_s"] / b["latency_s"]
    log(f"PNA stack speedup: {results['pna_stack_speedup']:.2f}x")

    gat = canonical_model("gat", "qm9", graphs=graphs_b)
    a = arm("gat_block_windowed", gat, bb, 128, stack=False)
    b = arm("gat_block_kernel", gat, bb, 128, stack=True)
    results["gat_block_speedup"] = a["latency_s"] / b["latency_s"]
    log(f"GAT block-attention speedup: "
        f"{results['gat_block_speedup']:.2f}x")

    edge = canonical_model("edge", "qm9", graphs=graphs_b)
    a = arm("edge_block_ell", edge, bb, 128, stack=False)
    b = arm("edge_block_kernel", edge, bb, 128, stack=True)
    results["edge_block_speedup"] = a["latency_s"] / b["latency_s"]
    log(f"EdgeConv block-kernel speedup: "
        f"{results['edge_block_speedup']:.2f}x")

    out = os.path.join(ROOT, "results_tpu", "r4_block_ab.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps({
        k: round(v, 2) for k, v in results.items()
        if k.endswith("_speedup")
    }))


if __name__ == "__main__":
    main()
