"""Within-run tuning grid for the PNA block-stack kernel.

Axes: tile height (block_tile_rows cap via set_kernel_overrides) x
precision policy (f32/split2 vs bf16 single-pass gather).  All arms in
one process with the inner-chain protocol (cross-session drift immune).
Writes results_tpu/pna_stack_tune.json.
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
    results = {"meta": {"protocol": "inner-chain, within-run",
                        "batch": 1024}}

    graphs, batches = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024,
        node_multiple=1024, block_size=128,
    )
    bb = batches[0]
    results["meta"]["N"] = bb.num_nodes
    pna = canonical_model("pna", "qm9", graphs=graphs)

    best = (None, 1e9)
    for prec in ("f32", "bf16"):
        for tile in (256, 512, 1024):
            name = f"{prec}_tr{tile}"
            prog = gnnb.Program(
                pna, max_nodes=bb.num_nodes, max_edges=bb.num_edges,
                max_graphs=bb.num_graphs, block_size=128, precision=prec,
            )
            prog.init_params(bb)
            dispatch.set_kernel_overrides(tile_rows=tile)
            try:
                runs = sorted(
                    prog.benchmark_inner(bb, iters=15,
                                         repeats=5)["latency_s"]
                    for _ in range(3)
                )
            except Exception as e:  # noqa: BLE001
                results[name] = {"error": f"{type(e).__name__}: {e}"}
                log(f"{name}: FAILED {type(e).__name__}: {e}")
                continue
            finally:
                dispatch.set_kernel_overrides(tile_rows=None)
            lat = runs[1]
            results[name] = {
                "latency_us": lat * 1e6,
                "graphs_per_s": 1024 / lat,
                "runs_us": [r * 1e6 for r in runs],
            }
            log(f"{name}: {lat*1e6:.0f} us ({1024/lat:,.0f} graphs/s)")
            if lat < best[1]:
                best = (name, lat)

    results["best"] = {"arm": best[0], "latency_us": best[1] * 1e6}
    out = os.path.join(ROOT, "results_tpu", "pna_stack_tune.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps(results["best"]))


if __name__ == "__main__":
    main()
