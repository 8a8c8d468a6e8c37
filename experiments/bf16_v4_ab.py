"""Within-run A/B: bf16-policy canonical model under v4 vs v1 vs tile 512.

bench_r5's bf16 arm measured 1.58 ms/call (649k graphs/s) — far off the
kernel-level v4 bf16 A/B (~0.65 ms stack).  Same session also showed a
degraded small-call floor (b1 0.70 ms vs 0.27 typical), so this isolates:
is the bf16+v4 MODEL actually slow, or was that arm session noise?

Arms (interleaved, chained-marginal, median of 3):
  v4_tr640   dispatch default (GNNB_STAGED_R5 on)
  v4_tr512   explicit tile override
  v1         staged flag off (round-4 schedule)
  f32_v4     f32 policy for the same-session reference point

Writes results_tpu/bf16_v4_ab.json.
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

    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.bench.canonical import (
        canonical_batches,
        canonical_model,
    )
    from gnnbuilder_tpu.ops import dispatch

    log(f"devices: {jax.devices()}")
    graphs, batches = canonical_batches(
        "qm9", n_graphs=2048, batch_size=1024,
        node_multiple=1024, block_size=128,
    )
    b = batches[0]
    model = canonical_model("pna", "qm9", graphs=graphs)
    results = {"meta": {"bs": 1024, "N": b.num_nodes,
                        "protocol": "chained-marginal, interleaved"}}

    def arm(name, precision, staged_r5=True, tile=None):
        dispatch._STAGED_R5 = staged_r5
        dispatch.set_kernel_overrides(tile_rows=tile)
        try:
            p = gnnb.Program(
                model, max_nodes=b.num_nodes, max_edges=b.num_edges,
                max_graphs=b.num_graphs, precision=precision,
                block_size=128,
            )
            p.init_params(b)
            dt = p.benchmark(b, iters=35, repeats=4)["latency_s"]
        finally:
            dispatch._STAGED_R5 = True
            dispatch.set_kernel_overrides(tile_rows=None)
        results.setdefault(name, []).append(dt * 1e3)
        log(f"{name}: {dt*1e3:.2f} ms/call ({1024/dt:,.0f} g/s)")

    arms = [
        ("bf16_v4_tr640", dict(precision="bf16")),
        ("bf16_v4_tr512", dict(precision="bf16", tile=512)),
        ("bf16_v1", dict(precision="bf16", staged_r5=False)),
        ("f32_v4_tr640", dict(precision="f32")),
    ]
    for rep in range(3):
        for name, kw in arms:
            try:
                arm(name, **kw)
            except Exception as e:  # noqa: BLE001
                results.setdefault(name, []).append(None)
                log(f"{name}: FAILED {type(e).__name__}: {e}")

    out = os.path.join(ROOT, "results_tpu", "bf16_v4_ab.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    import numpy as np

    print(json.dumps({
        k: round(float(np.median([x for x in v if x])), 3)
        for k, v in results.items() if isinstance(v, list)
    }))


if __name__ == "__main__":
    main()
