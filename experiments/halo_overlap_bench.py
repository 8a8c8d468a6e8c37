"""Overlapped vs sequential halo aggregation — timing on the CPU mesh.

The overlap formulation (parallel/halo.ell_aggregate_sharded
overlap=True) restructures the computation so the bulk reduce has no
data dependence on the boundary ppermutes; on TPU the async
collective-permute then runs in the shadow of the local compute.  This
rig is an 8-virtual-device CPU mesh — collectives are memcpys, so the
upside is bounded — but it bounds the DOWNSIDE honestly: the overlap
form re-reduces 2*halo boundary rows, and this measures that its
end-to-end cost stays at or below the sequential form at realistic
geometry (it must, to be the default).

Writes results_tpu/halo_overlap_bench.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", "")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from gnnbuilder_tpu.core.graph import build_graph_batch
    from gnnbuilder_tpu.data.datasets import load_dataset
    from gnnbuilder_tpu.parallel.halo import ell_aggregate_sharded
    from gnnbuilder_tpu.parallel.mesh import make_mesh

    graphs = load_dataset("qm9", n=2048)
    dp = 8
    batch = build_graph_batch(graphs, node_multiple=dp * 128)
    mesh = make_mesh(dp=dp, tp=1)
    halo = ((batch.max_graph_nodes_static + 7) // 8) * 8
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch.num_nodes, 128)
        ),
        jnp.float32,
    )
    aggs = ("sum", "mean", "max", "min", "std")
    results = {"meta": {"N": batch.num_nodes, "dp": dp, "halo": halo,
                        "F": 128, "aggs": list(aggs),
                        "rig": "8-virtual-device CPU mesh"}}

    fns = {}
    for name, ov in (("sequential", False), ("overlap", True)):
        fn = jax.jit(lambda xx, _ov=ov: ell_aggregate_sharded(
            mesh, xx, batch.nbr_nodes, batch.in_degree, halo, aggs,
            overlap=_ov,
        ))
        fn(x).block_until_ready()  # compile
        fns[name] = fn

    # parity first (the tests pin this too, but keep it in the artifact)
    o1 = np.asarray(fns["sequential"](x))
    o2 = np.asarray(fns["overlap"](x))
    results["max_abs_diff"] = float(np.abs(o1 - o2).max())

    for name, fn in fns.items():
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(x)
            out.block_until_ready()
            ts.append((time.perf_counter() - t0) / 10)
        results[name + "_ms"] = float(np.median(ts) * 1e3)
        print(f"{name}: {results[name + '_ms']:.3f} ms", flush=True)
    results["overlap_vs_sequential"] = (
        results["sequential_ms"] / results["overlap_ms"]
    )
    print(f"ratio (>=1.0 means overlap wins/ties): "
          f"{results['overlap_vs_sequential']:.3f}")

    out_path = os.path.join(ROOT, "results_tpu", "halo_overlap_bench.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
