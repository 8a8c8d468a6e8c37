"""Within-run A/B: scatter-based segment_max vs contiguous gather-window
max (round 4 — block_insitu.json found XLA's scatter-max costs 219 us of
the 243 us readout at b1024 block128, vs a ~13 us memory floor).

Arms (inner-chain k=1/5, same process):
  scatter_max     jax.ops.segment_max on [N, F]
  contiguous_max  segment.contiguous_segment_max (gather [G, maxg, F])
  model           whole canonical PNA/QM9 forward (now dispatching the
                  contiguous max inside the fused-readout feed)

Writes results_tpu/segmax_ab.json.
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
    import jax.numpy as jnp

    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.bench.canonical import (
        canonical_batches,
        canonical_model,
    )
    from gnnbuilder_tpu.bench.timing import marginal_time
    from gnnbuilder_tpu.ops import segment

    log(f"devices: {jax.devices()}")
    graphs, batches = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024,
        node_multiple=1024, block_size=128,
    )
    b = batches[0]
    x0 = jax.random.normal(jax.random.PRNGKey(0), (b.num_nodes, 128),
                           jnp.float32)
    results = {"meta": {"protocol": "inner-chain k=1/5, within-run",
                        "batch": 1024, "N": b.num_nodes,
                        "maxg": b.max_graph_nodes_static}}

    def time_fn(name, fn):
        times = {}
        for k in (1, 5):
            def chain(c, _k=k):
                def body(i, carry):
                    out = fn(x0 + carry * jnp.asarray(1e-12, x0.dtype))
                    return jnp.sum(out.astype(jnp.float32))
                return jax.lax.fori_loop(0, _k, body, c)

            fj = jax.jit(chain)
            c = fj(jnp.zeros(()))
            c.block_until_ready()
            carry = {"c": c}

            def call():
                carry["c"] = fj(carry["c"])
                return carry["c"]

            dt = marginal_time(call, n_lo=5, n_hi=25, repeats=4)
            if dt * 20 < 2e-3:
                dt = marginal_time(call, n_lo=40, n_hi=200, repeats=4)
            times[k] = dt
        slope = (times[5] - times[1]) / 4
        resolved = slope > 0 and times[5] > 1.25 * times[1]
        us = slope * 1e6 if resolved else times[5] / 5 * 1e6
        results[name] = {"us": us, "resolved": resolved}
        log(f"{name}: {us:.1f} us{'' if resolved else ' (UPPER BOUND)'}")
        return us

    cnt = b.n_node.astype(jnp.float32)[:, None]
    t_sc = time_fn("scatter_max", lambda v: segment.segment_max(
        v, b.node_graph, b.num_graphs, count=cnt))
    t_ct = time_fn("contiguous_max", lambda v:
                   segment.contiguous_segment_max(
                       v, b.graph_starts, b.n_node,
                       b.max_graph_nodes_static))
    results["speedup"] = t_sc / t_ct

    # whole model with the new path live
    model = canonical_model("pna", "qm9", graphs=graphs)
    prog = gnnb.Program(model, max_nodes=b.num_nodes, max_edges=b.num_edges,
                        max_graphs=b.num_graphs, block_size=128)
    prog.init_params(b)
    bench = prog.benchmark_inner(b, iters=20, repeats=4)
    results["model"] = {"us": bench["latency_s"] * 1e6,
                        "resolved": bench["resolved"],
                        "graphs_per_s": bench["graphs_per_s"]}
    log(f"model: {bench['latency_s']*1e6:.1f} us "
        f"({bench['graphs_per_s']:,.0f} graphs/s)")

    out = os.path.join(ROOT, "results_tpu", "segmax_ab.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps({"scatter_us": round(t_sc, 1),
                      "contiguous_us": round(t_ct, 1),
                      "speedup": round(t_sc / t_ct, 2),
                      "model_us": round(bench["latency_s"] * 1e6, 1)}))


if __name__ == "__main__":
    main()
