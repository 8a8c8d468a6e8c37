"""Within-run A/B: PNA stack kernel with adjacency-matmul sum/sumsq
(adj_sums=True, round 4b) vs the per-slot VPU accumulation (round 4a).

The hypothesis (block_insitu.json): the stack kernel is VPU-bound in its
W-slot loop; moving sum and sum-of-squares onto the MXU via the shipped
block adjacency removes 3 of the 8 elementwise passes per slot.  Both
arms run in ONE process with the inner-chain protocol — cross-session
drift on this chip is +-25-40% (CLAUDE.md), so only within-run pairs are
trustworthy.  Writes results_tpu/adj_sums_ab.json.
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
    import numpy as np

    from gnnbuilder_tpu.bench.canonical import (
        canonical_batches,
        canonical_model,
    )
    from gnnbuilder_tpu.bench.timing import marginal_time
    from gnnbuilder_tpu.ops.pallas.pna_block import (
        _stack_params,
        fused_pna_block_stack,
    )

    log(f"devices: {jax.devices()}")
    on_tpu = jax.default_backend() == "tpu"
    graphs, batches = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024,
        node_multiple=1024, block_size=128,
    )
    b = batches[0]
    model = canonical_model("pna", "qm9", graphs=graphs)
    # canonical 6-layer stack params at F=128
    import gnnbuilder_tpu as gnnb

    prog = gnnb.Program(model, max_nodes=b.num_nodes, max_edges=b.num_edges,
                        max_graphs=b.num_graphs, block_size=128)
    prog.init_params(b)
    p = prog.params["params"]
    L = model.gnn_num_layers
    layers = []
    for i in range(L):
        q = p[f"gnn_convs_{i}"]
        layers.append((q["pre_nn"]["kernel"], q["pre_nn"]["bias"],
                       q["post_nn"]["kernel"], q["post_nn"]["bias"],
                       q["lin"]["kernel"], q["lin"]["bias"]))
    from gnnbuilder_tpu.ops.pallas.pna_layer import _pad_cols, _rup

    F_p = 128
    stacked = _stack_params(tuple(layers), F_p)
    x0 = _pad_cols(b.node_feat, F_p)
    skips = tuple(False if i in (0, L - 1) else True for i in range(L))

    results = {"meta": {"protocol": "inner-chain k=1/5, within-run",
                        "batch": 1024, "N": b.num_nodes, "layers": L}}

    def run_arm(name, adj_sums):
        def stack(x):
            return fused_pna_block_stack(
                x, b.nbr_nodes, b.in_degree, *stacked,
                deltas=(1.0,) * L, skips=skips, act="relu",
                block_size=128, tile_rows=1024,
                gather_mode="split2", mm="bf16", interpret=not on_tpu,
                block_adj=b.block_adj, adj_sums=adj_sums,
            )

        times = {}
        for k in (1, 5):
            def chain(c, _k=k):
                def body(i, carry):
                    out = stack(x0 + carry * jnp.asarray(1e-12, x0.dtype))
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

    # numerics identical first (same batch, same params)
    o_new = fused_pna_block_stack(
        x0, b.nbr_nodes, b.in_degree, *stacked, deltas=(1.0,) * L,
        skips=skips, act="relu", block_size=128, tile_rows=1024,
        gather_mode="split2", mm="bf16", block_adj=b.block_adj,
        interpret=not on_tpu, adj_sums=True)
    o_old = fused_pna_block_stack(
        x0, b.nbr_nodes, b.in_degree, *stacked, deltas=(1.0,) * L,
        skips=skips, act="relu", block_size=128, tile_rows=1024,
        gather_mode="split2", mm="bf16", block_adj=b.block_adj,
        interpret=not on_tpu, adj_sums=False)
    rel = float(np.max(np.abs(np.asarray(o_new) - np.asarray(o_old)))
                / (np.max(np.abs(np.asarray(o_old))) + 1e-9))
    results["numerics_rel"] = rel
    log(f"adj_sums vs slot-sums numerics rel: {rel:.2e}")

    t_old = run_arm("slot_sums", False)
    t_new = run_arm("adj_sums", True)
    # second pass, reversed order, guards against slow drift inside the run
    t_old2 = run_arm("slot_sums_2", False)
    t_new2 = run_arm("adj_sums_2", True)
    results["speedup"] = {
        "pass1": t_old / t_new,
        "pass2": t_old2 / t_new2,
        "median_old_over_new": float(np.median([t_old, t_old2])
                                     / np.median([t_new, t_new2])),
    }
    out = os.path.join(ROOT, "results_tpu", "adj_sums_ab.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps(results["speedup"]))


if __name__ == "__main__":
    main()
