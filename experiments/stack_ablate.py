"""Stage-by-stage on-chip decomposition of the PNA block-stack kernel.

The stack is 932 of the 970 us canonical b1024 block model
(results_tpu/block_insitu.json round 5) — the whole roofline gap lives
here.  MXU accounting says the stage costs should be roughly
  pre (v,u dots)    2*F*F           =  33k MACs/node/layer
  gather (split2)   2*W*BB*F        = 131k (W=4) .. 262k (W=8)
  slot walk         VPU, should overlap
  ks scaler dot     4F*3F           = 197k
  epilogue dots     2*F*F           =  33k
Ideal bf16 MXU time ~490-650 us for 6 layers at N=20480 — measured 932.
This experiment times the kernel with each stage ablated (the `ablate`
hook in ops/pallas/pna_block.py) under the inner-chain protocol, within
one session, so the difference vs the full kernel attributes the time.

Writes results_tpu/stack_ablate.json.
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

    from gnnbuilder_tpu.bench.canonical import canonical_batches
    from gnnbuilder_tpu.bench.timing import marginal_time
    from gnnbuilder_tpu.ops.pallas.pna_block import fused_pna_block_stack

    log(f"devices: {jax.devices()}")
    bs = int(os.environ.get("ABL_BS", 1024))
    sched = os.environ.get("ABL_SCHED", "v1")
    tr = int(os.environ.get("ABL_TR", "640" if sched == "v4" else "1024"))
    _, batches = canonical_batches(
        "qm9", n_graphs=max(2 * bs, 64), batch_size=bs,
        node_multiple=1024, block_size=128,
    )
    b = batches[0]
    N = b.num_nodes
    F, L = 128, 6
    W = b.nbr_nodes.shape[1]
    log(f"N={N} W={W}")

    rng = np.random.default_rng(0)
    sd = lambda *s: jnp.asarray(
        rng.standard_normal(s).astype(np.float32) * 0.05
    )
    wi, wj = sd(L, F, F), sd(L, F, F)
    bpre = sd(L, 1, F)
    k0, ks = sd(L, F, F), sd(L, 4 * F, 3 * F)
    bpost = sd(L, 1, F)
    wlin, blin = sd(L, F, F), sd(L, 1, F)
    x0 = sd(N, F)
    deltas = tuple([2.5] * L)
    skips = tuple([False] + [True] * (L - 2) + [False])

    results = {"meta": {"bs": bs, "N": N, "W": W, "sched": sched,
                        "tile_rows": tr,
                        "protocol": "inner-chain k=1/5, within-run"}}

    def run_arm(name, **kw):
        def chain(k):
            @jax.jit
            def f(c):
                def body(i, carry):
                    out = fused_pna_block_stack(
                        x0 + carry * jnp.asarray(1e-30, jnp.float32),
                        b.nbr_nodes, b.in_degree,
                        wi, wj, bpre, k0, ks, bpost, wlin, blin,
                        deltas=deltas, skips=skips, act="relu",
                        block_size=128, tile_rows=tr,
                        gather_mode="split2", mm="bf16", sched=sched,
                        block_adj=b.block_adj, **kw,
                    )
                    return jnp.sum(out) * 1e-12
                return jax.lax.fori_loop(0, k, body, c)
            return f

        times = {}
        for k in (1, 5):
            fj = chain(k)
            c = fj(jnp.zeros(()))
            c.block_until_ready()
            carry = {"c": c}

            def call():
                carry["c"] = fj(carry["c"])
                return carry["c"]

            dt = marginal_time(call, n_lo=5, n_hi=25, repeats=4)
            times[k] = dt
        slope = (times[5] - times[1]) / 4
        resolved = slope > 0 and times[5] > 1.25 * times[1]
        us = slope * 1e6 if resolved else times[5] / 5 * 1e6
        results[name] = {"us": us, "resolved": resolved,
                         "times_us": {k: v * 1e6 for k, v in times.items()}}
        log(f"{name}: {us:.1f} us{'' if resolved else ' (UPPER BOUND)'}")
        return us

    full = run_arm("full")
    for stage in ("pre", "gather", "walk", "ks", "epi"):
        t = run_arm(f"no_{stage}", ablate=stage)
        results[f"cost_{stage}_us"] = full - t
        log(f"  -> stage {stage} costs {full - t:.1f} us")

    suffix = "" if sched == "v1" else f"_{sched}"
    out = os.path.join(ROOT, "results_tpu", f"stack_ablate{suffix}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps({k: round(v, 1) for k, v in results.items()
                      if isinstance(v, float)}))


if __name__ == "__main__":
    main()
