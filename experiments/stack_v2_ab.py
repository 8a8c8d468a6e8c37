"""Within-run A/B: PNA stack kernel sched v1 vs v2 (round 5).

v2 = hoisted layer-invariant one-hot scratch + fused split2 hi/lo gather
dot + bf16 agg scratch.  The round-5 ablation (stack_ablate.json)
attributed 359 us of the 846 us stack to the gather stage (2.2x its MXU
ideal) — v2 attacks exactly that.  Arms run interleaved (ABAB) in one
session; inner-chain protocol.  Also probes tile_rows=2048 for v2.

Writes results_tpu/stack_v2_ab.json.
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
    bs = int(os.environ.get("AB_BS", 1024))
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
    weights = (sd(L, F, F), sd(L, F, F), sd(L, 1, F), sd(L, F, F),
               sd(L, 4 * F, 3 * F), sd(L, 1, F), sd(L, F, F), sd(L, 1, F))
    x0 = sd(N, F)
    deltas = tuple([2.5] * L)
    skips = tuple([False] + [True] * (L - 2) + [False])

    results = {"meta": {"bs": bs, "N": N, "W": W,
                        "protocol": "inner-chain k=1/5, interleaved ABAB"}}

    def make_arm(name, gather_mode, mm, sched, tile_rows=1024,
                 ablate=None):
        def chain(k):
            @jax.jit
            def f(c):
                def body(i, carry):
                    out = fused_pna_block_stack(
                        x0 + carry * jnp.asarray(1e-30, jnp.float32),
                        b.nbr_nodes, b.in_degree, *weights,
                        deltas=deltas, skips=skips, act="relu",
                        block_size=128, tile_rows=tile_rows,
                        gather_mode=gather_mode, mm=mm, sched=sched,
                        block_adj=b.block_adj, ablate=ablate,
                    )
                    return jnp.sum(out) * 1e-12
                return jax.lax.fori_loop(0, k, body, c)
            return f

        def measure():
            times = {}
            for k in (1, 5):
                fj = chain(k)
                c = fj(jnp.zeros(()))
                c.block_until_ready()
                carry = {"c": c}

                def call():
                    carry["c"] = fj(carry["c"])
                    return carry["c"]

                times[k] = marginal_time(call, n_lo=5, n_hi=25, repeats=4)
            slope = (times[5] - times[1]) / 4
            resolved = slope > 0 and times[5] > 1.25 * times[1]
            return (slope if resolved else times[5] / 5) * 1e6, resolved

        return name, measure

    arm_spec = os.environ.get("AB_ARMS", "")
    if arm_spec:
        # "name:gather:mm:sched:tr[:ablate+stages]" comma-separated
        arms = []
        for a in arm_spec.split(","):
            parts = a.split(":")
            nm, gm, mm, sc, tr = parts[:5]
            abl = parts[5].replace("+", ",") if len(parts) > 5 else None
            arms.append(make_arm(nm, gm, mm, sc, tile_rows=int(tr),
                                 ablate=abl))
    else:
        arms = [
            make_arm("v1_split2", "split2", "bf16", "v1"),
            make_arm("v2_split2", "split2", "bf16", "v2"),
            make_arm("v1_bf16", "bf16", "bf16", "v1"),
            make_arm("v2_bf16", "bf16", "bf16", "v2"),
            make_arm("v2_split2_tr2048", "split2", "bf16", "v2",
                     tile_rows=2048),
        ]
    # interleaved passes per arm
    for rep in range(int(os.environ.get("AB_REPS", 2))):
        for name, measure in arms:
            try:
                us, resolved = measure()
            except Exception as e:  # noqa: BLE001 — e.g. tr2048 VMEM blow
                results.setdefault(name, {}).setdefault("error", str(e))
                log(f"{name}: FAILED {type(e).__name__}: {e}")
                continue
            results.setdefault(name, {}).setdefault("us", []).append(us)
            results[name].setdefault("resolved", []).append(resolved)
            log(f"{name} pass{rep}: {us:.1f} us"
                f"{'' if resolved else ' (UPPER BOUND)'}")

    for a, base in (("v2_split2", "v1_split2"), ("v2_bf16", "v1_bf16")):
        if "us" in results.get(a, {}) and "us" in results.get(base, {}):
            sp = (np.mean(results[base]["us"])
                  / np.mean(results[a]["us"]))
            results[f"speedup_{a}"] = float(sp)
            log(f"{a} speedup vs {base}: {sp:.2f}x")

    out = os.path.join(
        ROOT, "results_tpu",
        "stack_v2_ab.json" if not arm_spec
        else os.environ.get("AB_OUT", "stack_tr_ab.json"),
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps({k: v for k, v in results.items()
                      if k.startswith("speedup")}))


if __name__ == "__main__":
    main()
