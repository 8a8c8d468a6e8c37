"""Within-run PNA layer schedule A/B with the inner-chain protocol.

Round-2's window_mode A/B said 'tile' loses; round-3's pna_tune grid said
it wins — both sessions measured single calls, where the per-call
dispatch floor (experiments/dispatch_floor.py) and relay jitter swamp
sub-200us differences.  This decides with k=6 layers chained INSIDE one
jit (the bench-realistic composition — the canonical model runs 6 layers
per dispatch anyway), repeated across TWO interleaved passes so a drift
during the run shows up as disagreement.

Writes results_tpu/pna_sched_ab.json; the winner becomes the dispatch
default for the PNA-family layer schedule if both passes agree.
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
    import jax.numpy as jnp

    from gnnbuilder_tpu.bench.canonical import canonical_batches
    from gnnbuilder_tpu.bench.timing import chained_marginal_time
    from gnnbuilder_tpu.ops.pallas.pna_layer import fused_pna_layer

    log(f"devices: {jax.devices()}")
    on_tpu = jax.default_backend() == "tpu"
    F = 128
    K = 6  # layers per dispatch, like the canonical model

    _, batches = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024, node_multiple=256
    )
    b = batches[0]
    N = b.num_nodes

    k = jax.random.PRNGKey(1)
    ks = jax.random.split(k, 6)
    w_pre = jax.random.normal(ks[0], (2 * F, F), jnp.float32) * 0.05
    b_pre = jnp.zeros((F,), jnp.float32)
    k_post = jax.random.normal(ks[2], (13 * F, F), jnp.float32) * 0.05
    b_post = jnp.zeros((F,), jnp.float32)
    w_lin = jax.random.normal(ks[4], (F, F), jnp.float32) * 0.05
    b_lin = jnp.zeros((F,), jnp.float32)
    x0 = jax.random.normal(ks[5], (N, F), jnp.float32)

    arms = {
        "sub_tr256_sr128_split2": dict(tile_rows=256, sub_rows=128,
                                       window_mode="sub",
                                       gather_mode="split2"),
        "tile_tr256_sr128_split2": dict(tile_rows=256, sub_rows=128,
                                        window_mode="tile",
                                        gather_mode="split2"),
        "sub_tr256_sr128_bf16": dict(tile_rows=256, sub_rows=128,
                                     window_mode="sub",
                                     gather_mode="bf16"),
        "tile_tr256_sr128_bf16": dict(tile_rows=256, sub_rows=128,
                                      window_mode="tile",
                                      gather_mode="bf16"),
        "sub_tr256_sr256_split2": dict(tile_rows=256, sub_rows=256,
                                       window_mode="sub",
                                       gather_mode="split2"),
    }

    def make(armkw):
        def f(x):
            for _ in range(K):
                x = fused_pna_layer(
                    x, b.nbr_nodes, b.in_degree,
                    w_pre, b_pre, k_post, b_post, w_lin, b_lin, 2.0,
                    window_slack=32, mm="bf16", interpret=not on_tpu,
                    **armkw,
                ) * 0.1 + x * 0.01
            return x

        return jax.jit(f)

    fns = {name: make(kw) for name, kw in arms.items()}
    results = {"meta": {"protocol": f"inner-chain K={K}, 2 passes",
                        "N": N}}
    for pas in (1, 2):
        for name, fj in fns.items():
            x = fj(x0)
            x.block_until_ready()
            dt = chained_marginal_time(fj, x, n_lo=4, n_hi=16, repeats=5)
            per_layer = dt * 1e6 / K
            results.setdefault(name, {})[f"pass{pas}_us_per_layer"] = (
                per_layer
            )
            log(f"pass{pas} {name}: {per_layer:.1f} us/layer")

    for name in arms:
        r = results[name]
        r["mean_us_per_layer"] = (
            r["pass1_us_per_layer"] + r["pass2_us_per_layer"]
        ) / 2
    winner = min(arms, key=lambda n: results[n]["mean_us_per_layer"])
    # agreement check: both passes must rank the winner first
    agree = all(
        results[winner][f"pass{p}_us_per_layer"]
        <= min(results[n][f"pass{p}_us_per_layer"] for n in arms) + 1e-9
        for p in (1, 2)
    )
    results["winner"] = {"name": winner, "both_passes_agree": agree,
                         "us_per_layer":
                             results[winner]["mean_us_per_layer"]}
    out = os.path.join(ROOT, "results_tpu", "pna_sched_ab.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps(results["winner"]))


if __name__ == "__main__":
    main()
