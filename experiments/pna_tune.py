"""PNA fused-layer knob grid on the real chip — pick the schedule the
dispatcher should default to for the canonical b1024 QM9 shape.

The layer runs at ~180us against a ~64us compute floor (pna_profile.json);
the knobs that move MXU utilization are the node-tile height, the gather
sub-tile height, the gather precision (split2 = 2 passes vs bf16 = 1),
the window DMA granularity, and the packing multiple (which sets which
tile heights divide N).  Grid is small (< 20 compiles); chained protocol,
median-of-5; within-run comparisons only (cross-session relay drift is
±25% at sub-ms, results_tpu/block_model_ab.json history).

Writes results_tpu/pna_tune.json with the winner.
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
    from gnnbuilder_tpu.ops.pallas.pna_layer import (
        fused_pna_layer,
        supports,
    )

    log(f"devices: {jax.devices()}")
    on_tpu = jax.default_backend() == "tpu"
    F = 128
    results = {"meta": {"protocol": "chained, within-run", "F": F}}

    k = jax.random.PRNGKey(1)
    ks = jax.random.split(k, 6)
    w_pre = jax.random.normal(ks[0], (2 * F, F), jnp.float32) * 0.1
    b_pre = jnp.zeros((F,), jnp.float32)
    k_post = jax.random.normal(ks[2], (13 * F, F), jnp.float32) * 0.1
    b_post = jnp.zeros((F,), jnp.float32)
    w_lin = jax.random.normal(ks[4], (F, F), jnp.float32) * 0.1
    b_lin = jnp.zeros((F,), jnp.float32)

    best = None
    for nm in (256, 1024):
        _, batches = canonical_batches(
            "qm9", n_graphs=1100, batch_size=1024, node_multiple=nm
        )
        b = batches[0]
        N = b.num_nodes
        x0 = jax.random.normal(ks[5], (N, F), jnp.float32)
        log(f"--- node_multiple={nm}: N={N}")
        for tr in (128, 256, 512, 1024):
            if N % tr:
                continue
            for sr in (128, 256):
                if tr % sr or sr > tr:
                    continue
                for gm in ("split2", "bf16"):
                    for wm in ("sub", "tile"):
                        if wm == "tile" and sr == tr:
                            continue
                        if not supports(N, tr, 32, sr):
                            continue
                        name = f"nm{nm}_tr{tr}_sr{sr}_{gm}_{wm}"

                        def f(x, _tr=tr, _sr=sr, _gm=gm, _wm=wm):
                            return fused_pna_layer(
                                x, b.nbr_nodes, b.in_degree,
                                w_pre, b_pre, k_post, b_post, w_lin,
                                b_lin, 2.0,
                                tile_rows=_tr, window_slack=32,
                                sub_rows=_sr, gather_mode=_gm,
                                window_mode=_wm, mm="bf16",
                                interpret=not on_tpu,
                            )

                        try:
                            fj = jax.jit(f)
                            x = fj(x0)
                            x.block_until_ready()
                            dt = chained_marginal_time(
                                fj, x, n_lo=8, n_hi=40, repeats=5
                            )
                        except Exception as e:  # noqa: BLE001
                            log(f"{name}: FAILED {type(e).__name__}: "
                                f"{str(e)[:120]}")
                            continue
                        us = dt * 1e6
                        # normalize to per-node cost so different N padding
                        # compares fairly
                        per_node_ns = dt * 1e9 / N
                        log(f"{name}: {us:.1f} us ({per_node_ns:.2f} "
                            "ns/node)")
                        results[name] = {
                            "latency_us": us, "N": N,
                            "per_node_ns": per_node_ns,
                        }
                        if best is None or per_node_ns < best[1]:
                            best = (name, per_node_ns)

    results["winner"] = {"name": best[0], "per_node_ns": best[1]}
    out = os.path.join(ROOT, "results_tpu", "pna_tune.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps(results["winner"]))


if __name__ == "__main__":
    main()
