"""A/B the window DMA schedule (window_mode sub vs tile) on the real chip.

CLAUDE.md probe evidence attributes the fused forward's 34%-of-roofline
gap to a per-sub-tile window-DMA latency floor; window_mode='tile' hoists
that DMA to one per grid step.  This script measures, chained-call
protocol throughout (x = f(x); relay rules in CLAUDE.md):

  1. fused_pna_layer forward, QM9 b1024 canonical batch, F=128:
     {sub, tile} x sub_rows {128, 256} x tile_rows {512, 1024}
  2. fused_mp_layer (gin) forward, same grid
  3. fused_gather_backward (lin-only and PNA 7F stack): {sub, tile}
  4. one tile-mode vs sub-mode NUMERICS check on hardware (bit compare)

Writes results_tpu/window_mode_ab.json and prints a JSON summary line.
Run as a nohup background job; never two TPU jobs at once.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chained_time(f, x0, n_lo=10, n_hi=50, repeats=5):
    from gnnbuilder_tpu.bench.timing import chained_marginal_time

    return chained_marginal_time(f, x0, n_lo=n_lo, n_hi=n_hi,
                                 repeats=repeats)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gnnbuilder_tpu.bench.canonical import canonical_batches
    from gnnbuilder_tpu.ops.pallas.ell_bwd import fused_gather_backward
    from gnnbuilder_tpu.ops.pallas.mp_layer import fused_mp_layer
    from gnnbuilder_tpu.ops.pallas.pna_layer import (
        fused_pna_layer,
        supports,
    )

    log(f"devices: {jax.devices()}")
    on_tpu = jax.default_backend() == "tpu"

    _, batches = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024, node_multiple=512
    )
    b = batches[0]
    N, W = b.nbr_nodes.shape
    F = 128
    maxg = b.max_graph_nodes_static
    slack = ((maxg + 7) // 8) * 8
    log(f"N={N} W={W} F={F} slack={slack}")

    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)
    x = r(N, F)
    pna_p = dict(
        w_pre=r(2 * F, F), b_pre=r(F), k_post=r(F + 12 * F, F),
        b_post=r(F), w_lin=r(F, F), b_lin=r(F),
    )
    gin_p = dict(w0=r(F, F), b0=r(F), w1=r(F, F), b1=r(F), eps=0.15)
    nbr, deg = b.nbr_nodes, b.in_degree.astype(jnp.int32)

    results = {"meta": {"N": N, "W": W, "F": F, "slack": int(slack),
                        "protocol": "chained"}}

    # ---- numerics: tile == sub bitwise on HARDWARE (the cosim analog)
    a0 = fused_pna_layer(x, nbr, deg, **pna_p, delta=2.0, tile_rows=512,
                         window_slack=slack, interpret=not on_tpu,
                         gather_mode="split2", mm="bf16",
                         window_mode="sub")
    a1 = fused_pna_layer(x, nbr, deg, **pna_p, delta=2.0, tile_rows=512,
                         window_slack=slack, interpret=not on_tpu,
                         gather_mode="split2", mm="bf16",
                         window_mode="tile")
    dev = float(jnp.abs(a0 - a1).max())
    log(f"hardware tile-vs-sub PNA dev: {dev}")
    results["numerics_tile_vs_sub_dev"] = dev

    def pna_fn(wm, tn, sr):
        def f(xx):
            return fused_pna_layer(
                xx, nbr, deg, **pna_p, delta=2.0, tile_rows=tn,
                window_slack=slack, interpret=not on_tpu,
                gather_mode="split2", mm="bf16", window_mode=wm,
                sub_rows=sr,
            )
        return jax.jit(f)

    def gin_fn(wm, tn, sr):
        def f(xx):
            return fused_mp_layer(
                xx, nbr, deg, "gin", **gin_p, tile_rows=tn,
                window_slack=slack, interpret=not on_tpu,
                gather_mode="split2", mm="bf16", window_mode=wm,
                sub_rows=sr,
            )
        return jax.jit(f)

    grid = [
        (wm, tn, sr)
        for wm in ("sub", "tile")
        for tn in (512, 1024)
        for sr in (None, 256)
        if N % tn == 0 and supports(N, tn, slack, sr)
    ]
    for name, mk in (("pna_fwd", pna_fn), ("gin_fwd", gin_fn)):
        results[name] = {}
        for wm, tn, sr in grid:
            fj = mk(wm, tn, sr)
            xx = fj(x)  # compile + warm
            dt = chained_time(fj, xx)
            key = f"{wm}_tn{tn}_sr{sr or 128}"
            results[name][key] = dt * 1e6
            log(f"{name} {key}: {dt*1e6:.1f} us")

    # ---- backward gather kernel
    cstk7 = r(N, 7 * F)
    c1 = r(N, F)
    rev, odeg = b.rev_nbr_nodes, b.out_degree.astype(jnp.int32)
    results["bwd"] = {}
    for wm in ("sub", "tile"):
        f7 = jax.jit(lambda c: fused_gather_backward(
            c, rev, odeg, v=x, has_lin=True, has_dev=True, n_cmp=2,
            fwd_gather_mode="split2", tile_rows=512, window_slack=slack,
            interpret=not on_tpu, window_mode=wm,
        ))
        # chain through a 7F-wide tile of the F-wide output; 0.05 scale
        # keeps magnitudes bounded over the chain (timing-neutral, fused)
        st = f7(cstk7)
        g = jax.jit(lambda c: jnp.tile(0.05 * fused_gather_backward(
            c, rev, odeg, v=x, has_lin=True, has_dev=True, n_cmp=2,
            fwd_gather_mode="split2", tile_rows=512, window_slack=slack,
            interpret=not on_tpu, window_mode=wm,
        ), (1, 7)))
        dt = chained_time(g, cstk7, n_lo=8, n_hi=40)
        results["bwd"][f"pna7_{wm}"] = dt * 1e6
        log(f"bwd pna7 {wm}: {dt*1e6:.1f} us")

        g1 = jax.jit(lambda c: 0.25 * fused_gather_backward(
            c, rev, odeg, has_lin=True, tile_rows=512, window_slack=slack,
            interpret=not on_tpu, window_mode=wm,
        ))
        y = g1(c1)
        dt = chained_time(g1, y, n_lo=10, n_hi=50)
        results["bwd"][f"lin_{wm}"] = dt * 1e6
        log(f"bwd lin {wm}: {dt*1e6:.1f} us")

    out_path = os.path.join(ROOT, "results_tpu", "window_mode_ab.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)

    best = {}
    for name in ("pna_fwd", "gin_fwd"):
        k = min(results[name], key=results[name].get)
        best[name] = {"config": k, "us": round(results[name][k], 1)}
    print(json.dumps({"numerics_dev": dev, "best": best,
                      "bwd": {k: round(v, 1)
                              for k, v in results["bwd"].items()}}))


if __name__ == "__main__":
    main()
