"""On-hardware verification artifact — the cosim analog.

The reference proves RTL==C with Vitis cosimulation (run_hls_cosim.tcl);
the TPU counterpart is proving real-Mosaic kernels == the XLA ops on the
actual chip (interpret-mode CPU tests cannot catch Mosaic-specific hazards:
one-pass bf16 matmul defaults, DMA alignment, layout bugs).  This script
runs on the TPU and writes ``results_tpu/fused_parity_tpu.json``:

1. aggregation-kernel parity: fused_ell_aggregate vs the XLA ELL ops at
   every gather mode (split2 / bf16 / highest) — split2 and highest must
   be tight (the gather is exact by construction; only reduction order
   differs), bf16 is the relaxed policy mode;
2. whole-layer parity per conv: forward under fused dispatch vs the XLA
   path ON THE SAME CHIP.  The fused layers run one-pass bf16 epilogue
   matmuls (the XLA default contract on TPU), so layer outputs agree to
   bf16-rounding scale (~1e-2 relative), not f32 scale — recorded as-is;
3. backward parity on real Mosaic: whole-model gradients through the
   hand-written reverse-table Pallas backward (ops/pallas/ell_bwd.py)
   vs the XLA backward ("never" dispatch), per conv — this is where the
   in-kernel bf16 hi/lo idempotency and exact-compare contracts face the
   actual hardware rounding instead of interpret-mode emulation.

Run:  python experiments/tpu_verify.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.bench.canonical import canonical_batches, canonical_model
from gnnbuilder_tpu.ops import dispatch, ell
from gnnbuilder_tpu.ops.pallas.ell_agg import fused_ell_aggregate

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_tpu", "fused_parity_tpu.json")

AGGS = ("max", "min", "mean", "std")


def agg_kernel_parity(report):
    graphs, batches = canonical_batches("qm9", n_graphs=512, batch_size=256,
                                        node_multiple=256)
    b = batches[0]
    N, F = b.num_nodes, 128
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
    table = u[:, None, :] + ell.ell_gather(v, b.nbr_nodes)
    mask = ell.ell_mask(b.nbr_nodes, b.in_degree)
    d = ell.ell_multi_table(table, b.in_degree, AGGS, mask)
    ref = np.asarray(jnp.concatenate([d[a] for a in AGGS], -1))
    for mode, tol in (("split2", 5e-4), ("highest", 5e-4), ("bf16", 5e-2)):
        t0 = time.time()
        got = np.asarray(fused_ell_aggregate(
            v, b.nbr_nodes, b.in_degree, AGGS, u=u,
            tile_rows=256, window_slack=32, gather_mode=mode,
        ))
        err = float(np.abs(got - ref).max())
        report["agg_kernel"][mode] = {
            "max_abs_err": err, "tol": tol, "pass": bool(err <= tol),
            "compile_s": round(time.time() - t0, 1),
        }
        print(f"agg {mode}: max_abs={err:.2e} (tol {tol}) "
              f"{'PASS' if err <= tol else 'FAIL'}", flush=True)


def layer_parity(report):
    for conv in ("pna", "gin", "sage", "gcn", "gat"):
        graphs, batches = canonical_batches(
            "qm9", n_graphs=512, batch_size=256, node_multiple=256,
        )
        b = batches[0]
        model = canonical_model(conv, "qm9", graphs=graphs)
        params = model.init(jax.random.PRNGKey(0), b)

        dispatch.set_fused_mode("never")
        ref = np.asarray(jax.jit(model.apply)(params, b))
        dispatch.set_fused_mode("auto")  # fused on TPU
        t0 = time.time()
        got = np.asarray(jax.jit(model.apply)(params, b))
        dt = time.time() - t0
        mask = np.asarray(b.graph_mask)
        err = float(np.abs((got - ref)[mask]).max())
        scale = float(np.abs(ref[mask]).max())
        rel = err / max(scale, 1e-9)
        # layer epilogues are one-pass bf16 on TPU (XLA's own default);
        # agreement is bf16-rounding scale through 6 layers
        tol_rel = 0.05
        report["layer"][conv] = {
            "max_abs_err": err, "ref_scale": scale, "rel": rel,
            "tol_rel": tol_rel, "pass": bool(rel <= tol_rel),
            "compile_s": round(dt, 1),
        }
        print(f"layer {conv}: abs={err:.3e} rel={rel:.3e} "
              f"{'PASS' if rel <= tol_rel else 'FAIL'}", flush=True)


def backward_parity(report):
    """Whole-model grads: fused fwd + Pallas bwd vs the all-XLA backward,
    on the chip.  Layer forwards under fused dispatch use one-pass bf16
    epilogues, so gradient agreement is bf16-chain scale (like the layer
    forward check), not f32 scale; what this catches is STRUCTURAL
    breakage (mis-routed extrema, broken compares, window bugs) which
    shows up as O(1) relative error, far above tolerance."""
    for conv in ("pna", "gin", "sage", "gcn", "gat"):
        graphs, batches = canonical_batches(
            "qm9", n_graphs=512, batch_size=256, node_multiple=256,
        )
        b = batches[0]
        model = canonical_model(conv, "qm9", graphs=graphs)
        params = model.init(jax.random.PRNGKey(0), b)

        def loss(p):
            out = model.apply(p, b)
            return (out * out).sum()

        dispatch.set_fused_mode("never")
        g_ref = jax.jit(jax.grad(loss))(params)
        dispatch.set_fused_mode("auto")
        t0 = time.time()
        g_fused = jax.jit(jax.grad(loss))(params)
        dt = time.time() - t0
        # per-leaf relative error, with the denominator floored at 1e-3 of
        # the model's global gradient scale: leaves whose true gradient is
        # analytically near-zero cannot be resolved by EITHER bf16 path.
        # Concretely, GAT's att_dst grad is exactly zero up to leaky-relu
        # kinks (softmax is invariant to the uniform per-receiver a_dst
        # logit shift); layer-4's true max is 1.4e-6 vs bias grads at 0.5
        # (CPU f32, results_tpu/gat_bwd_debug.json), so an absolute error
        # of 2e-6 — far below every other leaf's bf16 noise — showed up as
        # rel=1.7 under the unfloored metric.
        leaves_f = jax.tree.leaves(g_fused)
        leaves_r = [np.asarray(r) for r in jax.tree.leaves(g_ref)]
        # 1e-9 absolute epsilon keeps the all-zero-gradient degenerate
        # case (gmax == 0) a clean pass instead of a nan
        gmax = float(max(np.abs(r).max() for r in leaves_r))
        worst = 0.0
        floored = []  # keep small-leaf errors visible despite the floor
        for i, (a, r) in enumerate(zip(leaves_f, leaves_r)):
            a = np.asarray(a)
            ref_scale = float(np.abs(r).max())
            abs_err = float(np.abs(a - r).max())
            denom = max(ref_scale, 1e-3 * gmax, 1e-9)
            if ref_scale < denom:
                floored.append({
                    "leaf": i, "abs_err": abs_err, "ref_scale": ref_scale,
                })
            worst = max(worst, abs_err / denom)
        tol_rel = 0.05
        report["backward"][conv] = {
            "worst_param_rel": worst, "tol_rel": tol_rel,
            "pass": bool(worst <= tol_rel), "compile_s": round(dt, 1),
            "floored_leaves": floored,
        }
        print(f"backward {conv}: worst rel={worst:.3e} "
              f"{'PASS' if worst <= tol_rel else 'FAIL'}", flush=True)


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    report = {
        "device": str(jax.devices()[0]),
        "jax": jax.__version__,
        "agg_kernel": {},
        "layer": {},
        "backward": {},
    }
    agg_kernel_parity(report)
    layer_parity(report)
    backward_parity(report)
    report["all_pass"] = all(
        v["pass"] for sec in ("agg_kernel", "layer", "backward")
        for v in report[sec].values()
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1, default=float)
    print("wrote", OUT, "all_pass =", report["all_pass"])


if __name__ == "__main__":
    main()
