"""On-hardware verification of the round-2 session kernels.

Covers what experiments/tpu_verify.py (the original cosim-analog) does
not: window_mode='tile' DMA schedules, the fused GINE layer, the fused
readout (pooling + MLP), the int8 quant epilogues, GAT per-head width
auto-padding, and the fused-kernels-under-halo shard_map path (1-device
mesh — degenerate distribution, real Mosaic compile).  Each check is
fused-vs-XLA on the SAME params/batch on the real chip; structural
breakage (window bugs, miscompiles) shows up as O(1) relative error.

Writes results_tpu/fused_parity_tpu_r2.json.  Run serialized (one TPU
job at a time), nohup, generous timeout — never kill mid-compile.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import numpy as np  # noqa: E402

import gnnbuilder_tpu as gnnb  # noqa: E402
from gnnbuilder_tpu.bench.canonical import (  # noqa: E402
    canonical_batches,
    canonical_model,
)
from gnnbuilder_tpu.ops import dispatch  # noqa: E402

OUT = os.path.join(ROOT, "results_tpu", "fused_parity_tpu_r2.json")


def _masked_rel(got, ref, mask):
    err = float(np.abs((got - ref)[mask]).max())
    scale = float(np.abs(ref[mask]).max())
    return err / max(scale, 1e-9)


def check(report, name, fn, tol=0.05):
    t0 = time.time()
    try:
        rel = fn()
        entry = {"rel": rel, "tol": tol, "pass": bool(rel <= tol),
                 "elapsed_s": round(time.time() - t0, 1)}
    except Exception as e:  # noqa: BLE001
        entry = {"error": f"{type(e).__name__}: {e}", "pass": False,
                 "elapsed_s": round(time.time() - t0, 1)}
    report[name] = entry
    print(f"{name}: {entry}", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    report = {}

    graphs, batches = canonical_batches(
        "qm9", n_graphs=512, batch_size=256, node_multiple=256
    )
    b = batches[0]
    mask = np.asarray(b.graph_mask)

    # 1. window_mode='tile' on the whole-model forward (PNA + GIN)
    for conv in ("pna", "gin"):
        model = canonical_model(conv, "qm9", graphs=graphs)
        params = model.init(jax.random.PRNGKey(0), b)

        def run(conv=conv, model=model, params=params):
            dispatch.set_fused_mode("always")
            try:
                base = np.asarray(jax.jit(model.apply)(params, b))
                dispatch.set_kernel_overrides(window_mode="tile")
                tile = np.asarray(jax.jit(model.apply)(params, b))
            finally:
                dispatch.set_kernel_overrides(window_mode=None)
                dispatch.set_fused_mode("auto")
            return _masked_rel(tile, base, mask)

        # tile vs sub is a pure DMA-schedule change: bit-level agreement
        check(report, f"window_tile_{conv}", run, tol=1e-6)

    # 2. fused GINE layer (fwd, fused vs XLA)
    def run_gine():
        model = gnnb.GNNModel(
            graph_input_feature_dim=11, gnn_hidden_dim=128,
            gnn_num_layers=3, gnn_output_dim=128, gnn_conv="gine",
            pooling_aggrs=("mean",), mlp_out_dim=1,
            conv_kwargs={"edge_dim": b.edge_feat.shape[1]},
        )
        params = model.init(jax.random.PRNGKey(0), b)
        dispatch.set_fused_mode("never")
        ref = np.asarray(jax.jit(model.apply)(params, b))
        dispatch.set_fused_mode("always")
        try:
            got = np.asarray(jax.jit(model.apply)(params, b))
        finally:
            dispatch.set_fused_mode("auto")
        return _masked_rel(got, ref, mask)

    check(report, "gine_layer", run_gine)

    # 3. fused readout (pooling + MLP), canonical add+mean+max model
    def run_readout():
        model = canonical_model("gcn", "qm9", graphs=graphs)
        params = model.init(jax.random.PRNGKey(0), b)
        dispatch.set_fused_mode("never")
        ref = np.asarray(jax.jit(model.apply)(params, b))
        dispatch.set_fused_mode("always")
        try:
            got = np.asarray(jax.jit(model.apply)(params, b))
        finally:
            dispatch.set_fused_mode("auto")
        return _masked_rel(got, ref, mask)

    check(report, "readout", run_readout)

    # 4. int8 quant epilogues: fused-int8 vs XLA-int8 DIRECTLY, same
    #    quantization policy (symmetric per-channel weights, per-row
    #    dynamic activations, ops/quant.py) on both sides.  The paths
    #    share every quant decision up to bf16-scale activation drift
    #    (~1e-3 measured, fused_parity_tpu.json layer rels), so they must
    #    agree to a few quant steps (1/127 ~ 8e-3) — NOT the near-vacuous
    #    tol-2.0 error-ratio-vs-f32 check this replaces.  The f32-golden
    #    errors are still recorded for context (not gated).
    for conv in ("gin", "pna"):
        def run_int8(conv=conv):
            model = canonical_model(conv, "qm9", graphs=graphs)
            kw = dict(max_nodes=b.num_nodes, max_edges=b.num_edges,
                      max_graphs=b.num_graphs)
            pf = gnnb.Program(model, **kw, precision="f32")
            pf.init_params(b)
            dispatch.set_fused_mode("never")
            gold = np.asarray(pf.forward(b))
            pq = gnnb.Program(model, **kw, precision="int8")
            pq.params = pf.params
            ref = np.asarray(pq.forward(b))
            dispatch.set_fused_mode("always")
            try:
                pq2 = gnnb.Program(model, **kw, precision="int8")
                pq2.params = pf.params
                got = np.asarray(pq2.forward(b))
            finally:
                dispatch.set_fused_mode("auto")
            sc = np.abs(gold[mask]).max() + 1e-9
            report[f"int8_{conv}_vs_f32"] = {
                "xla_int8_rel": float(np.abs((ref - gold)[mask]).max() / sc),
                "fused_int8_rel": float(np.abs((got - gold)[mask]).max() / sc),
            }
            return _masked_rel(got, ref, mask)

        check(report, f"int8_{conv}", run_int8, tol=0.02)

    # 5. tile-mode backward gather (training path under the override)
    def run_bwd_tile():
        model = canonical_model("gin", "qm9", graphs=graphs)
        params = model.init(jax.random.PRNGKey(0), b)

        def loss(p):
            out = model.apply(p, b)
            return (out * out).sum()

        dispatch.set_fused_mode("always")
        try:
            g0 = jax.jit(jax.grad(loss))(params)
            dispatch.set_kernel_overrides(window_mode="tile")
            g1 = jax.jit(jax.grad(loss))(params)
        finally:
            dispatch.set_kernel_overrides(window_mode=None)
            dispatch.set_fused_mode("auto")
        worst = 0.0
        for a, r in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
            a, r = np.asarray(a), np.asarray(r)
            worst = max(worst, float(np.abs(a - r).max()
                                     / (np.abs(r).max() + 1e-9)))
        return worst

    check(report, "window_tile_backward_gin", run_bwd_tile, tol=1e-6)

    # 6. GAT per-head width auto-padding: unaligned per-head channels
    #    (H*C % 128 != 0) engage the pad path (gat_layer.py C_p round-up);
    #    fused vs XLA on the same params
    def run_gat_pad():
        model = gnnb.GNNModel(
            graph_input_feature_dim=11, gnn_hidden_dim=192,
            gnn_num_layers=3, gnn_output_dim=192, gnn_conv="gat",
            pooling_aggrs=("mean",), mlp_out_dim=1,
            conv_kwargs={"heads": 4},  # per-head C=48 -> padded to 64
        )
        params = model.init(jax.random.PRNGKey(0), b)
        dispatch.set_fused_mode("never")
        ref = np.asarray(jax.jit(model.apply)(params, b))
        dispatch.set_fused_mode("always")
        try:
            got = np.asarray(jax.jit(model.apply)(params, b))
        finally:
            dispatch.set_fused_mode("auto")
        return _masked_rel(got, ref, mask)

    # tol: BOTH paths run one-pass bf16 projections whose ~0.1 absolute
    # logit drift (measured: results_tpu/gat_bwd_debug.json stats_h1c128)
    # is exp-amplified by the attention softmax each layer — 3 layers at
    # hidden 192 lands ~5e-2 (measured 0.0518), vs ~1e-3 for the 6-layer
    # hidden-128 model in tpu_verify.py whose logits are smaller.  This
    # whole-model check is a seed-dependent bf16-drift CANARY, not the
    # padding-exactness proof (that is gat_pad_exact below), so it gets
    # 2x headroom over the measured point.
    check(report, "gat_head_padding", run_gat_pad, tol=0.1)

    # 6b. padding exactness, isolated: the auto-pad path (C=48 -> C_p=64,
    #     gat_layer.py pad_heads) vs the SAME kernel invoked on manually
    #     zero-extended parameters.  Zero att/value lanes are inert, so
    #     the overlapping lanes must agree bit-exactly — this pins the
    #     pad/slice bookkeeping without any bf16-drift confound.
    def run_gat_pad_exact():
        import jax.numpy as jnp

        from gnnbuilder_tpu.ops.pallas.gat_layer import fused_gat_layer_vjp

        H, C, C_p, Fin = 4, 48, 64, 128
        N = b.num_nodes
        k = jax.random.split(jax.random.PRNGKey(7), 5)
        x = jax.random.normal(k[0], (N, Fin), jnp.float32)
        w = jax.random.normal(k[1], (Fin, H * C), jnp.float32) * 0.1
        a_s = jax.random.normal(k[2], (1, H, C), jnp.float32) * 0.1
        a_d = jax.random.normal(k[3], (1, H, C), jnp.float32) * 0.1
        bias = jax.random.normal(k[4], (H * C,), jnp.float32) * 0.1

        def pad_heads(a):
            lead = a.shape[:-1]
            a3 = a.reshape(*lead, H, C)
            a3 = jnp.pad(a3, [(0, 0)] * (a3.ndim - 1) + [(0, C_p - C)])
            return a3.reshape(*lead, H * C_p)

        # N=4864 is not a 512 multiple: use the 256-row tile the
        # dispatcher would fall back to (supports requires N % TN == 0)
        kw = dict(neg_slope=0.2, self_loops=True, mm="bf16",
                  tile_rows=256, window_slack=64)
        auto = fused_gat_layer_vjp(
            x, b.nbr_nodes, b.in_degree, w, a_s, a_d, bias, H, **kw)
        manual = fused_gat_layer_vjp(
            x, b.nbr_nodes, b.in_degree, pad_heads(w),
            jnp.pad(a_s, ((0, 0), (0, 0), (0, C_p - C))),
            jnp.pad(a_d, ((0, 0), (0, 0), (0, C_p - C))),
            pad_heads(bias), H, **kw)
        manual = np.asarray(manual).reshape(N, H, C_p)[:, :, :C]
        return float(np.abs(np.asarray(auto).reshape(N, H, C)
                            - manual).max())

    check(report, "gat_pad_exact", run_gat_pad_exact, tol=0.0)

    # 7. fused kernels INSIDE shard_map on real Mosaic: a 1-device mesh is
    #    degenerate as a distribution but compiles/executes the per-shard
    #    halo-wrapped layer kernels (parallel/halo.halo_wrap_layer) on chip
    def run_fused_halo():
        import optax

        from gnnbuilder_tpu.parallel.mesh import make_mesh
        from gnnbuilder_tpu.parallel.sharding import shard_batch
        from gnnbuilder_tpu.parallel.train import make_sharded_train_step
        from gnnbuilder_tpu.train import stack_targets

        mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
        model = canonical_model("pna", "qm9", graphs=graphs)
        sb = shard_batch(mesh, b)
        # b holds the first (num_graphs - 1) graphs + the ghost slot
        target = stack_targets(graphs[: sb.num_graphs - 1], sb.num_graphs)
        params = model.init(jax.random.PRNGKey(0), sb)
        opt = optax.adam(1e-3)
        dispatch.set_fused_mode("always")
        try:
            step, init = make_sharded_train_step(
                model, opt, mesh, sb, halo=True, donate=False
            )
            p0, s0 = init(params)
            _, _, floss = step(p0, s0, sb, target)
            floss = float(floss)
            # reference loss: plain (GSPMD, halo=False) path with XLA ops —
            # fully independent of the halo wrapper under test
            dispatch.set_fused_mode("never")
            step2, init2 = make_sharded_train_step(
                model, opt, mesh, sb, halo=False, donate=False
            )
            p1, s1 = init2(params)
            _, _, rloss = step2(p1, s1, sb, target)
            rloss = float(rloss)
        finally:
            dispatch.set_fused_mode("auto")
        return abs(floss - rloss) / max(abs(rloss), 1e-9)

    check(report, "fused_halo_1dev", run_fused_halo)

    # informational entries (e.g. int8_*_vs_f32) carry no "pass" key and
    # must not be counted as failures
    report["all_pass"] = all(
        v["pass"] for v in report.values()
        if isinstance(v, dict) and "pass" in v
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1, default=float)
    print(json.dumps({"all_pass": report["all_pass"],
                      "n_checks": sum(1 for v in report.values()
                                      if isinstance(v, dict))}))


if __name__ == "__main__":
    main()
