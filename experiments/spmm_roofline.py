"""SpMM fraction-of-roofline measurement (the BASELINE.json kernel target).

BASELINE.md: "PNA on QM9: SpMM at >=90% of roofline edges/s per chip."
The SpMM proper is the neighbor aggregation — sum_j A[i,j] * v[j] — which
this framework runs as the count-SpMM inside the fused layer kernels
(ops/pallas/mp_layer.py) and as the multi-aggregate gather kernel
(ops/pallas/ell_agg.py).  This probe times those kernels standalone on the
real chip over the canonical QM9 b1024 batch and reports each against its
information-theoretic roofline (bench/roofline.py): read v + tables once,
write the output once; compute = the count-matrix matmul realization.

The full-model number in bench.py divides by a 6-layer roofline that is
dominated by PNA's 4-aggregator gather realization and epilogue matmuls —
a different (and much stricter) ratio than the SpMM target.

Writes results_tpu/spmm_roofline.json and prints one JSON line.
Chained-call protocol throughout (x = f(x); CLAUDE.md relay rules) via a
stateful closure under bench/timing.marginal_time, the same pattern as
bench.py's train-step measurement.
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
    from gnnbuilder_tpu.bench.roofline import chip_peaks, roofline_report
    from gnnbuilder_tpu.ops.pallas.ell_agg import fused_ell_aggregate
    from gnnbuilder_tpu.ops.pallas.mp_layer import fused_mp_layer

    log(f"devices: {jax.devices()}")
    on_tpu = jax.default_backend() == "tpu"

    _, batches = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024, node_multiple=256
    )
    b = batches[0]
    N, W = b.nbr_nodes.shape
    F = 128
    real_edges = int(np.asarray(b.edge_mask).sum())
    maxg = b.max_graph_nodes_static
    slack = ((maxg + 7) // 8) * 8
    log(f"N={N} W={W} F={F} edges={real_edges} slack={slack}")

    peak_flops, peak_bw = chip_peaks()
    v0 = jax.random.normal(jax.random.PRNGKey(0), (N, F), jnp.float32)
    nbr = b.nbr_nodes
    deg = b.in_degree.astype(jnp.int32)
    bias = jnp.zeros((F,), jnp.float32)

    results = {}

    # --- count-SpMM (sum aggregation) via the fused gcn layer kernel:
    # out = rsqrt(deg+1) * (A @ v + v) + 0 — the SpMM plus a free epilogue.
    # Same [N, F] shape in and out, so calls chain (x = f(x)).
    # traffic: v read + out write ([N,F] f32 each), stacked ids [N*W] i32,
    # degree [N] i32
    min_bytes = N * F * 4 * 2 + N * W * 4 + N * 4
    best = None
    for tn in (256, 512, 1024):
        if N % tn:
            continue

        def f(x, _tn=tn):
            return fused_mp_layer(
                x, nbr, deg, "gcn", b0=bias,
                tile_rows=_tn, window_slack=slack,
                interpret=not on_tpu, gather_mode="split2", mm="bf16",
            )

        fj = jax.jit(f)
        x = fj(v0)  # compile + warm
        dt = chained_time(fj, x, n_lo=10, n_hi=60, repeats=5)
        # compute: two bf16 passes of the count matrix [TNS, TWS] @ [TWS, F]
        # per sub-tile (TNS = 128 under sub-tiling) -> 2 * TWS * F MACs/node
        tns = 128 if tn % 128 == 0 else tn
        tws = tns + 2 * slack
        flops = N * 2 * tws * F * 2
        rep = roofline_report(dt, flops=flops, min_bytes=min_bytes,
                              num_edges=real_edges)
        log(f"count-SpMM tn={tn}: {dt*1e6:.1f} us, "
            f"{rep['fraction_of_roofline']*100:.0f}% of "
            f"{rep['bound']}-bound roofline, "
            f"{rep['edges_per_s']/1e6:,.0f}M edges/s")
        if best is None or dt < best[1]:
            best = (tn, dt, rep)
    results["count_spmm"] = {
        "tile_rows": best[0],
        "latency_us": best[1] * 1e6,
        **{k: best[2][k] for k in (
            "fraction_of_roofline", "bound", "edges_per_s",
            "roofline_edges_per_s")},
    }

    # --- multi-aggregate gather kernel (PNA's 4-aggregator SpMM analog):
    # realizes the per-slot table; output [N, 4F], chained through a slice.
    def agg4(x):
        out = fused_ell_aggregate(
            x, nbr, deg, ("max", "min", "mean", "std"),
            tile_rows=256, window_slack=slack,
            interpret=not on_tpu, gather_mode="split2",
        )
        return out[:, 2 * F : 3 * F]  # mean block keeps the chain honest

    f4 = jax.jit(agg4)
    x = f4(v0)
    dt4 = chained_time(f4, x, n_lo=8, n_hi=40, repeats=5)
    tw = 256 + 2 * slack
    flops4 = N * W * tw * F * 2 * 2  # split2 = 2 passes
    min_bytes4 = N * F * 4 + N * 4 * F * 4 + N * W * 4 + N * 4
    rep4 = roofline_report(dt4, flops=flops4, min_bytes=min_bytes4,
                           num_edges=real_edges)
    log(f"4-agg gather: {dt4*1e6:.1f} us, "
        f"{rep4['fraction_of_roofline']*100:.0f}% of {rep4['bound']}-bound "
        f"roofline, {rep4['edges_per_s']/1e6:,.0f}M edges/s")
    results["multi_aggregate"] = {
        "latency_us": dt4 * 1e6,
        **{k: rep4[k] for k in (
            "fraction_of_roofline", "bound", "edges_per_s",
            "roofline_edges_per_s")},
    }

    # --- round-3 block-diagonal arms: the count-SpMM as ONE batched MXU
    # matmul over the bin-packed dense block adjacency (no gather at all).
    # Roofline includes the A traffic (bf16 blocks) alongside v + out.
    from gnnbuilder_tpu.bench.canonical import canonical_batches as _cb
    from gnnbuilder_tpu.ops.block import block_spmm
    from gnnbuilder_tpu.ops.pallas.mp_layer import (
        block_tile_rows,
        fused_mp_layer,
    )

    _, bb_batches = _cb("qm9", n_graphs=1100, batch_size=1024,
                        node_multiple=1024, block_size=128)
    bb = bb_batches[0]
    Nb = bb.num_nodes
    BB = 128
    real_edges_b = int(np.asarray(bb.edge_mask).sum())
    vb0 = jax.random.normal(jax.random.PRNGKey(0), (Nb, F), jnp.float32)
    adj_bytes = (Nb // BB) * BB * BB * 2  # bf16 blocks
    min_bytes_b = Nb * F * 4 * 2 + adj_bytes

    for name, fn in (
        ("block_spmm_xla", jax.jit(
            lambda x: block_spmm(bb.block_adj, x, mm="split2"))),
        ("block_spmm_kernel", jax.jit(
            lambda x: fused_mp_layer(
                x, None, bb.in_degree, "simple_sum",
                tile_rows=block_tile_rows(Nb, BB),
                interpret=not on_tpu, gather_mode="split2", mm="bf16",
                block_adj=bb.block_adj,
            ))),
    ):
        x = fn(vb0)
        dtb = chained_time(fn, x, n_lo=10, n_hi=60, repeats=5)
        flops_b = Nb * 2 * BB * F * 2  # split2 = 2 bf16 passes
        repb = roofline_report(dtb, flops=flops_b, min_bytes=min_bytes_b,
                               num_edges=real_edges_b)
        log(f"{name}: {dtb*1e6:.1f} us, "
            f"{repb['fraction_of_roofline']*100:.0f}% of "
            f"{repb['bound']}-bound roofline, "
            f"{repb['edges_per_s']/1e6:,.0f}M edges/s")
        results[name] = {
            "latency_us": dtb * 1e6,
            **{k: repb[k] for k in (
                "fraction_of_roofline", "bound", "edges_per_s",
                "roofline_edges_per_s")},
        }

    # --- inner-chain arms (k SpMMs inside ONE executable, sequential data
    # dependency): per-op marginal time with the ~0.1 ms host-issue floor
    # fitted OUT (experiments/dispatch_floor.py).  This is the number a
    # real multi-layer model pays per aggregation — XLA keeps the chain
    # state in VMEM, so per-op HBM traffic can drop below the single-pass
    # floor (only the adjacency re-streams).  Reported against BOTH
    # accountings: single-pass (v read + out write + A) and streaming
    # (A only).
    def inner(fn_one, k):
        def f(x):
            for _ in range(k):
                x = fn_one(x) * 0.1 + x * 0.01
            return x

        return jax.jit(f)

    for name, one in (
        ("block_spmm_xla_chain", lambda x: block_spmm(
            bb.block_adj, x, mm="split2")),
        ("block_spmm_kernel_chain", lambda x: fused_mp_layer(
            x, None, bb.in_degree, "simple_sum",
            tile_rows=block_tile_rows(Nb, BB),
            interpret=not on_tpu, gather_mode="split2", mm="bf16",
            block_adj=bb.block_adj)),
    ):
        times = {}
        for k in (1, 2, 4, 8):
            fj = inner(one, k)
            x = fj(vb0)
            x.block_until_ready()
            times[k] = chained_time(fj, x, n_lo=6, n_hi=30, repeats=5)
        kk = np.array(sorted(times))
        tt = np.array([times[int(i)] for i in kk])
        slope, intercept = np.polyfit(kk, tt, 1)
        per_op = max(float(slope), 1e-9)
        floor_single = min_bytes_b / peak_bw
        floor_stream = adj_bytes / peak_bw
        # degenerate fit: if the k=8 total never cleared the per-call
        # host-issue floor (times flat in k), the slope measures noise —
        # the device is FASTER than the host can observe at this depth.
        # Mark unresolved; never report an infinite fraction.
        resolved = (
            float(tt[-1]) > 1.5 * float(tt[0])
            and per_op * 8 > 0.2 * max(float(intercept), 1e-9)
        )
        results[name] = {
            "per_op_us": per_op * 1e6,
            "per_call_overhead_us": float(intercept) * 1e6,
            "times_us": {str(int(i)): float(times[int(i)]) * 1e6
                         for i in kk},
            "resolved": bool(resolved),
        }
        if resolved:
            results[name].update(
                edges_per_s=real_edges_b / per_op,
                fraction_of_single_pass_roofline=floor_single / per_op,
                fraction_of_streaming_roofline=floor_stream / per_op,
            )
            log(f"{name}: per-op {per_op*1e6:.1f} us "
                f"({real_edges_b/per_op/1e6:,.0f}M edges/s; "
                f"{floor_single/per_op*100:.0f}% of single-pass / "
                f"{floor_stream/per_op*100:.0f}% of streaming roofline)")
        else:
            results[name]["note"] = (
                "total device time below the host-issue floor at k=8 — "
                "per-op time unresolvable from here (i.e. faster than "
                "measurable; lower bound only)"
            )
            log(f"{name}: UNRESOLVED (flat in k: device faster than the "
                "host-issue floor)")

    results["meta"] = {
        "N": N, "W": W, "F": F, "edges": real_edges,
        "N_block": Nb, "edges_block": real_edges_b,
        "peak_flops": peak_flops, "peak_bw": peak_bw,
        "protocol": "chained; *_chain arms inner-chain k=1,2,4,8 with the "
                    "host-issue floor fitted out",
    }
    best_frac = max(
        [results[k]["fraction_of_roofline"]
         for k in ("count_spmm", "block_spmm_xla", "block_spmm_kernel")
         if k in results]
        + [results[k]["fraction_of_single_pass_roofline"]
           for k in ("block_spmm_xla_chain", "block_spmm_kernel_chain")
           if k in results and results[k].get("resolved")]
    )
    out_path = os.path.join(ROOT, "results_tpu", "spmm_roofline.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({
        "metric": "qm9_spmm_fraction_of_roofline",
        "value": round(best_frac, 3),
        "windowed_fraction": round(
            results["count_spmm"]["fraction_of_roofline"], 3),
        "block_xla_fraction": round(
            results["block_spmm_xla"]["fraction_of_roofline"], 3),
        "block_kernel_fraction": round(
            results["block_spmm_kernel"]["fraction_of_roofline"], 3),
        "multi_agg_fraction": round(
            results["multi_aggregate"]["fraction_of_roofline"], 3),
    }))


if __name__ == "__main__":
    main()
