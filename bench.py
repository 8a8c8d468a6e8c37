#!/usr/bin/env python
"""Headline benchmark: PNA on QM9 (the reference's hardest conv and the
BASELINE.json metric) — canonical 6-layer model, throughput in graphs/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

vs_baseline compares against the reference's best published QM9 PNA number:
fpga_par at 1.707 ms/graph == 585.8 graphs/s (BASELINE.md, batch=1 on a
xcu280).  We report steady-state throughput at the best batch size on one
TPU chip; batch=1 marginal latency is an auxiliary field.  All timings use
marginal measurement (gnnbuilder_tpu/bench/timing.py) because
block_until_ready does not actually block through the axon TPU relay.
"""

import json
import sys

REF_PNA_QM9_LATENCY_S = 1.707e-3  # BASELINE.md fpga_par pna/qm9
REF_PNA_QM9_GRAPHS_PER_S = 1.0 / REF_PNA_QM9_LATENCY_S


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _devices_with_retry(n_tries=4, wait_s=300):
    """Backend init with retries: the axon relay can report UNAVAILABLE for
    a stretch after a wedged compile (CLAUDE.md).  Retry a few times before
    falling back to CPU so a transient relay outage doesn't zero the
    round's metric; a CPU run is marked platform=cpu in the output."""
    import jax

    for i in range(n_tries):
        try:
            devs = jax.devices()
            return devs, jax.default_backend()
        except RuntimeError as e:
            log(f"backend init failed (try {i+1}/{n_tries}): {e}")
            if i + 1 < n_tries:
                import time

                time.sleep(wait_s)
    log("TPU unavailable; falling back to CPU (metric will be marked)")
    jax.config.update("jax_platforms", "cpu")
    devs = jax.devices()
    return devs, jax.default_backend()


def main():
    import jax

    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.bench.canonical import canonical_batches, canonical_model
    from gnnbuilder_tpu.bench.timing import marginal_time

    # persistent XLA/Mosaic compile cache: a committed pre-run seeds every
    # executable this script needs, so a later (driver) run compiles
    # nothing — immune to slow/wedged remote compiles (CLAUDE.md) and
    # minutes faster
    try:
        gnnb.enable_persistent_cache()
    except Exception as e:  # noqa: BLE001 — cache is an optimization only
        log(f"persistent cache unavailable: {e}")

    devs, platform = _devices_with_retry()
    log(f"devices: {devs}")

    graphs, _ = canonical_batches("qm9", n_graphs=256, batch_size=1)
    model = canonical_model("pna", "qm9", graphs=graphs)

    def measure(bs, n_lo=5, n_hi=25, return_info=False, repeats=2,
                precision="f32", node_multiple=None, block_size=0):
        import numpy as np

        # node_multiple=256 aligns larger batches to the fused Pallas
        # kernel's node tiles (ops/dispatch.py); tiny batches keep tight
        # padding and the XLA path, which wins at that scale.
        # block_size=128 selects the bin-packed layout: the whole-stack
        # block-local PNA kernel (ops/pallas/pna_block.py) then runs the
        # entire conv stack in one kernel (round 4).
        gs, batches = canonical_batches(
            "qm9", n_graphs=max(bs * 2, 64), batch_size=bs,
            node_multiple=node_multiple or (256 if bs >= 64 else 8),
            block_size=block_size,
        )
        b = batches[0]
        p = gnnb.Program(
            model,
            max_nodes=b.num_nodes,
            max_edges=b.num_edges,
            max_graphs=b.num_graphs,
            precision=precision,
            block_size=block_size,
        )
        p.init_params(b)
        # chained-call marginal timing (Program.benchmark): independent
        # repeated calls overlap/elide through the relay — fast configs
        # would otherwise report impossible >roofline numbers
        dt = p.benchmark(b, iters=n_hi, repeats=repeats)["latency_s"]
        if return_info:
            real_edges = int(np.asarray(b.edge_mask).sum())
            return dt, (p, b, real_edges)
        return dt

    # Kernel-failure ladder: a fresh fused kernel that fails to compile on
    # real Mosaic must not lose the round's metric.  Try the full fused
    # path; on ANY exception disable the fused dispatch and remeasure (the
    # XLA path is numerically identical, just slower).
    from gnnbuilder_tpu.ops import dispatch as _dispatch

    fused_fallbacks: list[str] = []  # marks the output JSON when non-empty

    def measure_guarded(*a, **k):
        try:
            return measure(*a, **k)
        except Exception as e:  # noqa: BLE001
            log(f"fused path failed ({type(e).__name__}: {e}); "
                f"falling back to mode=never")
            fused_fallbacks.append(f"{type(e).__name__}: {e}")
            _dispatch.set_fused_mode("never")
            return measure(*a, **k)

    # batch=1: THREE independent chained-marginal estimates, headline =
    # median, spread recorded.  Round-2 committed runs spread 0.24-1.08 ms
    # across protocols/runs (VERDICT item 4): the relay's per-window jitter
    # at ~0.3 ms/call marginals needs both wide call-count gaps AND
    # between-run replication to be trustworthy; every bench.py number now
    # carries its own spread so a jittered run is visible in the artifact.
    b1_runs = sorted(
        measure_guarded(1, n_lo=10, n_hi=60, repeats=4) for _ in range(3)
    )
    lat_b1 = b1_runs[1]  # median of 3
    b1_spread = (b1_runs[-1] - b1_runs[0]) / lat_b1
    log(f"batch=1 marginal latency: {lat_b1*1e3:.3f} ms/graph "
        f"(3-run spread {b1_spread*100:.0f}%: "
        f"{b1_runs[0]*1e3:.3f}-{b1_runs[-1]*1e3:.3f})")

    # every throughput arm reports median AND range over independent runs
    # (VERDICT r3 item 3: the headline must be reproducible-by-construction
    # — a driver re-run should land inside the printed range, not chase a
    # best session)
    best_tput, best_bs, best = 0.0, 1, None
    best_blk = 0
    f32_runs_by_key = {}
    # batch-size sweep: the ~0.1 ms per-call host issue floor
    # (results_tpu/dispatch_floor.json) costs ~9% of a ~1 ms b1024 call;
    # b4096 amortizes it below 3% — "steady-state throughput at the best
    # batch size" is the metric, so let the sweep find that point.
    for bs in (256, 1024, 4096):
        # packing axis: standard contiguous vs block bin-packed (the
        # whole-stack block-local PNA kernel dispatches on the latter)
        for blk_sz in (0, 128):
            # median-of-5 marginal estimates: relay noise at sub-ms call
            # times swings single estimates by 2-3x
            runs = []
            binfo = None
            for _ in range(3):
                dt_i, binfo = measure_guarded(
                    bs, n_lo=5, n_hi=35, repeats=5, return_info=True,
                    block_size=blk_sz,
                    node_multiple=1024 if blk_sz else None,
                )
                runs.append(dt_i)
            runs.sort()
            dt = runs[1]  # median of 3
            f32_runs_by_key[(bs, blk_sz)] = runs
            tput = bs / dt
            log(f"batch={bs} pack={'block' if blk_sz else 'std'}: "
                f"{dt*1e3:.2f} ms/call -> {tput:,.0f} graphs/s "
                f"(3-run range {bs/runs[-1]:,.0f}-{bs/runs[0]:,.0f})")
            if tput > best_tput:
                best_tput, best_bs, best = tput, bs, (dt, binfo)
                best_blk = blk_sz

    # roofline accounting for the winning config (BASELINE.json edges/s target)
    from gnnbuilder_tpu.bench.roofline import program_min_bytes, roofline_report

    dt, (prog, batch, real_edges) = best
    cost = prog.cost_analysis(batch)
    roof = roofline_report(
        dt,
        flops=float(cost.get("flops", 0.0)),
        min_bytes=program_min_bytes(prog, batch),
        xla_bytes=float(cost.get("bytes accessed", 0.0)),
        num_edges=real_edges,
    )
    log(
        f"roofline: {roof['fraction_of_roofline']*100:.0f}% of "
        f"{roof['bound']}-bound minimum; {roof['edges_per_s']:,.0f} edges/s "
        f"(roofline {roof['roofline_edges_per_s']:,.0f})"
    )

    # device-time arm: chain k forwards inside ONE executable and fit
    # time(k) = overhead + k * t_device (experiments/dispatch_floor.py).
    # Through the relay every call pays a ~0.1 ms host-issue floor a
    # locally attached chip would not; t_device is what the hardware
    # actually spends per forward.  Clearly labeled; the headline stays
    # the end-to-end call time.
    device_b1_ms = None
    device_b1_upper_ms = None
    try:
        import numpy as _np

        gs1, b1batches = canonical_batches(
            "qm9", n_graphs=64, batch_size=1, node_multiple=8
        )
        bb1 = b1batches[0]
        p1 = gnnb.Program(
            model, max_nodes=bb1.num_nodes, max_edges=bb1.num_edges,
            max_graphs=bb1.num_graphs,
        )
        p1.init_params(bb1)
        fwd1 = p1.compile(bb1)

        def chain_k(k):
            def f(x):
                b = bb1.with_node_feat(x)
                for _ in range(k):
                    out = fwd1(p1.params, b)
                    b = b.with_node_feat(
                        b.node_feat + 1e-12 * out.sum()
                    )
                return b.node_feat

            return jax.jit(f)

        times = {}
        for k in (1, 2, 4, 8):
            fj = chain_k(k)
            x = fj(bb1.node_feat)
            x.block_until_ready()
            times[k] = marginal_time(fj, x, n_lo=8, n_hi=40, repeats=4)
        kk = _np.array(sorted(times))
        tt = _np.array([times[int(i)] for i in kk])
        slope, intercept = _np.polyfit(kk, tt, 1)
        # degraded-session guard: when the relay's per-call floor is
        # inflated (intercept far above the nominal ~0.1 ms), the floor
        # itself grows with the timing window and the "fit" resolves ON
        # THE FLOOR, not on device time (seen: a 0.159 ms "device" slope
        # with a 0.26 ms intercept in a session whose b1 calls took
        # 1.6 ms; clean sessions bound device time at <0.023 ms).  Such
        # fits are reported as upper bounds, never as device time.
        session_degraded = float(intercept) > 0.15e-3
        if (float(tt[-1]) > 1.5 * float(tt[0]) and slope > 0
                and not session_degraded):
            device_b1_ms = float(slope) * 1e3
            log(f"batch=1 DEVICE time (issue floor fitted out): "
                f"{device_b1_ms:.3f} ms "
                f"(per-call overhead {intercept*1e3:.3f} ms)")
        else:
            # flat in k (device faster than observable) OR a degraded
            # session floor: report the honest upper bound times[8]/8
            device_b1_upper_ms = float(times[8]) / 8 * 1e3
            why = ("session floor degraded"
                   if session_degraded else "flat in k")
            log(f"batch=1 device time unresolved ({why}): "
                f"UPPER BOUND {device_b1_upper_ms:.3f} ms "
                f"(8 chained forwards inside one call window)")
    except Exception as e:  # noqa: BLE001
        log(f"device-time arm skipped: {type(e).__name__}: {e}")

    # bf16 policy arm: the reference's fpga_par headline is 16-bit
    # FPX(16,10) (build_gnnbuilder_benchmarks.py:398-399), so the 16-bit
    # TPU policy (bf16 params/gathers/matmuls, compile/precision.py) is
    # the like-for-like comparison; reported alongside, f32 stays the
    # headline.  Guarded: a bf16-path failure must not cost the round.
    bf16_tput = None
    bf16_runs = []
    try:
        # packing per the knob grid's bf16 winner (results_tpu/
        # pna_tune.json: nm1024 enables the tr1024/sr256 tile schedule) —
        # the autotuner role the DSE owns (dse.engine.tune_kernels)
        for _ in range(3):
            bf16_runs.append(measure(
                best_bs, n_lo=5, n_hi=35, repeats=5, precision="bf16",
                node_multiple=1024 if best_bs >= 256 else None,
                block_size=best_blk,
            ))
        bf16_runs.sort()
        dt_bf16 = bf16_runs[1]  # median of 3
        bf16_tput = best_bs / dt_bf16
        log(f"bf16 policy batch={best_bs}: {dt_bf16*1e3:.2f} ms/call -> "
            f"{bf16_tput:,.0f} graphs/s (3-run range "
            f"{best_bs/bf16_runs[-1]:,.0f}-{best_bs/bf16_runs[0]:,.0f})")
    except Exception as e:  # noqa: BLE001
        log(f"bf16 arm skipped: {type(e).__name__}: {e}")

    # training throughput (round-2 headline: hand-written Pallas backward,
    # ops/pallas/ell_bwd.py); guarded — the inference metric above must
    # survive any training-path failure
    train_ms = None
    try:
        import numpy as np
        import optax

        from gnnbuilder_tpu import train as gtrain

        _, tb = canonical_batches(
            "qm9", n_graphs=1100, batch_size=1024, node_multiple=256
        )
        tbatch = tb[0]
        y = jax.numpy.zeros((tbatch.num_graphs, 1), jax.numpy.float32)
        params = model.init(jax.random.PRNGKey(0), tbatch)
        opt = optax.adam(1e-3)
        step = gtrain.make_train_step(model, opt, donate=False)
        opt_state = opt.init(params)
        st = {"p": params, "o": opt_state}

        def one():
            p, o, loss = step(st["p"], st["o"], tbatch, y)
            st["p"], st["o"] = p, o
            return loss

        one()
        train_runs = sorted(
            marginal_time(one, n_lo=4, n_hi=12, repeats=3)
            for _ in range(3)
        )
        train_dt = train_runs[1]  # median of 3
        train_ms = train_dt * 1e3
        log(f"train step b1024: {train_ms:.2f} ms "
            f"({1024/train_dt:,.0f} graphs/s; 3-run range "
            f"{train_runs[0]*1e3:.2f}-{train_runs[-1]*1e3:.2f} ms)")
    except Exception as e:  # noqa: BLE001
        log(f"train-step metric skipped: {type(e).__name__}: {e}")

    f32_range = sorted(
        best_bs / d for d in f32_runs_by_key[(best_bs, best_blk)]
    )
    out = {
        "metric": "qm9_pna_throughput",
        "value": round(best_tput, 1),
        "unit": "graphs/s",
        "value_range": [round(f32_range[0], 1), round(f32_range[-1], 1)],
        "vs_baseline": round(best_tput / REF_PNA_QM9_GRAPHS_PER_S, 2),
        "latency_b1_ms": round(lat_b1 * 1e3, 3),
        "latency_b1_range_ms": [round(b1_runs[0] * 1e3, 3),
                                round(b1_runs[-1] * 1e3, 3)],
        "latency_b1_spread": round(b1_spread, 3),
        "protocol": "chained-marginal, median-of-3 runs per arm",
        "best_batch_size": best_bs,
        "best_packing": "block128" if best_blk else "standard",
        "edges_per_s": round(roof["edges_per_s"], 1),
        "fraction_of_roofline": round(roof["fraction_of_roofline"], 3),
        "baseline": "fpga_par pna/qm9 1.707 ms/graph (BASELINE.md)",
    }
    # energy accounting (RAPL/nvidia-smi analog, bench/energy.py): the relay
    # exposes no power telemetry, so report the honest TDP-derived BOUND
    from gnnbuilder_tpu.bench.energy import TPU_TDP_W, energy_bound_j_per_graph

    out["energy_bound_j_per_graph"] = round(
        energy_bound_j_per_graph(1.0 / best_tput, TPU_TDP_W), 6
    )
    if platform != "tpu":
        out["platform"] = platform  # emergency fallback ran off-chip
        # attach the last committed on-TPU measurement for context (clearly
        # labeled — the headline "value" above is still this run's number)
        try:
            import os

            ref_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "results_tpu", "bench_r2.json",
            )
            with open(ref_path) as f:
                out["last_committed_tpu_result"] = json.load(f)
            out["note"] = (
                "TPU relay unavailable during this run; value above was "
                "measured on CPU. last_committed_tpu_result is the most "
                "recent on-chip measurement (results_tpu/bench_r2.json)."
            )
        except Exception:  # noqa: BLE001
            pass
    if fused_fallbacks:
        # the XLA (mode=never) ladder ran: these numbers are NOT the fused
        # path, and measurements taken before the failure may mix paths
        out["fused_fallback"] = True
        out["fused_fallback_errors"] = fused_fallbacks[:3]
        out["dispatch_mode"] = _dispatch.get_fused_mode()
    if bf16_tput is not None:
        out["bf16_graphs_per_s"] = round(bf16_tput, 1)
        out["bf16_range"] = [round(best_bs / bf16_runs[-1], 1),
                             round(best_bs / bf16_runs[0], 1)]
        out["bf16_vs_baseline"] = round(
            bf16_tput / REF_PNA_QM9_GRAPHS_PER_S, 2
        )
    if device_b1_ms is not None:
        out["latency_b1_device_ms"] = round(device_b1_ms, 4)
        out["device_vs_baseline_latency"] = round(
            REF_PNA_QM9_LATENCY_S * 1e3 / device_b1_ms, 1
        )
    elif device_b1_upper_ms is not None:
        out["latency_b1_device_upper_ms"] = round(device_b1_upper_ms, 4)
        out["device_latency_note"] = (
            "b1 device time is below the host-issue measurement floor "
            "(8 chained forwards return within one call window); the "
            "bound is times[k=8]/8"
        )
    if train_ms is not None:
        out["train_step_b1024_ms"] = round(train_ms, 2)
        out["train_step_range_ms"] = [round(train_runs[0] * 1e3, 2),
                                      round(train_runs[-1] * 1e3, 2)]
        out["train_graphs_per_s"] = round(1024e3 / train_ms, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
