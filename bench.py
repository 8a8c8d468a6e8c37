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

ARM ISOLATION (round 5).  Measured fact: a process's per-call relay cost
GROWS monotonically with the number of calls it has issued — the same
compiled executable re-measured 6x back-to-back degraded 0.79 -> 2.1
ms/call and never recovered, even after a 30 s pause (the round-5
degradation probe; recorded in CLAUDE.md).  A monolithic benchmark
therefore systematically biases its LATE arms (the bf16/train arms read
~2x slow at the end of a long run).  Every arm now runs in a FRESH
subprocess (the persistent compile cache makes that cheap: children
compile nothing), serialized one at a time; the parent only assembles
JSON and never touches the relay itself.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REF_PNA_QM9_LATENCY_S = 1.707e-3  # BASELINE.md fpga_par pna/qm9
REF_PNA_QM9_GRAPHS_PER_S = 1.0 / REF_PNA_QM9_LATENCY_S


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ===========================================================================
# Child side: one arm per process
# ===========================================================================


def _child_setup():
    import jax

    import gnnbuilder_tpu as gnnb

    # persistent XLA/Mosaic compile cache: a committed pre-run seeds every
    # executable, so arms compile nothing — immune to slow/wedged remote
    # compiles (CLAUDE.md) and what makes per-arm subprocesses cheap
    try:
        gnnb.enable_persistent_cache()
    except Exception as e:  # noqa: BLE001 — cache is an optimization only
        log(f"persistent cache unavailable: {e}")
    for i in range(2):
        try:
            jax.devices()
            break
        except RuntimeError as e:
            log(f"backend init failed (try {i+1}/2): {e}")
            if i == 0:
                import time

                time.sleep(120)
            else:
                jax.config.update("jax_platforms", "cpu")
    return jax.default_backend()


def _canonical(bs, blk, precision="f32", node_multiple=None):
    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.bench.canonical import (
        canonical_batches,
        canonical_model,
    )

    # node_multiple=1024 aligns block batches to the stack kernel's tile
    # schedule; standard batches use 256 at scale (fused layer tiles) and
    # tight padding at tiny sizes (ops/dispatch.py policies)
    gs, batches = canonical_batches(
        "qm9", n_graphs=max(bs * 2, 64), batch_size=bs,
        node_multiple=node_multiple or (
            1024 if blk else (256 if bs >= 64 else 8)
        ),
        block_size=blk,
    )
    b = batches[0]
    model = canonical_model("pna", "qm9", graphs=gs)
    p = gnnb.Program(
        model, max_nodes=b.num_nodes, max_edges=b.num_edges,
        max_graphs=b.num_graphs, precision=precision, block_size=blk,
    )
    p.init_params(b)
    return p, b, model, gs


def _arm_sweep(spec):
    """One (batch, packing, precision) sweep point: 3 chained-marginal
    runs + the roofline inputs for this config."""
    import numpy as np

    from gnnbuilder_tpu.ops import dispatch as _dispatch

    platform = _child_setup()
    bs, blk = spec["bs"], spec["blk"]
    fallback = []

    def build_and_run():
        p, b, _, _ = _canonical(bs, blk, spec.get("precision", "f32"))
        runs = [
            p.benchmark(b, iters=35, repeats=5)["latency_s"]
            for _ in range(3)
        ]
        return p, b, runs

    try:
        p, b, runs = build_and_run()
    except Exception as e:  # noqa: BLE001 — kernel-failure ladder: the
        # XLA path is numerically identical, just slower
        log(f"fused path failed ({type(e).__name__}: {e}); mode=never")
        fallback.append(f"{type(e).__name__}: {e}")
        _dispatch.set_fused_mode("never")
        p, b, runs = build_and_run()

    from gnnbuilder_tpu.bench.roofline import program_min_bytes

    cost = p.cost_analysis(b)
    out = {
        "runs_s": sorted(runs),
        "real_edges": int(np.asarray(b.edge_mask).sum()),
        "flops": float(cost.get("flops", 0.0)),
        "xla_bytes": float(cost.get("bytes accessed", 0.0)),
        "min_bytes": float(program_min_bytes(p, b)),
        "platform": platform,
    }
    if fallback:
        out["fused_fallback_errors"] = fallback[:3]
    return out


def _arm_b1(spec):
    """Three independent chained-marginal batch=1 estimates."""
    platform = _child_setup()
    p, b, _, _ = _canonical(1, 0, node_multiple=8)
    runs = [
        p.benchmark(b, iters=60, repeats=4)["latency_s"] for _ in range(3)
    ]
    return {"runs_s": sorted(runs), "platform": platform}


def _arm_device_b1(spec):
    """Inner-chain device-time fit for batch=1 (k = 1, 2, 4, 8)."""
    import jax

    from gnnbuilder_tpu.bench.timing import marginal_time

    _child_setup()
    p1, bb1, _, _ = _canonical(1, 0, node_multiple=8)
    fwd1 = p1.compile(bb1)

    def chain_k(k):
        def f(x):
            b = bb1.with_node_feat(x)
            for _ in range(k):
                out = fwd1(p1.params, b)
                b = b.with_node_feat(b.node_feat + 1e-12 * out.sum())
            return b.node_feat

        return jax.jit(f)

    times = {}
    for k in (1, 2, 4, 8):
        fj = chain_k(k)
        x = fj(bb1.node_feat)
        x.block_until_ready()
        times[k] = marginal_time(fj, x, n_lo=8, n_hi=40, repeats=4)
    return {"times_s": {str(k): v for k, v in times.items()}}


def _arm_train(spec):
    """Full train step (fwd + Pallas bwd + Adam) at b1024."""
    import jax
    import optax

    from gnnbuilder_tpu import train as gtrain
    from gnnbuilder_tpu.bench.canonical import (
        canonical_batches,
        canonical_model,
    )
    from gnnbuilder_tpu.bench.timing import marginal_time

    _child_setup()
    gs, tb = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024, node_multiple=256
    )
    tbatch = tb[0]
    model = canonical_model("pna", "qm9", graphs=gs)
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
    runs = sorted(
        marginal_time(one, n_lo=4, n_hi=12, repeats=3) for _ in range(3)
    )
    return {"runs_s": runs}


_ARM_FNS = {
    "sweep": _arm_sweep,
    "b1": _arm_b1,
    "device_b1": _arm_device_b1,
    "train": _arm_train,
}


def child_main(spec_json: str):
    spec = json.loads(spec_json)
    out = _ARM_FNS[spec["kind"]](spec)
    print(json.dumps(out), flush=True)


# ===========================================================================
# Parent side: spawn arms, assemble the headline JSON (no jax here)
# ===========================================================================


def run_arm(spec: dict, timeout_s: int = 2400, retries: int = 1):
    """One arm in a fresh subprocess; returns its JSON dict or None."""
    cmd = [sys.executable, os.path.abspath(__file__), "--arm",
           json.dumps(spec)]
    for attempt in range(retries + 1):
        log(f"[arm {spec}] attempt {attempt + 1}")
        try:
            r = subprocess.run(
                cmd, capture_output=True, text=True, timeout=timeout_s
            )
        except subprocess.TimeoutExpired:
            log(f"[arm {spec}] TIMEOUT after {timeout_s}s")
            continue
        sys.stderr.write(r.stderr[-2000:])
        if r.returncode == 0 and r.stdout.strip():
            try:
                return json.loads(r.stdout.strip().splitlines()[-1])
            except json.JSONDecodeError:
                log(f"[arm {spec}] unparseable output")
        else:
            log(f"[arm {spec}] rc={r.returncode}")
    return None


def main():
    out = {
        "metric": "qm9_pna_throughput",
        "unit": "graphs/s",
        "protocol": ("chained-marginal, median-of-3 runs per arm, one "
                     "fresh process per arm (per-process relay cost "
                     "grows with issued-call count — measured 0.79 -> "
                     "2.1 ms/call over 6 back-to-back re-measurements "
                     "of one executable; isolation removes the "
                     "late-arm bias)"),
        "baseline": "fpga_par pna/qm9 1.707 ms/graph (BASELINE.md)",
    }

    # batch=1 latency (median of 3 in one fresh process)
    b1 = run_arm({"kind": "b1"})
    if b1:
        runs = b1["runs_s"]
        lat_b1 = runs[1]
        out["latency_b1_ms"] = round(lat_b1 * 1e3, 3)
        out["latency_b1_range_ms"] = [round(runs[0] * 1e3, 3),
                                      round(runs[-1] * 1e3, 3)]
        out["latency_b1_spread"] = round((runs[-1] - runs[0]) / lat_b1, 3)
        log(f"batch=1: {lat_b1*1e3:.3f} ms "
            f"({runs[0]*1e3:.3f}-{runs[-1]*1e3:.3f})")
        if b1.get("platform") not in (None, "tpu"):
            # emergency CPU fallback ran: attach the last committed
            # on-TPU result for context (clearly labeled; "value" stays
            # this run's number)
            out["platform"] = b1["platform"]
            try:
                ref_path = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "results_tpu", "bench_r5c.json",
                )
                with open(ref_path) as f:
                    out["last_committed_tpu_result"] = json.load(f)
                out["note"] = (
                    "TPU relay unavailable during this run; value was "
                    "measured on CPU. last_committed_tpu_result is the "
                    "most recent on-chip measurement."
                )
            except Exception:  # noqa: BLE001
                pass

    # sweep: each (batch, packing) point isolated
    best = None
    fused_fallbacks = []
    for bs in (256, 1024, 4096):
        for blk in (0, 128):
            arm = run_arm({"kind": "sweep", "bs": bs, "blk": blk})
            if not arm:
                continue
            fused_fallbacks += arm.get("fused_fallback_errors", [])
            runs = arm["runs_s"]
            dt = runs[1]
            tput = bs / dt
            log(f"batch={bs} pack={'block' if blk else 'std'}: "
                f"{dt*1e3:.2f} ms/call -> {tput:,.0f} graphs/s "
                f"(3-run range {bs/runs[-1]:,.0f}-{bs/runs[0]:,.0f})")
            if best is None or tput > best["tput"]:
                best = dict(arm, tput=tput, bs=bs, blk=blk, dt=dt)

    if best is None:
        out["error"] = "every sweep arm failed"
        print(json.dumps(out))
        return

    out["value"] = round(best["tput"], 1)
    out["value_range"] = [round(best["bs"] / best["runs_s"][-1], 1),
                          round(best["bs"] / best["runs_s"][0], 1)]
    out["vs_baseline"] = round(best["tput"] / REF_PNA_QM9_GRAPHS_PER_S, 2)
    out["best_batch_size"] = best["bs"]
    out["best_packing"] = "block128" if best["blk"] else "standard"

    # roofline accounting for the winning config (BASELINE.json target)
    from gnnbuilder_tpu.bench.roofline import roofline_report

    roof = roofline_report(
        best["dt"], flops=best["flops"], min_bytes=best["min_bytes"],
        xla_bytes=best["xla_bytes"], num_edges=best["real_edges"],
    )
    out["edges_per_s"] = round(roof["edges_per_s"], 1)
    out["fraction_of_roofline"] = round(roof["fraction_of_roofline"], 3)
    log(f"roofline: {roof['fraction_of_roofline']*100:.0f}% of "
        f"{roof['bound']}-bound minimum; "
        f"{roof['edges_per_s']:,.0f} edges/s")

    # bf16 policy arm at the winning config (the reference's fpga_par
    # headline runs 16-bit FPX(16,10) — the like-for-like comparison)
    bf16 = run_arm({"kind": "sweep", "bs": best["bs"], "blk": best["blk"],
                    "precision": "bf16"})
    if bf16:
        runs = bf16["runs_s"]
        tput = best["bs"] / runs[1]
        out["bf16_graphs_per_s"] = round(tput, 1)
        out["bf16_range"] = [round(best["bs"] / runs[-1], 1),
                             round(best["bs"] / runs[0], 1)]
        out["bf16_vs_baseline"] = round(tput / REF_PNA_QM9_GRAPHS_PER_S, 2)
        log(f"bf16 policy batch={best['bs']}: {runs[1]*1e3:.2f} ms/call "
            f"-> {tput:,.0f} graphs/s")

    # device-time arm: inner-chain fit with the degraded-floor guard
    dev = run_arm({"kind": "device_b1"})
    if dev:
        import numpy as _np

        times = {int(k): v for k, v in dev["times_s"].items()}
        kk = _np.array(sorted(times))
        tt = _np.array([times[int(i)] for i in kk])
        slope, intercept = _np.polyfit(kk, tt, 1)
        # degraded-floor guard: an inflated per-call floor grows with the
        # timing window and the "fit" resolves ON THE FLOOR, not on
        # device time (seen: a 0.159 ms "device" slope with a 0.26 ms
        # intercept in a session whose clean-session bound is <0.023 ms)
        degraded = float(intercept) > 0.15e-3
        if (float(tt[-1]) > 1.5 * float(tt[0]) and slope > 0
                and not degraded):
            out["latency_b1_device_ms"] = round(float(slope) * 1e3, 4)
            out["device_vs_baseline_latency"] = round(
                REF_PNA_QM9_LATENCY_S / float(slope), 1
            )
            log(f"batch=1 DEVICE time: {slope*1e3:.3f} ms "
                f"(overhead {intercept*1e3:.3f} ms)")
        else:
            ub = float(times[8]) / 8 * 1e3
            out["latency_b1_device_upper_ms"] = round(ub, 4)
            out["device_latency_note"] = (
                "device time unresolved ("
                + ("per-call floor degraded this session"
                   if degraded else "flat in k")
                + "); the bound is times[k=8]/8"
            )
            log(f"batch=1 device time unresolved: UPPER BOUND {ub:.3f} ms")

    # training throughput (the framework's beyond-the-reference capability)
    tr = run_arm({"kind": "train"})
    if tr:
        runs = tr["runs_s"]
        out["train_step_b1024_ms"] = round(runs[1] * 1e3, 2)
        out["train_step_range_ms"] = [round(runs[0] * 1e3, 2),
                                      round(runs[-1] * 1e3, 2)]
        out["train_graphs_per_s"] = round(1024 / runs[1], 1)
        log(f"train step b1024: {runs[1]*1e3:.2f} ms")

    # energy accounting (RAPL/nvidia-smi analog, bench/energy.py): the
    # relay exposes no power telemetry — honest TDP-derived BOUND
    from gnnbuilder_tpu.bench.energy import (
        TPU_TDP_W,
        energy_bound_j_per_graph,
    )

    out["energy_bound_j_per_graph"] = round(
        energy_bound_j_per_graph(1.0 / best["tput"], TPU_TDP_W), 6
    )
    if fused_fallbacks:
        out["fused_fallback"] = True
        out["fused_fallback_errors"] = fused_fallbacks[:3]
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--arm":
        child_main(sys.argv[2])
    else:
        main()
