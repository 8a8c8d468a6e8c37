"""On-chip serving benchmark — the committed artifact for the pipelined
dispatch path (VERDICT r3 weak #4: serve.py's round-3 pipelining shipped
with no measurement).

Arms (canonical PNA / qm9, live-Program server, micro-batch <= 64):

  naive_b1        — the reference's serving model: one synchronous device
                    call per graph (model_tb.cpp.jinja:167-204 analog).
                    Each call pays the full ~0.1 ms host-issue floor.
  sustained       — closed-loop: N graphs submitted at once; sustained
                    graphs/s with micro-batching + pipelined dispatch.
  open_loop@R     — open-loop offered load R graphs/s for a fixed window;
                    reports served/s + p50/p90/p99 request latency.  Loads
                    chosen below and above the naive per-call ceiling.

Done criterion: >= 3x the naive b1-equivalent throughput at p99 < 1 ms.
Writes results_tpu/serve_r4.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import numpy as np

    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.bench.canonical import canonical_model
    from gnnbuilder_tpu.data.datasets import load_dataset
    from gnnbuilder_tpu.serve import GNNServer

    log(f"devices: {jax.devices()}")
    results = {"meta": {
        "model": "canonical pna/qm9",
        "open_loop_max_batch": 64,
        "sustained_max_batch_sweep": [64, 256, 1024],
        "relay_note": (
            "through the axon relay every device->host materialization "
            "pays a fixed ~25-40 ms sync a locally attached chip would "
            "not; the server syncs once per micro-batch, so request "
            "latency percentiles are bounded below by the relay RTT "
            "while throughput amortizes it across the micro-batch"
        ),
    }}

    n_graphs = int(os.environ.get("SERVE_N", 4096))
    graphs = load_dataset("qm9", n=n_graphs)
    model = canonical_model("pna", "qm9", graphs=graphs[:200])
    # block-packed serving: the whole-stack PNA kernel dispatches inside
    # the server's compiled forward (dispatch.inference_mode in
    # Program._forward_fn; r4_block_ab 1.19x)
    prog = gnnb.Program.from_dataset(model, graphs, batch_size=64,
                                     block_size=128)
    prog.init_params(prog.batch(graphs[:8]))

    # ---- naive per-call arm (one graph per synchronous device call)
    b1 = gnnb.Program.from_dataset(model, graphs, batch_size=1)
    b1.set_params(prog.params)
    n_naive = min(int(os.environ.get("SERVE_NAIVE", 256)), len(graphs))
    batches1 = [b1.batch([g]) for g in graphs[:n_naive]]
    fwd1 = b1.compile(batches1[0])
    np.asarray(fwd1(b1.params, batches1[0]))  # warm
    lats = []
    t0 = time.perf_counter()
    for bb in batches1:
        t1 = time.perf_counter()
        np.asarray(fwd1(b1.params, bb))  # sync: device->host materialize
        lats.append((time.perf_counter() - t1) * 1e3)
    naive_s = time.perf_counter() - t0
    naive_tput = len(batches1) / naive_s
    results["naive_b1"] = {
        "graphs_per_s": naive_tput,
        "p50_ms": float(np.percentile(lats, 50)),
        "p99_ms": float(np.percentile(lats, 99)),
    }
    log(f"naive b1: {naive_tput:,.0f} graphs/s, "
        f"p50 {results['naive_b1']['p50_ms']:.3f} ms")

    # ---- sustained closed-loop arms, micro-batch sweep.  Through the
    # axon relay every device->host materialization pays a fixed ~25-40 ms
    # sync a locally attached chip would not (CLAUDE.md) — the server
    # syncs once per MICRO-BATCH, so max_batch is the amortization knob
    # and the sweep locates the relay-transfer ceiling explicitly.
    sustained = None
    for mb in (64, 256, 1024):
        # budgets sized to the micro-batch: a 64-graph server must not pad
        # every batch to 1024-graph budgets, and a 1024 micro-batch cannot
        # fit 64-graph budgets
        prog_mb = prog
        if mb != 64:
            prog_mb = gnnb.Program.from_dataset(
                model, graphs, batch_size=mb, block_size=128)
            prog_mb.set_params(prog.params)
        with GNNServer.from_program(
            prog_mb, batch_example=prog_mb.batch(graphs[:8]),
            max_wait_ms=0.5, max_batch=mb,
        ) as server:
            _ = server.predict(graphs[:mb])  # warm + compile
            t0 = time.perf_counter()
            n_sus = min(int(os.environ.get("SERVE_SUSTAIN", 4096)),
                        len(graphs))
            out = server.predict(graphs[:n_sus])
            dt = time.perf_counter() - t0
            assert out.shape[0] == n_sus and np.isfinite(out).all()
            tput = n_sus / dt
            st = server.stats()
        results[f"sustained_mb{mb}"] = {
            "graphs_per_s": tput,
            "avg_batch": st["avg_batch"],
            "p50_ms": st.get("p50_ms"),
            "p99_ms": st.get("p99_ms"),
        }
        log(f"sustained mb={mb}: {tput:,.0f} graphs/s "
            f"(avg batch {st['avg_batch']:.1f})")
        if sustained is None or tput > sustained:
            sustained = tput

    # ---- open-loop offered-load arms
    loads = [int(x) for x in os.environ.get(
        "SERVE_LOADS", "2000,5000,10000,20000,50000"
    ).split(",")]
    for rate in loads:
        with GNNServer.from_program(
            prog, batch_example=prog.batch(graphs[:8]), max_wait_ms=0.5
        ) as server:
            _ = server.predict(graphs[:64])  # warm
            duration = float(os.environ.get("SERVE_DURATION", 6.0))
            period = 1e-3  # submit in 1 ms ticks
            per_tick = max(int(rate * period), 1)
            futs = []
            i = 0
            t_start = time.perf_counter()
            next_tick = t_start
            while time.perf_counter() - t_start < duration:
                next_tick += period
                for _ in range(per_tick):
                    futs.append(server.submit(graphs[i % len(graphs)]))
                    i += 1
                pause = next_tick - time.perf_counter()
                if pause > 0:
                    time.sleep(pause)
            # drain — an offered load above capacity builds an unbounded
            # queue; mark the arm saturated instead of dying in the drain
            saturated = False
            try:
                for f in futs:
                    f.result(timeout=180)
            except Exception:  # noqa: BLE001 — futures.TimeoutError
                saturated = True
                log(f"  load {rate}: saturated (drain timeout), "
                    f"recording served-so-far stats")
            elapsed = time.perf_counter() - t_start
            st = server.stats()
        results[f"open_loop@{rate}"] = {
            "saturated": saturated,
            "offered_graphs_per_s": rate,
            "served_graphs_per_s": st["served"] / elapsed,
            "avg_batch": st["avg_batch"],
            "p50_ms": st.get("p50_ms"),
            "p90_ms": st.get("p90_ms"),
            "p99_ms": st.get("p99_ms"),
        }
        log(f"open loop @{rate:,}: served "
            f"{st['served']/elapsed:,.0f} g/s, p50 "
            f"{st.get('p50_ms', -1):.2f} ms, p99 "
            f"{st.get('p99_ms', -1):.2f} ms, avg batch "
            f"{st['avg_batch']:.1f}")

    # done-criterion summary: best load with p99 < 1 ms
    best = 0.0
    for k, v in results.items():
        if k.startswith("open_loop") and v.get("p99_ms") is not None:
            if v["p99_ms"] < 1.0:
                best = max(best, v["served_graphs_per_s"])
    results["summary"] = {
        "naive_b1_graphs_per_s": naive_tput,
        "best_graphs_per_s_p99_under_1ms": best,
        "speedup_vs_naive_at_p99_1ms": best / max(naive_tput, 1e-9),
        "sustained_graphs_per_s": sustained,
        "sustained_speedup_vs_naive": sustained / max(naive_tput, 1e-9),
    }
    log(f"summary: {json.dumps(results['summary'], indent=1)}")

    out_path = os.path.join(ROOT, "results_tpu", "serve_r4.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps({k: round(v, 2)
                      for k, v in results["summary"].items()}))


if __name__ == "__main__":
    main()
