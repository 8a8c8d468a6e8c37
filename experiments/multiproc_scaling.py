"""MEASURED multi-process scaling curve (VERDICT r3 item 6).

Round 3 proved multi-process correctness (tests/test_multihost_distributed.py)
and projected >=0.88 ICI scaling efficiency from single-chip times
(results_tpu/scaling_projection.json); this experiment MEASURES a 2-process
efficiency on the same jax.distributed CPU/gloo stack the correctness test
uses — the only multi-process transport available in this environment
(single real TPU chip; SURVEY.md §2.4: the reference has no multi-device
story at all).

Design: WEAK scaling with fixed resources per process.  Each process gets
``cores_per_proc`` disjoint physical cores and 2 virtual CPU devices
(tp=2 within-process, dp across processes); the global batch grows with dp
so per-shard work is constant.  Efficiency = tput(2 procs) / (2 x tput(1
proc)).  Anything below 1.0 is the cost of the cross-process collectives
(gloo here; DCN/ICI on a real pod) plus any step-time jitter.

Paths measured: GSPMD edge-partitioned, explicit-halo (ppermute exchange),
and the round-3 block-diagonal layout (shard-contained graphs: the
collective traffic is gradient psums only).

Writes results_tpu/multiproc_scaling.json.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "experiments", "multiproc_scaling_worker.py")

BATCH_PER_SHARD = int(os.environ.get("MPS_BATCH", 256))
HIDDEN = 128
LAYERS = int(os.environ.get("MPS_LAYERS", 4))
STEPS = int(os.environ.get("MPS_STEPS", 6))
CORES_PER_PROC = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_config(n_procs: int) -> dict:
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [
                sys.executable, WORKER, str(i), str(n_procs), str(port),
                str(CORES_PER_PROC), str(BATCH_PER_SHARD), str(HIDDEN),
                str(LAYERS), str(STEPS),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(n_procs)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=3600)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{out[-4000:]}")
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        outs.append(json.loads(lines[-1][len("RESULT "):]))
    # losses are replicated scalars: identical across processes
    for key in ("loss_gspmd", "loss_halo", "loss_block"):
        vals = {round(o[key], 6) for o in outs}
        assert len(vals) == 1, f"{key} diverged across processes: {vals}"
    return outs[0]


def main():
    print(f"1-process baseline (dp=1, {CORES_PER_PROC} cores, "
          f"b{BATCH_PER_SHARD})...", flush=True)
    r1 = run_config(1)
    print(json.dumps(r1, indent=1), flush=True)
    print("2-process run (dp=2, disjoint cores, weak scaling)...",
          flush=True)
    r2 = run_config(2)
    print(json.dumps(r2, indent=1), flush=True)

    result = {
        "meta": {
            "design": "weak scaling, fixed 2 cores + 2 virtual CPU devices "
                      "per process, tp=2 in-process, dp across processes, "
                      "gloo collectives (jax.distributed)",
            "batch_per_shard": BATCH_PER_SHARD,
            "hidden": HIDDEN,
            "layers": LAYERS,
            "conv": "gcn",
            "steps_per_window": STEPS,
        },
        "one_proc": r1,
        "two_proc": r2,
    }
    for name in ("gspmd", "halo", "block"):
        t1 = r1[f"graphs_per_s_{name}"]
        t2 = r2[f"graphs_per_s_{name}"]
        eff = t2 / (2.0 * t1)
        result[f"efficiency_{name}"] = eff
        print(f"{name}: {t1:,.0f} -> {t2:,.0f} graphs/s, "
              f"efficiency {eff:.3f}", flush=True)

    out = os.path.join(ROOT, "results_tpu", "multiproc_scaling.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: round(v, 3) for k, v in result.items()
                      if k.startswith("efficiency")}))


if __name__ == "__main__":
    main()
