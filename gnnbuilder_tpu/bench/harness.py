"""Benchmark harness — the conv x dataset sweep of the reference's
experiments (build_base_benchmarks.py / build_gnnbuilder_benchmarks.py).

Backends:
  * ``tpu``       — this framework's compiled Program on the default JAX
                    backend (the fpga_par analog), batch=1 latency and
                    best-batch throughput;
  * ``torch_cpu`` — the pure-torch golden model single-threaded on CPU
                    (the reference's PyG-CPU baseline analog,
                    build_base_benchmarks.py:158-239; we pin via
                    torch.set_num_threads(1) instead of sched_setaffinity).

Results are written in the reference's flat results-file format — one value
per ``<metric>_<backend>_<conv>_<dataset>.txt`` (its experiments parse these
back in process_and_plot_data.py:22-45) — plus one machine-readable JSON.
Energy counters (RAPL / nvidia-smi in the reference) have no TPU-relay
equivalent here and are omitted.

CLI:  python -m gnnbuilder_tpu.bench.harness --convs gcn,pna --datasets esol
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Sequence

import numpy as np

__all__ = ["run_grid", "bench_tpu", "bench_torch_cpu"]

# the reference's benchmark grid (build_gnnbuilder_benchmarks.py:128-148)
DEFAULT_CONVS = ("gcn", "gin", "pna", "sage")
DEFAULT_DATASETS = ("qm9", "esol", "freesolv", "lipo", "hiv")

# BASELINE.md fpga_par latencies (s/graph, batch=1) for vs_baseline ratios
FPGA_PAR_BASELINE_S = {
    ("gcn", "qm9"): 0.498e-3,
    ("pna", "qm9"): 1.707e-3,
    ("sage", "qm9"): 0.439e-3,
}


def bench_tpu(
    conv: str,
    dataset: str,
    # batch=4 mirrors the reference's *_b4 sweep arm
    # (build_base_benchmarks.py:162,246)
    batch_sizes: Sequence[int] = (1, 4, 256),
    n_graphs: int = 512,
    iters: int = 20,
) -> dict:
    """Compiled-Program latency/throughput for the canonical model."""
    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.bench.canonical import canonical_batches, canonical_model
    from gnnbuilder_tpu.bench.timing import marginal_time

    from gnnbuilder_tpu.data.datasets import DATASET_SPECS

    # block-diagonal packing where it wins: convs on the block matmul
    # path (A/B: results_tpu/block_model_ab.json — gin 1.32x, gcn 1.23x)
    # and, since round 4, the block-local inference kernels
    # (results_tpu/r4_block_ab.json — pna stack 1.19x, gat attention
    # 1.76x, edge 2.66x); datasets whose graphs fit a 128-row block
    spec = DATASET_SPECS[dataset]
    block = 128 if (
        conv in ("gcn", "gin", "sage", "pna", "gat", "edge")
        and spec.max_nodes <= 128
    ) else 0

    from gnnbuilder_tpu.core.graph import _BLOCK_AUTO_MIN_NODES

    out = {}
    graphs = None
    for bs in batch_sizes:
        # auto-packing crossover (core/graph.resolve_block_size policy):
        # small batches keep standard packing — the block kernels' per-step
        # overhead dominates below the measured node crossover
        # (BENCH_r04.json b256: block 169k vs std 704k graphs/s)
        use_block = (
            block if bs * spec.mean_nodes >= _BLOCK_AUTO_MIN_NODES else 0
        )
        graphs, batches = canonical_batches(
            dataset,
            n_graphs=max(n_graphs, bs + 1),
            batch_size=bs,
            node_multiple=256 if bs > 8 else 8,
            block_size=use_block if bs > 8 else 0,
        )
        b = batches[0]
        model = canonical_model(conv, dataset, graphs=graphs)
        prog = gnnb.Program(
            model,
            max_nodes=b.num_nodes,
            max_edges=b.num_edges,
            max_graphs=b.num_graphs,
        )
        prog.init_params(b)
        # chained-call marginal timing (Program.benchmark): independent
        # repeated calls overlap/elide through the relay and can report
        # impossible >peak numbers for fast configs
        dt = prog.benchmark(b, iters=max(iters, 12), repeats=3)["latency_s"]
        real_edges = int(np.asarray(b.edge_mask).sum())
        out[f"latency_b{bs}_s"] = dt
        out[f"graphs_per_s_b{bs}"] = bs / dt
        out[f"edges_per_s_b{bs}"] = real_edges / dt
    out["latency_s"] = out[f"latency_b{batch_sizes[0]}_s"]
    best = max(batch_sizes, key=lambda bs: out[f"graphs_per_s_b{bs}"])
    out["best_batch_size"] = best
    out["graphs_per_s"] = out[f"graphs_per_s_b{best}"]
    out["edges_per_s"] = out[f"edges_per_s_b{best}"]
    # energy: no power telemetry through the relay (bench/energy.py), so
    # report the TDP-derived upper bound, explicitly suffixed _bound
    from gnnbuilder_tpu.bench.energy import TPU_TDP_W, energy_bound_j_per_graph

    out["energy_j_per_graph_bound"] = energy_bound_j_per_graph(
        1.0 / out["graphs_per_s"], TPU_TDP_W
    )
    out["energy_tdp_w_assumed"] = TPU_TDP_W
    return out


def bench_torch_cpu(
    conv: str, dataset: str, n_graphs: int = 64, reps: int = 3,
    batch_size: int = 1,
) -> dict:
    """Pure-torch golden model, single-threaded CPU — the PyG-CPU baseline
    analog (build_base_benchmarks.py:158-239).  ``batch_size`` > 1 merges
    that many graphs per forward (offset edge indices + batch vector) like
    the reference's *_b4 sweep arm (build_base_benchmarks.py:162)."""
    import torch

    from gnnbuilder_tpu.bench.canonical import CANONICAL
    from gnnbuilder_tpu.data.datasets import DATASET_SPECS, load_dataset
    from gnnbuilder_tpu.utils.stats import compute_pna_delta
    from gnnbuilder_tpu.verify import torch_ref as tr

    torch.set_num_threads(1)
    spec = DATASET_SPECS[dataset]
    graphs = load_dataset(dataset, n=n_graphs)
    kw = dict(CANONICAL)
    conv_kwargs = {}
    if conv == "pna":
        conv_kwargs["delta"] = compute_pna_delta(graphs)
    tmodel = tr.TorchGNNModel(
        graph_input_feature_dim=spec.node_dim,
        graph_input_edge_dim=spec.edge_dim,
        gnn_conv=conv,
        conv_kwargs=conv_kwargs,
        **kw,
    )
    tmodel.eval()
    if batch_size > 1:
        tensors = []
        for i in range(0, len(graphs) - batch_size + 1, batch_size):
            chunk = graphs[i : i + batch_size]
            off, xs, eis, bvec = 0, [], [], []
            for gi, g in enumerate(chunk):
                xs.append(torch.tensor(g.x))
                eis.append(torch.tensor(g.edge_index) + off)
                bvec.append(torch.full((g.num_nodes,), gi,
                                       dtype=torch.long))
                off += g.num_nodes
            tensors.append((
                torch.cat(xs, 0), torch.cat(eis, 1), torch.cat(bvec),
            ))
    else:
        tensors = [
            (torch.tensor(g.x), torch.tensor(g.edge_index)) for g in graphs
        ]
    def call(t):
        if batch_size > 1:
            tx, tei, bvec = t
            return tmodel(tx, tei, batch=bvec, num_graphs=batch_size)
        tx, tei = t
        return tmodel(tx, tei, num_graphs=1)

    with torch.no_grad():
        for t in tensors[:4]:  # warmup
            call(t)
        from gnnbuilder_tpu.bench.energy import (
            CPU_TDP_W,
            cpu_energy_j,
            energy_bound_j_per_graph,
        )

        def loop():
            for _ in range(reps):
                for t in tensors:
                    call(t)

        measured = cpu_energy_j(loop)  # RAPL when exposed (bare metal)
        if measured is not None:
            _, joules, dt_total = measured
            n_calls = reps * len(tensors)
            dt = dt_total / (n_calls * batch_size)
            e_per_graph = joules / (n_calls * batch_size)
            return {
                "latency_s": dt,
                "graphs_per_s": 1.0 / dt,
                "energy_j_per_graph": e_per_graph,  # measured (RAPL)
                "energy_w_avg": joules / dt_total,
            }
        t0 = time.perf_counter()
        loop()
        dt = (time.perf_counter() - t0) / (
            reps * len(tensors) * batch_size
        )
    return {
        "latency_s": dt,
        "graphs_per_s": 1.0 / dt,
        # no RAPL in this VM (bench/energy.py): TDP-derived upper bound
        "energy_j_per_graph_bound": energy_bound_j_per_graph(dt, CPU_TDP_W),
        "energy_tdp_w_assumed": CPU_TDP_W,
    }


def bench_xla_cpu(
    conv: str,
    dataset: str,
    batch_sizes: Sequence[int] = (1, 4, 256),
    n_graphs: int = 256,
    iters: int = 12,
) -> dict:
    """The compiled Program on the XLA **CPU** backend — the reference's
    ``cpp_cpu`` arm analog (build_gnnbuilder_benchmarks.py:156-232: the
    generated C++ kernel compiled for and timed on one CPU core).  Same
    model, same batches, same measurement protocol as ``bench_tpu``; only
    the backend differs, so the grid gains a third *measured* hardware
    arm.  With RAPL exposed (bare metal), package energy is measured
    around the timing loop; on this VM the TDP bound is reported instead.

    Must run in a process whose JAX platform is CPU (tests/conftest
    style: ``jax.config.update('jax_platforms', 'cpu')`` before first
    backend use, or ``GNNB_FORCE_CPU=1`` with the module CLI) — mixing
    relay-TPU and CPU compilation in one process risks concurrent relay
    work (CLAUDE.md).  The fused-dispatch policy handles the rest: off
    TPU, every kernel takes its XLA path automatically."""
    import jax

    if jax.default_backend() != "cpu":
        raise RuntimeError(
            "bench_xla_cpu needs a CPU-platform process; run "
            "`GNNB_FORCE_CPU=1 python -m gnnbuilder_tpu.bench.harness "
            "--backends xla_cpu`"
        )
    out = bench_tpu(conv, dataset, batch_sizes=batch_sizes,
                    n_graphs=n_graphs, iters=iters)
    # energy: RAPL measurement when the counters exist, around a
    # fixed-count forward loop at the best batch size (reference
    # pattern: build_base_benchmarks.py:188-213)
    from gnnbuilder_tpu.bench.energy import (
        CPU_TDP_W,
        cpu_energy_j,
        energy_bound_j_per_graph,
    )

    best = out["best_batch_size"]
    lat = out[f"latency_b{best}_s"]
    measured = None
    if lat > 0:
        import gnnbuilder_tpu as gnnb
        from gnnbuilder_tpu.bench.canonical import (
            canonical_batches,
            canonical_model,
        )

        graphs, batches = canonical_batches(
            dataset, n_graphs=max(n_graphs, best + 1), batch_size=best,
            node_multiple=256 if best > 8 else 8,
        )
        b = batches[0]
        model = canonical_model(conv, dataset, graphs=graphs)
        prog = gnnb.Program(model, max_nodes=b.num_nodes,
                            max_edges=b.num_edges, max_graphs=b.num_graphs)
        prog.init_params(b)
        fwd = prog.compile(b)
        fwd(prog.params, b).block_until_ready()  # warm
        k = max(int(0.5 / lat), 3)  # ~0.5 s of work for a stable delta

        def loop():
            for _ in range(k):
                fwd(prog.params, b).block_until_ready()

        measured = cpu_energy_j(loop)
    if measured is not None:
        _, joules, dt_total = measured
        out["energy_j_per_graph"] = joules / (k * best)  # measured (RAPL)
        out["energy_w_avg"] = joules / dt_total
        out.pop("energy_j_per_graph_bound", None)
    else:
        out["energy_j_per_graph_bound"] = energy_bound_j_per_graph(
            1.0 / out["graphs_per_s"], CPU_TDP_W
        )
        out["energy_tdp_w_assumed"] = CPU_TDP_W
    return out


import functools as _functools

_BACKENDS = {
    "tpu": bench_tpu,
    "torch_cpu": bench_torch_cpu,
    # the reference's batch=4 sweep arm (build_base_benchmarks.py:162,246)
    "torch_cpu_b4": _functools.partial(bench_torch_cpu, batch_size=4),
    # the reference's cpp_cpu arm analog: same compiled Program, XLA CPU
    "xla_cpu": bench_xla_cpu,
}


def run_grid(
    convs: Sequence[str] = DEFAULT_CONVS,
    datasets: Sequence[str] = DEFAULT_DATASETS,
    backends: Sequence[str] = ("tpu",),
    results_dir: str = "results",
    verbose: bool = True,
    **kw,
) -> list[dict]:
    """Run the grid; write reference-format flat files + results.json."""
    import inspect

    os.makedirs(results_dir, exist_ok=True)
    rows = []
    for backend in backends:
        fn = _BACKENDS[backend]
        # backends accept disjoint kwargs (iters/batch_sizes vs reps):
        # route only what each signature takes
        accepted = set(inspect.signature(fn).parameters)
        bkw = {k: v for k, v in kw.items() if k in accepted}
        for conv in convs:
            for ds in datasets:
                r = fn(conv, ds, **bkw)
                r.update(backend=backend, conv=conv, dataset=ds)
                base = FPGA_PAR_BASELINE_S.get((conv, ds))
                if base is not None:
                    r["vs_fpga_par"] = base / r["latency_s"]
                rows.append(r)
                # reference flat format: one value per file, parsed back by
                # process_and_plot_data.py:22-45
                metrics = ["latency_s", "graphs_per_s"]
                # the b4 point gets its own flat files, like the
                # reference's *_b4.txt results
                metrics += [m for m in ("latency_b4_s", "graphs_per_s_b4")
                            if m in r]
                for metric in metrics:
                    path = os.path.join(
                        results_dir, f"{metric}_{backend}_{conv}_{ds}.txt"
                    )
                    with open(path, "w") as f:
                        f.write(f"{r[metric]}\n")
                if verbose:
                    extra = (
                        f" ({r['vs_fpga_par']:.0f}x fpga_par)"
                        if "vs_fpga_par" in r
                        else ""
                    )
                    print(
                        f"{backend:10s} {conv:5s} {ds:8s} "
                        f"{r['latency_s'] * 1e3:8.3f} ms/graph"
                        f"{extra}",
                        flush=True,
                    )
    # merge with prior runs (other backends) instead of clobbering
    jpath = os.path.join(results_dir, "results.json")
    merged = []
    if os.path.exists(jpath):
        with open(jpath) as f:
            prior = json.load(f)
        ran = {(r["backend"], r["conv"], r["dataset"]) for r in rows}
        merged = [
            r for r in prior
            if (r["backend"], r["conv"], r["dataset"]) not in ran
        ]
    with open(jpath, "w") as f:
        json.dump(merged + rows, f, indent=1)
    return rows


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--convs", default=",".join(DEFAULT_CONVS))
    ap.add_argument("--datasets", default=",".join(DEFAULT_DATASETS))
    ap.add_argument("--backends", default="tpu")
    ap.add_argument("--results-dir", default="results")
    ap.add_argument("--n-graphs", type=int, default=512)
    args = ap.parse_args()
    if os.environ.get("GNNB_FORCE_CPU") == "1" or (
        args.backends.split(",") == ["xla_cpu"]
    ):
        # the xla_cpu arm needs a CPU-platform process; the env var alone
        # is too late under this machine's sitecustomize (CLAUDE.md), so
        # use the config API before first backend use
        import jax

        jax.config.update("jax_platforms", "cpu")
    run_grid(
        convs=args.convs.split(","),
        datasets=args.datasets.split(","),
        backends=args.backends.split(","),
        results_dir=args.results_dir,
        n_graphs=args.n_graphs,
    )


if __name__ == "__main__":
    main()
