"""DSE measurement harness — builds and times one design point.

The analog of the reference's build_single_combo
(experiments/build_dse_models.py:102-187), with the hours-long Vitis csynth
replaced by a jit compile + marginal-timed execution, and the csynth
resource report replaced by compiled-HLO cost analysis (FLOPs / bytes
accessed / peak memory), via Program.cost_analysis.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from gnnbuilder_tpu.compile.program import Program
from gnnbuilder_tpu.data.datasets import DATASET_SPECS
from gnnbuilder_tpu.dse.space import DSEConfig
from gnnbuilder_tpu.nn.model import GNNModel

__all__ = ["measure_config", "measure_many"]


def _build_model(cfg: DSEConfig, node_dim: int, edge_dim: int) -> GNNModel:
    conv_kwargs = {"delta": 2.0} if cfg.conv == "pna" else {}
    return GNNModel(
        graph_input_feature_dim=node_dim,
        graph_input_edge_dim=edge_dim,
        gnn_conv=cfg.conv,
        gnn_hidden_dim=cfg.gnn_hidden_dim,
        gnn_num_layers=cfg.gnn_num_layers,
        gnn_output_dim=cfg.gnn_output_dim,
        gnn_skip_connection=cfg.gnn_skip_connection,
        pooling_aggrs=("add", "mean", "max"),
        mlp_hidden_dim=cfg.mlp_hidden_dim,
        mlp_hidden_layers=cfg.mlp_hidden_layers,
        mlp_out_dim=1,
        conv_kwargs=conv_kwargs,
    )


def measure_config(
    cfg: DSEConfig,
    dataset: str = "qm9",
    iters: int = 15,
    seed: int = 0,
    repeats: int = 5,
    protocol: str = "inner",
    timing_only: bool = False,
) -> dict:
    """Compile + time one config; returns a flat result row.

    Row fields mirror the reference's perf_data.csv columns
    (process_dse_models.py:119-139): the config dict + measured latency (us)
    + the resource analogs (flops, bytes accessed, peak HBM — the
    BRAM-model label, process_dse_models.py:299-310).

    ``protocol`` selects the timing method (recorded in the row):
    * "inner" (default) — inner-chain per-op protocol
      (Program.benchmark_inner): k forwards inside one executable, slope
      over two k values.  The ~0.1 ms per-call host-issue floor cancels
      exactly, so sub-ms labels measure the KERNEL, not the relay
      (round-3 corpus regression: VERDICT r3 Weak #3 / dispatch_floor.json).
    * "chained" — the round-3 per-call chained marginal
      (Program.benchmark); includes the issue floor.
    """
    from gnnbuilder_tpu.bench.canonical import canonical_batches
    from gnnbuilder_tpu.ops import dispatch

    import dataclasses

    spec = DATASET_SPECS[dataset]
    # LG/Simple require in==out at every layer (reference models.py:274),
    # so their design points run with input == hidden == output dims; the
    # node features are zero-padded to width (values are timing-inert)
    eq_dims = cfg.conv in ("lg", "simple")
    if eq_dims:
        cfg = dataclasses.replace(cfg, gnn_output_dim=cfg.gnn_hidden_dim)
    node_dim = cfg.gnn_hidden_dim if eq_dims else spec.node_dim
    model = _build_model(cfg, node_dim, spec.edge_dim)

    n_graphs = max(cfg.batch_size, 32)
    graphs, batches = canonical_batches(
        dataset,
        n_graphs=n_graphs * 2,
        batch_size=cfg.batch_size,
        seed=seed,
        # align to the fused Pallas node tiles (ops/dispatch.py) exactly as
        # deployment does — otherwise the corpus measures the XLA fallback
        node_multiple=256 if cfg.batch_size >= 64 else 8,
        block_size=getattr(cfg, "block_size", 0),
        node_dim=node_dim if eq_dims else None,
    )
    batch = batches[0]
    # populate the dataset-statistics features the cost model learns from
    # (a hiv row must not look like a qm9 row)
    cfg = dataclasses.replace(
        cfg,
        avg_nodes=float(np.mean([g.num_nodes for g in graphs])),
        avg_edges=float(np.mean([g.num_edges for g in graphs])),
    )
    if cfg.ell_width == 0 and batch.nbr_nodes is not None:
        batch = batch.replace(nbr_nodes=None, nbr_edges=None)

    prog = Program(
        model,
        max_nodes=batch.num_nodes,
        max_edges=batch.num_edges,
        max_graphs=batch.num_graphs,
        precision=cfg.precision,
    )
    prog.init_params(batch)

    # pin the fused-kernel knobs this design point selects (the p-factor
    # analog); restored afterwards so policy state never leaks
    dispatch.set_kernel_overrides(
        tile_rows=cfg.tile_rows, gather_mode=cfg.gather_mode,
        window_mode=getattr(cfg, "window_mode", None),
        sub_rows=getattr(cfg, "sub_rows", None),
    )
    try:
        t0 = time.perf_counter()
        if not timing_only:
            # the deployable forward executable (what cost_analysis reads);
            # label-only remeasures skip it — benchmark_inner compiles its
            # own chain executables either way
            prog.compile(batch)
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        if protocol == "inner":
            # dynamic=True: one traced-trip-count executable serves both
            # slope arms — for a bulk corpus run the single (slow, ~20 min
            # cold) dyn-chain compile amortizes over hundreds of designs,
            # and the round-4b corpus was measured this way.  The public
            # benchmark_inner default is static (two cheap compiles) so a
            # one-off caller never hits the cold-compile wall.
            bench = prog.benchmark_inner(batch, iters=iters,
                                         repeats=repeats, dynamic=True)
        else:
            bench = prog.benchmark(batch, iters=iters, repeats=repeats)
        bench_s = time.perf_counter() - t0
        cost = {} if timing_only else prog.cost_analysis(batch)
    finally:
        dispatch.set_kernel_overrides(None, None, sub_rows=None,
                                      window_mode=None)

    row = dict(cfg.to_dict())
    row.update(
        dataset=dataset,
        num_nodes=batch.num_nodes,
        num_edges=batch.num_edges,
        latency_us=bench["latency_s"] * 1e6,
        latency_per_graph_us=bench["latency_s"] * 1e6 / cfg.batch_size,
        graphs_per_s=bench["graphs_per_s"],
        edges_per_s=bench["edges_per_s"],
        protocol=(
            protocol if protocol != "inner"
            else ("inner" if bench.get("resolved", True)
                  else "inner_upper_bound")
        ),
        overhead_us=bench.get("overhead_s", 0.0) * 1e6,
        flops=float(cost.get("flops", 0.0)),
        bytes_accessed=float(cost.get("bytes accessed", 0.0)),
        peak_hbm_bytes=float(cost.get("peak_hbm_bytes", 0.0)),
        compile_s=compile_s,
        measure_s=compile_s + bench_s,
    )
    return row


def measure_many(
    cfgs,
    dataset: str = "qm9",
    iters: int = 15,
    out_csv: Optional[str] = None,
    verbose: bool = True,
) -> list[dict]:
    """Measure a list of configs; optionally append rows to a CSV with
    resume-on-existing semantics (the reference resumes DSE sweeps via
    existence checks, process_dse_models.py:164-166)."""
    import csv
    import os

    done = set()
    rows = []
    if out_csv and os.path.exists(out_csv):
        with open(out_csv) as f:
            for existing in csv.DictReader(f):
                done.add(existing.get("_key"))
                rows.append(existing)

    writer = None
    fh = None
    try:
        for i, cfg in enumerate(cfgs):
            key = repr(sorted(cfg.to_dict().items()))
            if key in done:
                continue
            try:
                row = measure_config(cfg, dataset=dataset, iters=iters)
            except Exception as e:  # noqa: BLE001 — one bad design point
                # (e.g. a kernel-knob combo the compiler rejects) must not
                # kill a multi-hour sweep; the reference likewise skips
                # failed synthesis runs (process_dse_models.py:77-83)
                if verbose:
                    print(f"[{i + 1}/{len(cfgs)}] {cfg.conv} "
                          f"h{cfg.gnn_hidden_dim} b{cfg.batch_size} "
                          f"FAILED: {type(e).__name__}: {str(e)[:200]}",
                          flush=True)
                continue
            row["_key"] = key
            rows.append(row)
            if verbose:
                print(
                    f"[{i + 1}/{len(cfgs)}] {cfg.conv} h{cfg.gnn_hidden_dim} "
                    f"L{cfg.gnn_num_layers} b{cfg.batch_size} {cfg.precision} "
                    f"-> {row['latency_us']:.0f} us",
                    flush=True,
                )
            if out_csv:
                if writer is None:
                    # schema-safe append: if the existing header lacks any
                    # of this row's fields (a knob added since the corpus
                    # started — e.g. block_size in round 3), REWRITE the
                    # file with the union schema first; blind appending
                    # under a stale header misaligns every new row
                    fields = list(row)
                    if os.path.exists(out_csv):
                        with open(out_csv) as rfh:
                            old_fields = next(csv.reader(rfh), [])
                        if not set(fields) <= set(old_fields):
                            union = list(
                                dict.fromkeys(old_fields + fields)
                            )
                            with open(out_csv, "w", newline="") as wfh:
                                w = csv.DictWriter(wfh, fieldnames=union)
                                w.writeheader()
                                for r_old in rows[:-1]:
                                    w.writerow({k: r_old.get(k, "")
                                                for k in union})
                            fields = union
                        else:
                            fields = old_fields
                        fh = open(out_csv, "a", newline="")
                        writer = csv.DictWriter(fh, fieldnames=fields)
                    else:
                        fh = open(out_csv, "a", newline="")
                        writer = csv.DictWriter(fh, fieldnames=fields)
                        writer.writeheader()
                writer.writerow(row)
                fh.flush()
    finally:
        if fh:
            fh.close()
    return rows
