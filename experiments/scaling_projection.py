"""Scaling-efficiency projection for the BASELINE 2-host target.

BASELINE.json: ">=80% scaling efficiency on 2 hosts (edge-partitioned
batches, all-to-all boundary exchange overlapped with local aggregation)".
This environment exposes ONE physical chip, so the multi-chip figure
cannot be measured; this script produces the honest substitute:

  1. mechanics validation — the sharded train step (GSPMD and explicit
     halo paths) runs on an 8-device virtual CPU mesh with loss parity
     vs single-device (also pinned by tests/test_train_parallel.py);
  2. an analytic projection — per-step communication volume computed
     from the REAL batch geometry and parameter count, divided by
     datasheet ICI bandwidth, against the MEASURED single-chip step time
     (results_tpu/bench_r2.json), with and without compute overlap.

The halo design makes the boundary exchange per chip per layer a fixed
2 * slack * F * 4 bytes (independent of batch size — parallel/halo.py),
so the projection's only load-bearing assumption is the ICI bandwidth
constant, taken at 45 GB/s/link/direction (TPU v5e datasheet; a v5e pod
connects up to 256 chips over ICI, so "2 hosts" rides ICI, not DCN).

Writes results_tpu/scaling_projection.json.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ICI_BW = 45e9          # bytes/s per link per direction, TPU v5e
CHIPS_PER_HOST = 8     # v5e board


def main():
    import jax

    import numpy as np

    from gnnbuilder_tpu.bench.canonical import canonical_batches, canonical_model

    # --- real geometry: canonical PNA/QM9 batch & model ------------------
    graphs, batches = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024, node_multiple=256
    )
    b = batches[0]
    model = canonical_model("pna", "qm9", graphs=graphs)
    params = model.init(jax.random.PRNGKey(0), b)
    p_bytes = sum(p.nbytes for p in jax.tree.leaves(params))
    n_layers = model.gnn_num_layers
    F = model.gnn_hidden_dim
    slack = int(np.ceil(b.max_graph_nodes_static / 8) * 8)

    # --- measured single-chip step time ----------------------------------
    bench_path = os.path.join(ROOT, "results_tpu", "bench_r3.json")
    with open(bench_path) as f:
        bench = json.load(f)
    t_train = bench["train_step_b1024_ms"] / 1e3
    t_fwd = 1.0 / bench["value"] * 1024  # forward-only, same batch

    # --- per-step communication volumes (bytes PER CHIP) -----------------
    # halo exchange: each conv layer swaps one fixed-size boundary block
    # (slack rows x F floats) with each ring neighbor, forward AND in the
    # transpose aggregation of the backward.
    halo_layer = 2 * slack * F * 4                 # send+recv, one layer
    halo_fwd = n_layers * halo_layer
    halo_step = 2 * halo_fwd                       # fwd + bwd transpose
    # gradient all-reduce: ring all-reduce moves 2 * P bytes per chip.
    grad_ar = 2 * p_bytes

    def project(n_chips: int, training: bool, weak: bool,
                block_layout: bool = False) -> dict:
        # weak scaling: per-chip batch stays b1024 (global batch grows) —
        # per-chip compute constant; strong scaling: global batch fixed at
        # b1024, per-chip compute shrinks (and the comm/compute ratio is
        # the worst case for the target).
        t1 = t_train if training else t_fwd
        t_compute = t1 if weak else t1 / n_chips
        # block-diagonal layout (round 3): graphs never cross a dp shard
        # boundary, so conv layers move ZERO bytes — training comm is the
        # gradient all-reduce alone, inference comm is zero
        if block_layout:
            comm = grad_ar if training else 0
        else:
            comm = (halo_step + grad_ar) if training else halo_fwd
        t_comm = comm / ICI_BW
        # halo is positioned to overlap local aggregation (parallel/halo.py);
        # the grad all-reduce overlaps the backward of earlier layers.
        eff_overlap = t_compute / max(t_compute, t_comm)
        eff_serial = t_compute / (t_compute + t_comm)
        return {
            "chips": n_chips,
            "hosts": max(1, n_chips // CHIPS_PER_HOST),
            "t_compute_ms": t_compute * 1e3,
            "comm_bytes_per_chip": comm,
            "t_comm_ms": t_comm * 1e3,
            "efficiency_overlapped": eff_overlap,
            "efficiency_serial": eff_serial,
        }

    widths = (2, 4, 8, 16, 32)
    rows_train = [project(n, True, weak=False) for n in widths]
    rows_train_weak = [project(n, True, weak=True) for n in widths]
    rows_inf = [project(n, False, weak=False) for n in widths]
    rows_block = [project(n, True, weak=False, block_layout=True)
                  for n in widths]

    # the headline: 2 hosts, training, weak scaling, NO overlap credit —
    # the most conservative reading of the target that is still projectable
    two_hosts = project(2 * CHIPS_PER_HOST, True, weak=True)
    two_hosts_strong = project(2 * CHIPS_PER_HOST, True, weak=False)

    out = {
        "geometry": {
            "batch": "qm9 b1024", "nodes": int(b.num_nodes),
            "layers": n_layers, "hidden": F, "halo_rows": slack,
            "param_bytes": int(p_bytes),
            "halo_bytes_per_layer_per_chip": halo_layer,
            "grad_allreduce_bytes_per_chip": int(grad_ar),
        },
        "measured_single_chip": {
            "train_step_ms": t_train * 1e3, "forward_ms": t_fwd * 1e3,
            "source": "results_tpu/bench_r3.json (chained protocol)",
        },
        "assumptions": {
            "ici_bw_bytes_per_s": ICI_BW,
            "note": "v5e ICI per link per direction; 2 hosts ride ICI "
                    "inside a pod slice, not DCN",
        },
        "projection_training_strong": rows_train,
        "projection_training_weak": rows_train_weak,
        "projection_inference_strong": rows_inf,
        "projection_training_strong_block_layout": rows_block,
        "block_layout_note": (
            "block-diagonal packing (core/graph.py block_size) keeps every "
            "graph inside one dp shard: conv layers exchange ZERO bytes; "
            "inference scales embarrassingly parallel and training comm "
            "is the gradient all-reduce alone"
        ),
        "two_hosts_training": {
            "weak_serial_no_overlap_credit": two_hosts["efficiency_serial"],
            "weak_overlapped": two_hosts["efficiency_overlapped"],
            "strong_serial": two_hosts_strong["efficiency_serial"],
            "strong_overlapped": two_hosts_strong["efficiency_overlapped"],
        },
        "baseline_target": ">=0.80 at 2 hosts",
    }
    path = os.path.join(ROOT, "results_tpu", "scaling_projection.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "two_hosts_weak_serial": round(two_hosts["efficiency_serial"], 3),
        "two_hosts_strong_overlapped": round(
            two_hosts_strong["efficiency_overlapped"], 3),
        "two_hosts_strong_serial": round(
            two_hosts_strong["efficiency_serial"], 3),
        "comm_ms": round(two_hosts["t_comm_ms"], 4),
    }))


if __name__ == "__main__":
    main()
