"""Worker for experiments/multiproc_scaling.py — one PROCESS of an
N-process jax.distributed CPU run, pinned to its own disjoint core set so
the 1-proc baseline and the 2-proc run get IDENTICAL resources per process
(weak scaling: the only thing the 2-proc run adds is the cross-process
gloo collective traffic — the DCN-analog the efficiency number measures).

Invoked as:
  python multiproc_scaling_worker.py <proc_id> <n_procs> <port> \
      <cores_per_proc> <batch_per_shard> <hidden> <layers> <steps>

Prints one ``RESULT {json}`` line (process 0 carries the timings).
"""

import json
import os
import sys
import time

proc_id, n_procs, port, cpp, bps, hidden, layers, steps = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4]),
    int(sys.argv[5]), int(sys.argv[6]), int(sys.argv[7]), int(sys.argv[8]),
)

# disjoint physical cores per process BEFORE any thread pools spawn
os.sched_setaffinity(0, range(proc_id * cpp, (proc_id + 1) * cpp))

import jax  # noqa: E402

# sitecustomize imports jax with JAX_PLATFORMS=axon baked in; config.update
# is the only effective way to force CPU (CLAUDE.md)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=n_procs,
    process_id=proc_id,
)

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402
import optax  # noqa: E402

import gnnbuilder_tpu as gnnb  # noqa: E402
from gnnbuilder_tpu.core.graph import build_graph_batch  # noqa: E402
from gnnbuilder_tpu.data.datasets import load_dataset  # noqa: E402
from gnnbuilder_tpu.parallel.mesh import make_multihost_mesh  # noqa: E402
from gnnbuilder_tpu.parallel.sharding import shard_batch_global  # noqa: E402
from gnnbuilder_tpu.parallel.train import make_sharded_train_step  # noqa: E402
from gnnbuilder_tpu.train import stack_targets  # noqa: E402


def time_steps(step, p, s, batch, target, n_steps):
    """Median seconds/step over 3 windows; CPU block_until_ready is a real
    fence (no relay), and consecutive steps chain through the params."""
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            p, s, loss = step(p, s, batch, target)
        loss.block_until_ready()
        windows.append((time.perf_counter() - t0) / n_steps)
    return float(np.median(windows)), float(loss)


def main():
    mesh = make_multihost_mesh(tp=2)
    dp = mesh.shape["dp"]
    # weak scaling: batch grows with dp, per-shard work constant
    graphs = load_dataset("qm9", n=bps * dp, seed=7)
    out = {
        "process_id": proc_id,
        "n_procs": n_procs,
        "dp": int(dp),
        "tp": int(mesh.shape["tp"]),
        "global_batch": bps * dp,
    }

    model = gnnb.GNNModel(
        graph_input_feature_dim=graphs[0].x.shape[1],
        gnn_hidden_dim=hidden,
        gnn_num_layers=layers,
        gnn_output_dim=hidden,
        gnn_conv="gcn",
        pooling_aggrs=("add", "mean"),
        mlp_hidden_dim=64,
        mlp_hidden_layers=2,
    )
    opt = optax.adam(1e-3)

    mult = 128 * dp
    for name, halo, block in (
        ("gspmd", False, 0),
        ("halo", True, 0),
        ("block", False, 128),
    ):
        batch = build_graph_batch(
            graphs,
            node_multiple=mult,
            edge_multiple=mult,
            block_size=block or None,
        )
        target = stack_targets(graphs, batch.num_graphs)
        sbatch = shard_batch_global(mesh, batch)
        step, init = make_sharded_train_step(
            model, opt, mesh, sbatch, halo=halo, donate=False
        )
        params = model.init(jax.random.PRNGKey(0), batch)
        p, s = init(params)
        p, s, _ = step(p, s, sbatch, target)  # compile + warm
        dt, loss = time_steps(step, p, s, sbatch, target, steps)
        out[f"step_s_{name}"] = dt
        out[f"graphs_per_s_{name}"] = bps * dp / dt
        out[f"loss_{name}"] = loss

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
