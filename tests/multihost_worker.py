"""Worker for tests/test_multihost_distributed.py — one PROCESS of a
2-process jax.distributed CPU run (the float-mode C-sim analog, SURVEY.md
§4, applied to the multi-HOST layer that single-process 8-device tests
cannot reach: make_multihost_mesh's host-grouped layout,
shard_batch_global's per-host addressable placement, and cross-process
gloo collectives under both GSPMD and explicit-halo train steps).

Invoked as:  python multihost_worker.py <process_id> <num_processes> <port>
with XLA_FLAGS=--xla_force_host_platform_device_count=4 in the env.
Prints one JSON line with losses + mesh-layout facts for the parent test.
"""

import json
import os
import sys

import jax

# sitecustomize imports jax with JAX_PLATFORMS=axon at interpreter start;
# config.update is the only effective way to force CPU (see CLAUDE.md)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

proc_id, n_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=n_procs,
    process_id=proc_id,
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import optax  # noqa: E402

import gnnbuilder_tpu as gnnb  # noqa: E402
from gnnbuilder_tpu.core.graph import build_graph_batch  # noqa: E402
from gnnbuilder_tpu.data.datasets import FakeDataset  # noqa: E402
from gnnbuilder_tpu.parallel.mesh import make_multihost_mesh  # noqa: E402
from gnnbuilder_tpu.parallel.sharding import shard_batch_global  # noqa: E402
from gnnbuilder_tpu.parallel.train import make_sharded_train_step  # noqa: E402
from gnnbuilder_tpu.train import stack_targets  # noqa: E402


def main():
    out = {
        "process_id": proc_id,
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
    }

    mesh = make_multihost_mesh(tp=2)
    dev = mesh.devices  # [dp, tp]
    # host-grouped layout: every tp row is single-host (collectives over
    # tp ride "ICI"); dp spans the hosts with consecutive shards host-local
    out["tp_rows_single_host"] = all(
        len({d.process_index for d in row}) == 1 for d in [None] for row in dev
    )
    out["dp_spans_hosts"] = sorted(
        {d.process_index for d in dev[:, 0]}
    ) == list(range(n_procs))
    dp_procs = [int(row[0].process_index) for row in dev]
    out["dp_host_blocks_contiguous"] = dp_procs == sorted(dp_procs)

    # identical deterministic inputs on every process (the
    # shard_batch_global contract: all hosts pack the same global batch)
    model = gnnb.GNNModel(
        graph_input_feature_dim=8,
        gnn_hidden_dim=16,
        gnn_num_layers=3,
        gnn_output_dim=8,
        gnn_conv="gcn",
        pooling_aggrs=("add", "mean"),
        mlp_hidden_dim=8,
        mlp_hidden_layers=1,
    )
    graphs = FakeDataset(num_graphs=8, avg_num_nodes=10, node_dim=8, seed=3)
    batch = build_graph_batch(graphs, node_multiple=64, edge_multiple=64)
    target = stack_targets(graphs, batch.num_graphs)
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = optax.adam(1e-3)

    for name, halo in (("gspmd", False), ("halo", True)):
        sbatch = shard_batch_global(mesh, batch)
        step, init = make_sharded_train_step(
            model, opt, mesh, sbatch, halo=halo, donate=False
        )
        p, s = init(params)
        p, s, loss = step(p, s, sbatch, target)
        # fully-addressable scalar: identical on all processes
        out[f"loss_{name}"] = float(loss)
        # second step proves updated (sharded) params round-trip
        _, _, loss2 = step(p, s, sbatch, target)
        out[f"loss2_{name}"] = float(loss2)

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
