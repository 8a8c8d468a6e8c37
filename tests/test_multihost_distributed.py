"""Real multi-PROCESS distribution test: 2 jax.distributed CPU processes
(4 virtual devices each, gloo collectives) running the dp-across-hosts /
tp-within-host split and the explicit-halo train step — the multi-host
claim make_multihost_mesh/shard_batch_global make, exercised across an
actual process boundary instead of a single-process 8-device mesh
(VERDICT round 2 item 7; the reference's closest analog is float-mode
C-sim without hardware, model.h.jinja:18-37)."""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import optax

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.core.graph import build_graph_batch
from gnnbuilder_tpu.data.datasets import FakeDataset
from gnnbuilder_tpu.train import make_train_step, stack_targets

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _reference_loss():
    """Single-device one-step loss on the worker's exact model/batch."""
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
    step = make_train_step(model, opt, donate=False)
    p, s, loss1 = step(params, opt.init(params), batch, target)
    _, _, loss2 = step(p, s, batch, target)
    return float(loss1), float(loss2)


def test_two_process_distributed_train_step():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # the workers force the cpu platform themselves (config.update)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{out}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out}"
        outs.append(json.loads(lines[-1][len("RESULT "):]))

    ref1, ref2 = _reference_loss()
    for o in outs:
        # 2 processes x 4 local devices = the 8-device global mesh
        assert o["global_devices"] == 8
        assert o["local_devices"] == 4
        # host-grouped layout claims (make_multihost_mesh docstring)
        assert o["tp_rows_single_host"]
        assert o["dp_spans_hosts"]
        assert o["dp_host_blocks_contiguous"]
        # both distribution strategies reproduce the single-device loss,
        # and the post-update second step stays in lockstep too
        for name in ("gspmd", "halo"):
            np.testing.assert_allclose(o[f"loss_{name}"], ref1, rtol=1e-4)
            np.testing.assert_allclose(o[f"loss2_{name}"], ref2, rtol=1e-4)

    # the loss is a replicated global scalar: identical across processes
    assert outs[0]["loss_halo"] == outs[1]["loss_halo"]
    assert outs[0]["loss_gspmd"] == outs[1]["loss_gspmd"]
