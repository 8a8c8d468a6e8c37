"""Serving frontend: micro-batching over exported artifacts + int8
static-calibration parity.

Reference counterpart: the deployable-artifact story (code_gen.py:457-489
builds the .xclbin; the testbench is its one-graph-per-call host loop,
model_tb.cpp.jinja:167-204).  Here the artifact is a StableHLO export and
the host loop is a batching queue — these tests pin (a) server results ==
direct forward results, (b) the artifact path (no model definition at
load time), (c) p50/p99 accounting, (d) static int8 calibration staying
close to the dynamic path.
"""

import numpy as np
import pytest

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.data.datasets import load_dataset
from gnnbuilder_tpu.serve import GNNServer


@pytest.fixture(scope="module")
def setup():
    graphs = load_dataset("esol", n=24, seed=3)
    model = gnnb.GNNModel(
        graph_input_feature_dim=9, gnn_hidden_dim=16, gnn_num_layers=2,
        gnn_output_dim=8, gnn_conv="gcn", pooling_aggrs=("mean",),
        mlp_hidden_dim=8, mlp_hidden_layers=1, mlp_out_dim=1,
    )
    prog = gnnb.Program(model, max_nodes=512, max_edges=1024, max_graphs=9)
    prog.init_params(prog.batch(graphs[:4]))
    return graphs, prog


def test_server_matches_direct_forward(setup):
    graphs, prog = setup
    direct = []
    for g in graphs[:12]:
        out = prog.forward(prog.batch([g]))
        direct.append(np.asarray(out)[0])
    with GNNServer.from_program(prog, prog.batch(graphs[:4])) as server:
        preds = server.predict(graphs[:12])
        stats = server.stats()
    np.testing.assert_allclose(preds, np.stack(direct), rtol=2e-5, atol=2e-5)
    assert stats["served"] == 12
    # micro-batching actually batched (bucket holds 8 graphs)
    assert stats["batches"] < 12
    assert stats["p50_ms"] > 0 and stats["p99_ms"] >= stats["p50_ms"]


def test_server_from_artifact(tmp_path, setup):
    graphs, prog = setup
    path = str(tmp_path / "model.gnnbx")
    prog.export(path, prog.batch(graphs[:4]))
    direct = np.asarray(prog.forward(prog.batch(graphs[:3])))[:3]
    with GNNServer.from_artifact(path, prog.params) as server:
        preds = server.predict(graphs[:3])
    np.testing.assert_allclose(preds, direct, rtol=2e-5, atol=2e-5)


def test_server_from_bundle(tmp_path, setup):
    """Self-contained deployable directory: artifact + params round trip
    through a fresh server with nothing but the path."""
    graphs, prog = setup
    d = str(tmp_path / "bundle")
    prog.export_bundle(d, prog.batch(graphs[:4]))
    direct = np.asarray(prog.forward(prog.batch(graphs[:3])))[:3]
    with GNNServer.from_bundle(d) as server:
        preds = server.predict(graphs[:3])
    np.testing.assert_allclose(preds, direct, rtol=2e-5, atol=2e-5)


def test_server_overflow_splits_batches(setup):
    graphs, prog = setup
    # budget of 8 real graphs per batch; 20 requests must split into >= 3
    with GNNServer.from_program(
        prog, prog.batch(graphs[:4]), max_wait_ms=30.0
    ) as server:
        preds = server.predict(graphs[:20])
        stats = server.stats()
    assert preds.shape[0] == 20
    assert stats["batches"] >= 3


def test_int8_static_calibration(setup):
    graphs, _ = setup
    model = gnnb.GNNModel(
        graph_input_feature_dim=9, gnn_hidden_dim=16, gnn_num_layers=2,
        gnn_output_dim=8, gnn_conv="gcn", pooling_aggrs=("mean",),
        mlp_hidden_dim=8, mlp_hidden_layers=1, mlp_out_dim=1,
    )
    prog = gnnb.Program(
        model, max_nodes=512, max_edges=1024, max_graphs=9, precision="int8"
    )
    b0 = prog.batch(graphs[:8])
    b1 = prog.batch(graphs[8:16])
    prog.init_params(b0)
    dyn = np.asarray(prog.forward(b1))

    scales = prog.calibrate_int8([b0, b1])
    assert scales and all(s > 0 for s in scales.values())
    # every quantized Linear site got a scale (convs + mlp + final)
    assert any("mlp" in k for k in scales)

    static = np.asarray(prog.forward(b1))
    # static scales are a coarser approximation than per-row dynamic, but
    # on calibrated data they must stay in the same int8 error regime
    ref_scale = np.abs(dyn).max() + 1e-6
    assert np.abs(static - dyn).max() / ref_scale < 0.1

    # f32 reference: both int8 paths approximate it
    prog_f32 = gnnb.Program(model, max_nodes=512, max_edges=1024,
                            max_graphs=9, precision="f32")
    prog_f32.set_params(prog.params)
    full = np.asarray(prog_f32.forward(b1))
    assert np.abs(static - full).max() / (np.abs(full).max() + 1e-6) < 0.15


def test_server_block_packed():
    """GNNServer over a block-packed Program: micro-batched requests pack
    into the bin-packed layout the executable was compiled for."""
    import jax
    import numpy as np

    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.data.datasets import load_dataset
    from gnnbuilder_tpu.serve import GNNServer

    graphs = load_dataset("qm9", n=24, seed=4)
    model = gnnb.GNNModel(
        graph_input_feature_dim=11, gnn_hidden_dim=16, gnn_num_layers=2,
        gnn_output_dim=8, gnn_conv="gin", pooling_aggrs=("mean",),
        mlp_out_dim=1,
    )
    prog = gnnb.Program(model, max_nodes=1024, max_edges=2048,
                        max_graphs=25, block_size=128)
    b = prog.batch(graphs)
    prog.init_params(b)
    golden = np.asarray(prog.forward(b))[:24]
    with GNNServer.from_program(prog, batch_example=b) as srv:
        assert srv._block == 128
        out = srv.predict(graphs)
    np.testing.assert_allclose(out[:, 0], golden[:, 0], atol=1e-5)


def test_server_pipelined_burst_correctness():
    """A burst larger than one micro-batch exercises the pipelined
    dispatch (deferred materialization under load): every request must
    resolve with the same value as a direct forward, in order."""
    import numpy as np

    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.data.datasets import load_dataset
    from gnnbuilder_tpu.serve import GNNServer

    graphs = load_dataset("esol", n=40, seed=7)
    model = gnnb.GNNModel(
        graph_input_feature_dim=9, gnn_hidden_dim=16, gnn_num_layers=2,
        gnn_output_dim=8, gnn_conv="gcn", pooling_aggrs=("mean",),
        mlp_out_dim=1,
    )
    prog = gnnb.Program(model, max_nodes=256, max_edges=512, max_graphs=9)
    b0 = prog.batch(graphs[:8])
    prog.init_params(b0)
    goldens = []
    for i in range(0, 40, 8):
        bb = prog.batch(graphs[i : i + 8])
        goldens.extend(np.asarray(prog.forward(bb))[:8, 0].tolist())
    with GNNServer.from_program(prog, batch_example=b0,
                                max_wait_ms=1.0) as srv:
        futs = [srv.submit(g) for g in graphs]  # burst: many micro-batches
        outs = [float(f.result(timeout=120)[0]) for f in futs]
        stats = srv.stats()
    assert stats["batches"] >= 2  # the burst actually split into batches
    np.testing.assert_allclose(outs, goldens, atol=1e-5)


def test_deep_queue_fills_to_max_batch():
    """max_wait bounds how long the batcher WAITS for stragglers — it must
    not cap how many already-queued requests one micro-batch takes.  (The
    old deadline-capped drain silently limited every batch to ~50 graphs
    regardless of max_batch, measured on chip in serve_bench round 4.)
    With a slow forward and max_wait_ms=0, requests pile up while a batch
    is in flight; the next batch must take ALL of them."""
    import time

    import numpy as np

    from gnnbuilder_tpu.data.datasets import load_dataset
    from gnnbuilder_tpu.serve import GNNServer

    graphs = load_dataset("esol", n=48, seed=5)

    def slow_fn(batch):
        time.sleep(0.05)  # queue backs up behind this
        return np.zeros((batch.num_graphs, 1), np.float32)

    with GNNServer(
        slow_fn, None, node_budget=4096, edge_budget=8192,
        graph_budget=49, max_wait_ms=0.0,
    ) as srv:
        futs = [srv.submit(g) for g in graphs]
        for f in futs:
            f.result(timeout=60)
        st = srv.stats()
    assert st["served"] == 48
    # batch 1 takes whatever arrived first; everything queued behind the
    # slow call must land in at most two more batches (48 fits one)
    assert st["batches"] <= 3, st
