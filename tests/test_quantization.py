"""Int8 quantized path: op-level accuracy, precision context plumbing, and
whole-Program int8 forward vs f32 (the FPX fixed-point analog —
the reference's fpga_par runs FPX(16,10), code_gen.py:39-52)."""

import jax
import jax.numpy as jnp
import numpy as np

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.compile.precision import Precision, active_precision
from gnnbuilder_tpu.data.datasets import FakeDataset
from gnnbuilder_tpu.ops import quant


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 16)) * 0.2, jnp.float32)
    got = np.asarray(quant.int8_matmul(x, w))
    ref = np.asarray(x @ w)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel  # 8-bit symmetric quantization error bound


def test_quantize_roundtrip():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((24, 8)), jnp.float32)
    q, s = quant.quantize_weight(w)
    back = np.asarray(q, np.float32) * np.asarray(s)[None, :]
    assert np.abs(back - np.asarray(w)).max() < np.asarray(s).max() * 0.51


def test_precision_context():
    assert active_precision() is None
    with Precision.int8().activate() as p:
        assert active_precision() is p
    assert active_precision() is None


def test_program_int8_forward_close_to_f32():
    graphs = FakeDataset(num_graphs=8, avg_num_nodes=12, node_dim=8, seed=4)
    model = gnnb.GNNModel(
        graph_input_feature_dim=8, gnn_hidden_dim=16, gnn_num_layers=3,
        gnn_output_dim=16, gnn_conv="gcn", pooling_aggrs=("mean",),
        mlp_out_dim=1,
    )
    p32 = gnnb.Program(model, max_nodes=256, max_edges=512, max_graphs=9)
    b = p32.batch(graphs)
    p32.init_params(b)
    out32 = np.asarray(p32.forward(b))

    p8 = gnnb.Program(model, max_nodes=256, max_edges=512, max_graphs=9,
                      precision="int8")
    p8.set_params(p32.params)
    out8 = np.asarray(p8.forward(b))
    denom = np.abs(out32).max() + 1e-6
    rel = np.abs(out8 - out32).max() / denom
    assert rel < 0.15, rel  # quantization noise accumulates over 3 layers
    assert np.isfinite(out8).all()


def test_int8_fused_aggregation_parity():
    """Under the int8 policy the aggregation-only fused kernel stays
    enabled (dispatch.py): aggregation is f32 in both paths (only matmuls
    quantize), so fused and XLA int8 forwards must agree exactly."""
    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.data.datasets import load_dataset
    from gnnbuilder_tpu.ops import dispatch

    graphs = load_dataset("esol", n=32)
    model = gnnb.GNNModel(
        graph_input_feature_dim=9, gnn_hidden_dim=128, gnn_num_layers=3,
        gnn_output_dim=128, gnn_conv="pna", conv_kwargs={"delta": 2.5},
        pooling_aggrs=("mean",), mlp_out_dim=1,
    )
    prog = gnnb.Program(
        model, max_nodes=1024, max_edges=2048, max_graphs=33,
        precision="int8",
    )
    batch = prog.batch(graphs)
    prog.init_params(batch)
    try:
        dispatch.set_fused_mode("never")
        o_never = np.asarray(prog.forward(batch))
        dispatch.set_fused_mode("always")
        o_fused = np.asarray(prog.forward(batch))
    finally:
        dispatch.set_fused_mode("auto")
    np.testing.assert_allclose(o_fused, o_never, atol=1e-6)


def test_int8_whole_layer_fusion_parity():
    """Under the int8 policy, GIN/SAGE layer kernels run a quant epilogue
    (in-kernel mirror of ops/quant.int8_matmul) and GCN's matmul-free
    kernel runs as-is.  Cross-path outputs differ by quantization steps
    (round() amplifies 1-ulp aggregation-order deltas), so the contract is
    ERROR parity: the fused path's int8-vs-f32 error must match the XLA
    int8 path's."""
    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.data.datasets import load_dataset
    from gnnbuilder_tpu.ops import dispatch

    graphs = load_dataset("esol", n=48)
    for conv in ("gin", "sage", "gcn", "gine", "pna", "gat"):
        model = gnnb.GNNModel(
            graph_input_feature_dim=9, gnn_hidden_dim=128,
            gnn_num_layers=3, gnn_output_dim=128, gnn_conv=conv,
            pooling_aggrs=("mean",), mlp_out_dim=1,
            conv_kwargs={"edge_dim": 3} if conv == "gine" else (
                {"delta": 2.0} if conv == "pna" else (
                    {"heads": 4} if conv == "gat" else {})),
        )
        kw = dict(max_nodes=2048, max_edges=4096, max_graphs=49)
        prog_f = gnnb.Program(model, **kw, precision="f32")
        b = prog_f.batch(graphs)
        try:
            dispatch.set_fused_mode("never")
            gold = np.asarray(prog_f.forward(b))
            prog_q = gnnb.Program(model, **kw, precision="int8")
            prog_q.params = prog_f.params
            ref = np.asarray(prog_q.forward(b))
            dispatch.set_fused_mode("always")
            prog_q2 = gnnb.Program(model, **kw, precision="int8")
            prog_q2.params = prog_f.params
            got = np.asarray(prog_q2.forward(b))
        finally:
            dispatch.set_fused_mode("auto")
        m = np.asarray(b.graph_mask)  # ghost row: garbage by contract
        sc = np.abs(gold[m]).max() + 1e-9
        e_xla = np.abs((ref - gold)[m]).max() / sc
        e_fus = np.abs((got - gold)[m]).max() / sc
        assert e_fus < max(2.0 * e_xla, 0.02), (conv, e_xla, e_fus)
