"""Block-matmul fused layer kernel (ops/pallas/mp_layer._block_kernel) in
interpret mode, pinned to the XLA reference — the same fused-vs-reference
contract as tests/test_pallas_fused.py, for the block-diagonal aggregation
path.  Reference conv semantics: gnn_builder_lib.h:1213-1549, 2159-2341,
2347-2634."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnbuilder_tpu.core.graph import build_graph_batch
from gnnbuilder_tpu.data.datasets import load_dataset
from gnnbuilder_tpu.ops import dispatch
from gnnbuilder_tpu.ops.pallas.mp_layer import (
    block_tile_rows,
    fused_mp_layer,
    fused_mp_layer_vjp,
    mp_layer_reference,
)

F = 128


@pytest.fixture(scope="module")
def batch():
    return build_graph_batch(load_dataset("qm9", n=64, seed=5),
                             block_size=128)


@pytest.fixture(scope="module")
def data(batch):
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 6)
    N = batch.num_nodes
    return dict(
        v=jax.random.normal(ks[0], (N, F), jnp.float32),
        w0=jax.random.normal(ks[1], (F, F), jnp.float32) * 0.1,
        b0=jax.random.normal(ks[2], (F,), jnp.float32) * 0.1,
        w1=jax.random.normal(ks[3], (F, F), jnp.float32) * 0.1,
        b1=jax.random.normal(ks[4], (F,), jnp.float32) * 0.1,
        skip=jax.random.normal(ks[5], (N, F), jnp.float32),
    )


def test_block_tile_rows():
    assert block_tile_rows(1024, 128) == 1024
    assert block_tile_rows(128 * 157, 128) == 128  # prime block count
    assert block_tile_rows(128 * 12, 128) == 768   # 6*128 <= cap, 12 % 6
    assert block_tile_rows(1000, 128) is None      # not block-divisible


@pytest.mark.parametrize("conv", ["gin", "sage", "gcn", "lg", "simple_sum",
                                  "simple_mean"])
def test_block_kernel_matches_reference(batch, data, conv):
    tn = block_tile_rows(batch.num_nodes, 128, cap=512)
    out = fused_mp_layer(
        data["v"], None, batch.in_degree, conv,
        w0=data["w0"], b0=data["b0"], w1=data["w1"], b1=data["b1"],
        skip=data["skip"], act="relu",
        tile_rows=tn, interpret=True, gather_mode="highest", mm="f32",
        block_adj=batch.block_adj,
    )
    ref = mp_layer_reference(
        data["v"], batch.nbr_nodes, batch.in_degree, conv,
        w0=data["w0"], b0=data["b0"], w1=data["w1"], b1=data["b1"],
        skip=data["skip"], act="relu",
    )
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_block_kernel_save_s(batch, data):
    tn = block_tile_rows(batch.num_nodes, 128, cap=512)
    out, s = fused_mp_layer(
        data["v"], None, batch.in_degree, "gin",
        w0=data["w0"], b0=data["b0"], w1=data["w1"], b1=data["b1"],
        tile_rows=tn, interpret=True, gather_mode="highest", mm="f32",
        block_adj=batch.block_adj, save_s=True,
    )
    from gnnbuilder_tpu.ops import ell

    np.testing.assert_allclose(
        s, ell.ell_sum(data["v"], batch.nbr_nodes, batch.in_degree),
        atol=1e-5,
    )


@pytest.mark.parametrize("conv", ["gin", "sage", "gcn"])
def test_block_kernel_vjp_grads(batch, data, conv):
    tn = block_tile_rows(batch.num_nodes, 128, cap=512)

    def f_blk(v, w0, b0, w1, b1):
        out = fused_mp_layer_vjp(
            v, None, batch.in_degree, conv,
            w0=w0, b0=b0, w1=w1, b1=b1, act="relu",
            tile_rows=tn, interpret=True, gather_mode="highest", mm="f32",
            block_adj=batch.block_adj,
        )
        return jnp.sum(out ** 2)

    def f_ref(v, w0, b0, w1, b1):
        out = mp_layer_reference(
            v, batch.nbr_nodes, batch.in_degree, conv,
            w0=w0, b0=b0, w1=w1, b1=b1, act="relu",
        )
        return jnp.sum(out ** 2)

    args = (data["v"], data["w0"], data["b0"], data["w1"], data["b1"])
    g_blk = jax.grad(f_blk, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g_blk, g_ref):
        scale = max(float(jnp.abs(b).max()), 1e-9)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-4
        )


def test_dispatch_block_layer_cfg(batch):
    # hardware-verified (results_tpu/block_verify_r3.json): defaults ON
    assert dispatch.staged_r3_ok()
    dispatch.set_fused_mode("always")
    try:
        cfg = dispatch.block_layer_cfg(batch)
        assert cfg is not None
        assert cfg["tile_rows"] % 128 == 0
        assert batch.num_nodes % cfg["tile_rows"] == 0
    finally:
        dispatch.set_fused_mode("auto")


def test_model_block_kernel_path_matches_xla(batch):
    """Whole model through the block KERNEL (always mode, interpret) vs the
    XLA block einsum branch (auto on CPU) — same batch, same params."""
    import gnnbuilder_tpu as gnnb

    model = gnnb.GNNModel(
        graph_input_feature_dim=11,
        gnn_hidden_dim=128,
        gnn_num_layers=2,
        gnn_output_dim=128,
        gnn_conv="gin",
        pooling_aggrs=("add", "mean"),
        mlp_out_dim=1,
        gnn_skip_connection=True,
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    o_xla = np.asarray(model.apply(params, batch))
    dispatch.set_fused_mode("always")
    try:
        o_krn = np.asarray(model.apply(params, batch))
    finally:
        dispatch.set_fused_mode("auto")
    # ghost-graph row is garbage by contract under block packing (its pad
    # rows are scattered; every consumer masks it)
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(o_krn[gm], o_xla[gm], atol=5e-4)


def test_fused_readout_block_spans(batch):
    """Fused readout (always mode, interpret) on a BLOCK-PACKED batch vs
    the XLA pooling+MLP tail — the bands must come from graph_starts, not
    cumsum(n_node) (pad rows interleave between graphs)."""
    import gnnbuilder_tpu as gnnb

    model = gnnb.GNNModel(
        graph_input_feature_dim=11,
        gnn_hidden_dim=16,
        gnn_num_layers=1,
        gnn_output_dim=128,
        gnn_conv="gin",
        pooling_aggrs=("add", "mean", "max"),
        mlp_hidden_dim=32,
        mlp_hidden_layers=2,
        mlp_out_dim=3,
    )
    params = model.init(jax.random.PRNGKey(1), batch)
    o_xla = np.asarray(model.apply(params, batch))
    dispatch.set_fused_mode("always")
    try:
        cfg = dispatch.readout_config(
            batch, aggrs=("add", "mean", "max"), act="relu", out_act=None
        )
        assert cfg is not None and cfg.get("block_size") == 128
        o_fused = np.asarray(model.apply(params, batch))
    finally:
        dispatch.set_fused_mode("auto")
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(o_fused[gm], o_xla[gm], atol=5e-4)


def test_fused_readout_block_grads(batch):
    import gnnbuilder_tpu as gnnb

    model = gnnb.GNNModel(
        graph_input_feature_dim=11,
        gnn_hidden_dim=16,
        gnn_num_layers=1,
        gnn_output_dim=128,
        gnn_conv="gin",
        pooling_aggrs=("add", "mean"),
        mlp_out_dim=1,
    )
    params = model.init(jax.random.PRNGKey(1), batch)
    gm = batch.graph_mask

    def loss(p):
        out = model.apply(p, batch)
        m = gm.astype(out.dtype)[:, None]
        return ((out * m) ** 2).sum()

    g_xla = jax.grad(loss)(params)
    dispatch.set_fused_mode("always")
    try:
        g_fused = jax.grad(loss)(params)
    finally:
        dispatch.set_fused_mode("auto")
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
