"""ops/block.py (block-diagonal matmul aggregation) pinned numerically to
the ELL and flat-segment implementations — the repo convention that every
aggregation has >=2 implementations with identical numerics (CLAUDE.md),
extended to the third (matmul) form.  Reference semantics:
gcn/gin/sage/pna *_agg kernels, gnn_builder_lib.h:1223-1834."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnbuilder_tpu.core.graph import build_graph_batch
from gnnbuilder_tpu.data.datasets import load_dataset
from gnnbuilder_tpu.ops import block, ell, segment


@pytest.fixture(scope="module")
def batch():
    return build_graph_batch(load_dataset("qm9", n=48, seed=7),
                             block_size=128)


@pytest.fixture(scope="module")
def x(batch):
    return jax.random.normal(
        jax.random.PRNGKey(1), (batch.num_nodes, 32), jnp.float32
    )


def test_block_sum_matches_ell_and_segment(batch, x):
    b_sum = block.block_sum(x, batch.block_adj, mm="highest")
    e_sum = ell.ell_sum(x, batch.nbr_nodes, batch.in_degree)
    s_sum = segment.segment_sum(
        jnp.take(x, batch.senders, axis=0), batch.receivers, batch.num_nodes
    )
    np.testing.assert_allclose(b_sum, e_sum, atol=1e-5)
    # ghost row excluded: the flat segment path dumps the ghost->ghost pad
    # edges there by design (core/graph.py ghost-padding discipline)
    np.testing.assert_allclose(b_sum[:-1], s_sum[:-1], atol=1e-5)


def test_block_mean_std_match_ell(batch, x):
    out = block.block_multi(
        x, batch.block_adj, batch.in_degree, ("sum", "mean", "std"),
        mm="highest",
    )
    np.testing.assert_allclose(
        out["mean"], ell.ell_mean(x, batch.nbr_nodes, batch.in_degree),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        out["std"], ell.ell_std(x, batch.nbr_nodes, batch.in_degree),
        atol=1e-4,
    )


def test_split2_near_f32_vs_highest(batch, x):
    # hi/lo residual ~2^-16 relative of v per term (same contract as the
    # Pallas split2 gather, tol 5e-4 in fused_parity_tpu.json agg_kernel)
    hi = block.block_spmm(batch.block_adj, x, mm="highest")
    s2 = block.block_spmm(batch.block_adj, x, mm="split2")
    np.testing.assert_allclose(s2, hi, atol=5e-4)
    # and split2 is ~100x tighter than one-pass bf16
    b16 = block.block_spmm(batch.block_adj, x, mm="bf16")
    err_s2 = float(jnp.abs(s2 - hi).max())
    err_b16 = float(jnp.abs(b16 - hi).max())
    assert err_s2 < err_b16 / 20, (err_s2, err_b16)


def test_transpose_is_the_adjoint(batch, x):
    # <A x, y> == <x, A^T y> — the identity the autodiff backward relies on
    y = jax.random.normal(jax.random.PRNGKey(2), x.shape, jnp.float32)
    ax = block.block_spmm(batch.block_adj, x, mm="highest")
    aty = block.block_spmm(batch.block_adj, y, mm="highest", transpose=True)
    lhs = jnp.vdot(ax, y)
    rhs = jnp.vdot(x, aty)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def test_autodiff_grad_matches_ell_path(batch, x):
    def loss_block(v):
        return jnp.sum(
            block.block_spmm(batch.block_adj, v, mm="highest") ** 2
        )

    def loss_ell(v):
        return jnp.sum(ell.ell_sum(v, batch.nbr_nodes, batch.in_degree) ** 2)

    g_b = jax.grad(loss_block)(x)
    g_e = jax.grad(loss_ell)(x)
    np.testing.assert_allclose(g_b, g_e, atol=1e-3)


def test_empty_rows_produce_zero(batch, x):
    out = block.block_multi(
        x, batch.block_adj, batch.in_degree, ("sum", "mean", "std"),
        mm="highest",
    )
    deg = np.asarray(batch.in_degree)
    empty = deg == 0
    assert empty.any()  # pad rows at least
    np.testing.assert_allclose(np.asarray(out["sum"])[empty], 0.0)
    np.testing.assert_allclose(np.asarray(out["mean"])[empty], 0.0)
    np.testing.assert_allclose(
        np.asarray(out["std"])[empty], np.sqrt(1e-5), atol=1e-7
    )


def test_max_min_rejected():
    with pytest.raises(ValueError, match="no block form"):
        block.block_multi(
            jnp.zeros((128, 4)), jnp.zeros((1, 128, 128)),
            jnp.zeros((128,), jnp.int32), ("max",),
        )


def test_block_gat_attention_matches_ell_path(batch, x):
    """Dense masked per-block attention (block_gat_attention) == the ELL
    segment-softmax GAT on the same graphs, incl. self loops."""
    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.ops import dispatch

    conv = gnnb.GATConv(in_channels=32, out_channels=8, heads=4)
    params = conv.init(jax.random.PRNGKey(3), batch, x)
    # auto on CPU -> block path (dense attention)
    out_block = conv.apply(params, batch, x)
    dispatch.set_kernel_overrides(block_mode="off")
    try:
        out_ell = conv.apply(params, batch, x)
    finally:
        dispatch.set_kernel_overrides(block_mode=None)
    np.testing.assert_allclose(out_block, out_ell, atol=1e-5)


def test_block_gat_attention_edge_multiplicity():
    """k parallel edges contribute k softmax terms: A ⊙ exp(logits) must
    reproduce the flat-path result on a multigraph."""
    from gnnbuilder_tpu.core.graph import build_graph_batch
    from gnnbuilder_tpu.data.datasets import Graph
    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.ops import dispatch

    rng = np.random.default_rng(0)
    # tiny multigraph: edge (0 -> 1) twice, (2 -> 1) once, (1 -> 0) once
    g = Graph(
        x=rng.normal(size=(3, 6)).astype(np.float32),
        edge_index=np.array([[0, 0, 2, 1], [1, 1, 1, 0]], np.int64),
    )
    b = build_graph_batch([g], block_size=128, ell_width=8)
    conv = gnnb.GATConv(in_channels=6, out_channels=5, heads=2)
    xb = b.node_feat
    params = conv.init(jax.random.PRNGKey(1), b, xb)
    out_block = conv.apply(params, b, xb)  # dense path (CPU auto)
    dispatch.set_kernel_overrides(block_mode="off")
    try:
        out_flat = conv.apply(params, b.replace(nbr_nodes=None), xb)
    finally:
        dispatch.set_kernel_overrides(block_mode=None)
    np.testing.assert_allclose(
        np.asarray(out_block)[:3], np.asarray(out_flat)[:3], atol=1e-5
    )
