"""Hand-written Pallas backward kernels vs the XLA-reference backward.

The fused layers' custom VJPs route through the generic reverse-ELL gather
kernel (ops/pallas/ell_bwd.py) when the batch carries reverse tables.
These tests pin the hand-written gradients against jax.grad of the XLA
reference implementations (ops/ell.py math — the same ground truth the
forward parity tests use), in interpret mode on CPU, including the nasty
cases: tied extrema (duplicate feature rows -> XLA splits the gradient
evenly), degree-0 rows (no gradient), and degree-1 rows (std gradient is
exactly zero through XLA's relu'(0) — the dev-pair formulation must cancel
exactly, not approximately).

Reference counterpart: the reference has no backward at all (training is
plain PyTorch, SURVEY.md §1); PyTorch autograd through PyG layers is the
semantic baseline, matched here via the XLA reference.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnnbuilder_tpu.core.graph import build_graph_batch


class _G:
    def __init__(self, n, e, rng, F=8, dup=False):
        self.x = rng.standard_normal((n, F)).astype(np.float32)
        if dup and n > 3:  # duplicate rows -> exact ties in max/min
            self.x[1] = self.x[0]
            self.x[3] = self.x[0]
        self.edge_index = rng.integers(0, n, size=(2, e))
        self.edge_attr = None


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(11)
    gs = [
        _G(int(rng.integers(4, 12)), int(rng.integers(4, 20)), rng,
           dup=(i % 2 == 0))
        for i in range(9)
    ]
    b = build_graph_batch(gs)
    assert b.rev_nbr_nodes is not None
    # the batch must actually contain the hard cases
    deg = np.asarray(b.in_degree)[np.asarray(b.node_mask)]
    assert (deg == 0).any() and (deg == 1).any()
    return b


def _kw(b):
    return dict(tile_rows=b.num_nodes, window_slack=0, interpret=True,
                gather_mode="split2")


def _rel(a, b):
    return float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))


@pytest.mark.parametrize(
    "aggs",
    [("sum",), ("mean",), ("max",), ("min",), ("std",), ("mean", "std"),
     ("max", "min", "mean", "std"), ("sum", "max")],
)
def test_ell_agg_backward_parity(batch, aggs):
    from gnnbuilder_tpu.ops.pallas.ell_agg import (
        _reference,
        fused_ell_aggregate_vjp,
    )

    b = batch
    v0 = b.node_feat
    rng = np.random.default_rng(0)
    ct = jnp.asarray(
        rng.standard_normal((b.num_nodes, len(aggs) * 8)).astype(np.float32)
    )

    def loss_fused(v):
        return (fused_ell_aggregate_vjp(
            v, b.nbr_nodes, b.in_degree, aggs,
            rev_nbr_nodes=b.rev_nbr_nodes, out_degree=b.out_degree,
            **_kw(b)) * ct).sum()

    def loss_ref(v):
        return (_reference(v, None, b.nbr_nodes, b.in_degree, aggs)
                * ct).sum()

    gf = jax.grad(loss_fused)(v0)
    gr = jax.grad(loss_ref)(v0)
    assert _rel(gf, gr) < 3e-4, aggs


@pytest.mark.parametrize(
    "conv", ["gin", "sage", "gcn", "lg", "simple_sum", "simple_mean"]
)
def test_mp_layer_backward_parity(batch, conv):
    from gnnbuilder_tpu.ops.pallas.mp_layer import (
        fused_mp_layer_vjp,
        mp_layer_reference,
    )

    b = batch
    N, F = b.node_feat.shape
    H, Fout = 16, 8
    rng = np.random.default_rng(1)
    r = lambda *s, sc=0.3: jnp.asarray(
        rng.standard_normal(s).astype(np.float32) * sc
    )
    if conv == "gin":
        p = dict(w0=r(F, H), b0=r(H, sc=0.1), w1=r(H, Fout),
                 b1=r(Fout, sc=0.1), skip=r(N, Fout, sc=1.0))
        st = dict(eps=0.3, act="relu")
    elif conv == "sage":
        p = dict(w0=r(F, Fout), b0=r(Fout, sc=0.1), w1=r(F, Fout))
        st = dict(act="tanh")
    elif conv == "gcn":
        p = dict(b0=r(F, sc=0.1))
        st = dict(act=None)
    else:  # lg / simple_*: parameter-free epilogues
        p = dict(skip=r(N, F, sc=1.0))
        st = dict(act="relu")
    kw = dict(_kw(b), mm="f32")

    def loss_fused(v, pp):
        return (fused_mp_layer_vjp(
            v, b.nbr_nodes, b.in_degree, conv,
            rev_nbr_nodes=b.rev_nbr_nodes, out_degree=b.out_degree,
            **pp, **st, **kw) ** 2).sum()

    def loss_ref(v, pp):
        return (mp_layer_reference(
            v, b.nbr_nodes, b.in_degree, conv,
            w0=pp.get("w0"), b0=pp.get("b0"), w1=pp.get("w1"),
            b1=pp.get("b1"), eps=st.get("eps", 0.0),
            skip=pp.get("skip"), act=st.get("act")) ** 2).sum()

    gv_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(b.node_feat, p)
    gv_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(b.node_feat, p)
    assert _rel(gv_f, gv_r) < 3e-4, conv
    for k in p:
        assert _rel(gp_f[k], gp_r[k]) < 3e-4, (conv, k)


@pytest.mark.parametrize("use_skip,act", [(True, "relu"), (False, None)])
def test_pna_layer_backward_parity(batch, use_skip, act):
    from gnnbuilder_tpu.ops.pallas.pna_layer import (
        fused_pna_layer_vjp,
        pna_layer_reference,
    )

    b = batch
    N, Fin = b.node_feat.shape
    F, Fout = Fin, 8
    rng = np.random.default_rng(2)
    r = lambda *s, sc=0.3: jnp.asarray(
        rng.standard_normal(s).astype(np.float32) * sc
    )
    params = dict(
        w_pre=r(2 * Fin, F), b_pre=r(F, sc=0.1),
        k_post=r(Fin + 12 * F, Fout), b_post=r(Fout, sc=0.1),
        w_lin=r(Fout, Fout), b_lin=r(Fout, sc=0.1),
    )
    skip = r(N, Fout, sc=1.0)
    delta = 1.3
    kw = dict(_kw(b), mm="f32")

    def loss_fused(x, pp):
        return (fused_pna_layer_vjp(
            x, b.nbr_nodes, b.in_degree, **pp, delta=delta,
            skip=skip if use_skip else None,
            rev_nbr_nodes=b.rev_nbr_nodes, out_degree=b.out_degree,
            act=act, **kw) ** 2).sum()

    def loss_ref(x, pp):
        return (pna_layer_reference(
            x, b.nbr_nodes, b.in_degree,
            pp["w_pre"], pp["b_pre"], pp["k_post"], pp["b_post"],
            pp["w_lin"], pp["b_lin"], delta,
            skip=skip if use_skip else None, act=act) ** 2).sum()

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(b.node_feat, params)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(b.node_feat, params)
    assert _rel(gx_f, gx_r) < 5e-4
    for k in params:
        assert _rel(gp_f[k], gp_r[k]) < 5e-4, k


def test_whole_model_grads_through_fused_backward(batch):
    """End-to-end: a GNNModel trained step's grads with fused dispatch
    ("always" -> interpret kernels + hand-written backward on CPU) match the
    XLA path ("never") — the integration the train loop actually runs."""
    from gnnbuilder_tpu.nn.model import GNNModel
    from gnnbuilder_tpu.ops import dispatch

    b = batch
    model = GNNModel(
        graph_input_feature_dim=b.node_feat.shape[1], gnn_hidden_dim=8,
        gnn_num_layers=2, gnn_output_dim=8, gnn_conv="pna",
        gnn_skip_connection=True, mlp_hidden_dim=8, mlp_hidden_layers=1,
        mlp_out_dim=1, conv_kwargs={"delta": 1.2},
    )
    params = model.init(jax.random.PRNGKey(0), b)

    def loss(p):
        return (model.apply(p, b) ** 2).sum()

    mode = dispatch.get_fused_mode()
    try:
        dispatch.set_fused_mode("never")
        g_ref = jax.grad(loss)(params)
        dispatch.set_fused_mode("always")
        g_fused = jax.grad(loss)(params)
    finally:
        dispatch.set_fused_mode(mode)

    flat_r = jax.tree.leaves(g_ref)
    flat_f = jax.tree.leaves(g_fused)
    for a, c in zip(flat_f, flat_r):
        assert _rel(a, c) < 1e-3


def test_gather_backward_window_mode_tile_invariant():
    """fused_gather_backward under window_mode='tile' (one coefficient-
    window DMA per grid tile) is bit-identical to the per-sub-tile
    stream, for both the full PNA term set and the lin-only mp shape."""
    from gnnbuilder_tpu.ops.pallas.ell_bwd import fused_gather_backward

    rng = np.random.default_rng(7)
    N, F, W = 1024, 16, 4
    base = np.arange(N)[:, None]
    nbr = jnp.asarray(
        np.clip(base + rng.integers(-24, 25, (N, W)), 0, N - 1), jnp.int32
    )
    deg = jnp.asarray(rng.integers(0, W + 1, N), jnp.int32)
    v = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)

    cstk7 = jnp.asarray(rng.standard_normal((N, 7 * F)), jnp.float32)
    kw = dict(has_lin=True, has_dev=True, n_cmp=2,
              fwd_gather_mode="split2", tile_rows=512, window_slack=24,
              interpret=True)
    outs = [
        fused_gather_backward(cstk7, nbr, deg, v=v, window_mode=wm, **kw)
        for wm in ("sub", "tile")
    ]
    np.testing.assert_array_equal(*map(np.asarray, outs))

    c1 = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
    outs = [
        fused_gather_backward(c1, nbr, deg, has_lin=True, tile_rows=512,
                              window_slack=24, interpret=True,
                              window_mode=wm)
        for wm in ("sub", "tile")
    ]
    np.testing.assert_array_equal(*map(np.asarray, outs))
