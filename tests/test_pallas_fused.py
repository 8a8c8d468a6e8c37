"""Fused Pallas ELL-aggregate kernel: parity vs the XLA ops (interpret mode
on CPU — the float-C-sim analog), gradient equivalence through the custom
VJP, and conv-level integration via the dispatch policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.data.datasets import FakeDataset
from gnnbuilder_tpu.ops import dispatch, ell
from gnnbuilder_tpu.ops.pallas.ell_agg import (
    fused_ell_aggregate,
    fused_ell_aggregate_vjp,
    supports,
)

AGGS = ("max", "min", "mean", "std")


def _batch(num_graphs=24, node_budget=512, seed=3):
    graphs = FakeDataset(
        num_graphs=num_graphs, avg_num_nodes=14, node_dim=8, edge_dim=4,
        seed=seed,
    )
    return gnnb.build_graph_batch(graphs, node_budget=node_budget)


def _ref_concat(v, u, b, aggs):
    table = ell.ell_gather(v, b.nbr_nodes)
    if u is not None:
        table = u[:, None, :] + table
    mask = ell.ell_mask(b.nbr_nodes, b.in_degree)
    d = ell.ell_multi_table(table, b.in_degree, aggs, mask)
    return jnp.concatenate([d[a] for a in aggs], -1)


@pytest.mark.parametrize("tile_rows,slack", [(128, 32), (256, 32), (512, 0)])
def test_fused_matches_ell_reference(tile_rows, slack):
    b = _batch()
    N, F = b.num_nodes, 16
    assert N == 512 and b.max_graph_nodes_static <= 32
    if not supports(N, tile_rows, slack):
        pytest.skip("precondition")
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
    got = fused_ell_aggregate(
        v, b.nbr_nodes, b.in_degree, AGGS, u=u,
        tile_rows=tile_rows, window_slack=slack, interpret=True,
    )
    ref = _ref_concat(v, u, b, AGGS)
    # std near-empty rows amplify 1-ulp gather differences by ~1/(2 sqrt(eps))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


def test_fused_no_u_sum():
    b = _batch()
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((b.num_nodes, 16)), jnp.float32)
    got = fused_ell_aggregate(
        v, b.nbr_nodes, b.in_degree, ("sum",),
        tile_rows=128, window_slack=32, interpret=True,
    )
    ref = ell.ell_sum(v, b.nbr_nodes, b.in_degree)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_vjp_matches_xla_grad():
    b = _batch()
    N, F = b.num_nodes, 16
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)

    def loss_fused(v, u):
        out = fused_ell_aggregate_vjp(
            v, b.nbr_nodes, b.in_degree, AGGS, u=u,
            tile_rows=128, window_slack=32, interpret=True,
        )
        return jnp.sum(out * out)

    def loss_ref(v, u):
        out = _ref_concat(v, u, b, AGGS)
        return jnp.sum(out * out)

    gv, gu = jax.grad(loss_fused, argnums=(0, 1))(v, u)
    rv, ru = jax.grad(loss_ref, argnums=(0, 1))(v, u)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=2e-3,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(ru), atol=2e-3,
                               rtol=1e-4)


def test_dispatch_policy():
    b = _batch()  # N=512, multi-tile on "always"
    try:
        dispatch.set_fused_mode("never")
        assert dispatch.fused_config(b) is None
        dispatch.set_fused_mode("always")
        cfg = dispatch.fused_config(b)
        assert cfg is not None and cfg["interpret"] is True
        # flat batch (no ELL tables) never dispatches
        flat = b.replace(nbr_nodes=None, nbr_edges=None)
        assert dispatch.fused_config(flat) is None
        # auto off-TPU falls back to XLA
        dispatch.set_fused_mode("auto")
        assert dispatch.fused_config(b) is None
    finally:
        dispatch.set_fused_mode("auto")


@pytest.mark.parametrize("conv_type", ["pna", "gin", "sage", "gcn", "lg", "simple"])
def test_model_forward_fused_matches_xla(conv_type):
    """Whole-model forward with fused kernels == XLA path (interpret mode)."""
    b = _batch(num_graphs=12, node_budget=256)
    kw = dict(
        graph_input_feature_dim=8, gnn_hidden_dim=16, gnn_num_layers=3,
        gnn_output_dim=16 if conv_type in ("lg", "simple") else 12,
        gnn_conv=conv_type, pooling_aggrs=("add", "mean"), mlp_out_dim=1,
        conv_kwargs={"delta": 2.0} if conv_type == "pna" else {},
    )
    if conv_type in ("lg", "simple"):
        kw["gnn_hidden_dim"] = 8
        kw["gnn_output_dim"] = 8
    model = gnnb.GNNModel(**kw)
    params = model.init(jax.random.PRNGKey(0), b)
    ref = np.asarray(model.apply(params, b))
    try:
        dispatch.set_fused_mode("always")
        got = np.asarray(model.apply(params, b))
    finally:
        dispatch.set_fused_mode("auto")
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)


def test_full_pna_layer_kernel_matches_reference():
    """Whole-PNA-layer fused kernel (ops/pallas/pna_layer.py) vs the XLA
    reference math, interpret mode."""
    from gnnbuilder_tpu.ops.pallas.pna_layer import (
        fused_pna_layer,
        fused_pna_layer_vjp,
        pna_layer_reference,
    )

    b = _batch()
    N, Fin = b.num_nodes, 16
    F, Fout = Fin, 16
    rng = np.random.default_rng(4)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)
    x = r(N, Fin)
    w_pre, b_pre = r(2 * Fin, F), r(F)
    k_post, b_post = r(Fin + 12 * F, Fout), r(Fout)
    w_lin, b_lin = r(Fout, Fout), r(Fout)
    args = (x, b.nbr_nodes, b.in_degree, w_pre, b_pre, k_post, b_post,
            w_lin, b_lin)
    got = fused_pna_layer(*args, 2.0, tile_rows=128, window_slack=32,
                          interpret=True)
    ref = pna_layer_reference(*args, 2.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4,
                               rtol=1e-3)

    # gradient path (custom VJP -> XLA reference backward)
    def loss_fused(x, w):
        out = fused_pna_layer_vjp(
            x, b.nbr_nodes, b.in_degree, w, b_pre, k_post, b_post,
            w_lin, b_lin, 2.0, tile_rows=128, window_slack=32,
            interpret=True)
        return jnp.sum(out * out)

    def loss_ref(x, w):
        out = pna_layer_reference(x, b.nbr_nodes, b.in_degree, w, b_pre,
                                  k_post, b_post, w_lin, b_lin, 2.0)
        return jnp.sum(out * out)

    gx, gw = jax.grad(loss_fused, argnums=(0, 1))(x, w_pre)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w_pre)
    # the backward IS the reference's own VJP; the only difference is the
    # cotangent (2*out_fused vs 2*out_ref).  Forward f32 order noise
    # (~4e-4) is amplified ~1/(2*sqrt(std_eps)) ~ 158x through the std
    # terms, so the grad bar is looser than the forward bar by design.
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-2,
                               rtol=1e-2)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-2,
                               rtol=1e-2)


def test_pna_conv_uses_full_layer_kernel():
    """PNAConv dispatches to the fused layer under mode 'always' and matches
    its own XLA path."""
    b = _batch(num_graphs=12, node_budget=256)
    conv = gnnb.PNAConv(in_channels=16, out_channels=16, delta=2.0)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((b.num_nodes, 16)),
        jnp.float32,
    )
    params = conv.init(jax.random.PRNGKey(0), b, x)
    ref = np.asarray(conv.apply(params, b, x))
    try:
        dispatch.set_fused_mode("always")
        got = np.asarray(conv.apply(params, b, x))
    finally:
        dispatch.set_fused_mode("auto")
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_fused_bf16_inputs_interpret():
    """bf16 node features through the fused kernel (the bf16 precision
    policy's path, gather_mode='bf16') — round-1 advisor high: the store
    used to raise 'Invalid dtype for swap: Ref bfloat16, Value float32'."""
    b = _batch()
    N, F = b.num_nodes, 16
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.standard_normal((N, F)), jnp.bfloat16)
    got = fused_ell_aggregate(
        v, b.nbr_nodes, b.in_degree, AGGS,
        tile_rows=256, window_slack=32, interpret=True,
        gather_mode="bf16",
    )
    assert got.dtype == jnp.bfloat16
    ref = _ref_concat(v.astype(jnp.float32), None, b, AGGS)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=0.1, rtol=0.05
    )


def test_supports_rejects_unaligned_slack():
    # window_slack must be 8-aligned (kernel asserts multiple_of on starts)
    assert not supports(512, 128, 4)
    assert supports(512, 128, 32)


def test_bf16_program_forward_fused():
    """End-to-end advisor repro: Program(precision='bf16') + non-PNA conv at
    128-aligned dims must run under fused dispatch (mode 'always' exercises
    the kernel in interpret mode off-TPU)."""
    graphs = FakeDataset(
        num_graphs=16, avg_num_nodes=14, node_dim=128, seed=11
    )
    model = gnnb.GNNModel(
        graph_input_feature_dim=128,
        gnn_hidden_dim=128,
        gnn_num_layers=2,
        gnn_output_dim=128,
        gnn_conv="gin",
        mlp_out_dim=1,
    )
    prog = gnnb.Program.from_dataset(model, graphs, batch_size=16,
                                     precision="bf16")
    batch = prog.batch(graphs[:16])
    prog.init_params(batch)
    dispatch.set_fused_mode("always")
    try:
        out = prog.forward(batch)
    finally:
        dispatch.set_fused_mode("auto")
    assert np.isfinite(np.asarray(out, np.float32)).all()


@pytest.mark.parametrize(
    "conv", ["gin", "sage", "gcn", "lg", "simple_sum", "simple_mean"]
)
def test_fused_mp_layer_matches_reference(conv):
    """Generic whole-layer kernel (ops/pallas/mp_layer.py) vs XLA reference,
    interpret mode, with fused skip + activation."""
    from gnnbuilder_tpu.ops.pallas.mp_layer import (
        fused_mp_layer_vjp,
        mp_layer_reference,
    )

    b = _batch()
    N, F = b.num_nodes, 16
    rng = np.random.default_rng(6)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3, jnp.float32)
    v = r(N, F)
    skip = r(N, F)
    kw = dict(tile_rows=128, window_slack=32, interpret=True,
              skip=skip, act="relu")
    if conv == "gin":
        p = dict(w0=r(F, F), b0=r(F), w1=r(F, F), b1=r(F), eps=0.15)
    elif conv == "sage":
        p = dict(w0=r(F, F), b0=r(F), w1=r(F, F))
    elif conv == "gcn":
        p = dict(b0=r(F))
    else:  # lg / simple_*: parameter-free epilogues
        p = {}
    got = fused_mp_layer_vjp(v, b.nbr_nodes, b.in_degree, conv, **p, **kw)
    ref = mp_layer_reference(v, b.nbr_nodes, b.in_degree, conv, **p,
                             skip=skip, act="relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4,
                               rtol=1e-3)

    # gradient path (custom VJP -> XLA reference backward)
    def loss(fn):
        def go(vv):
            out = fn(vv)
            return jnp.sum(out * out)
        return jax.grad(go)(v)

    gv = loss(lambda vv: fused_mp_layer_vjp(
        vv, b.nbr_nodes, b.in_degree, conv, **p, **kw))
    rv = loss(lambda vv: mp_layer_reference(
        vv, b.nbr_nodes, b.in_degree, conv, **p, skip=skip, act="relu"))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=2e-3,
                               rtol=1e-3)


@pytest.mark.parametrize(
    "conv_type", ["gin", "sage", "gcn", "lg", "simple"]
)
def test_conv_uses_fused_mp_layer(conv_type):
    """GIN/SAGE/GCN/LG/Simple dispatch to the whole-layer kernel under mode
    'always' (auto-padded 16-dim features) and match their own XLA path
    with the fused act+skip epilogue."""
    b = _batch(num_graphs=24, node_budget=512)
    cls = gnnb.SUPPORTED_GNN_CONVS[conv_type]
    conv = cls(in_channels=16, out_channels=16)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((b.num_nodes, 16)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((b.num_nodes, 16)), jnp.float32)
    params = conv.init(jax.random.PRNGKey(1), b, x)
    ref = np.asarray(conv.apply(params, b, x, act="relu", skip=skip))
    try:
        dispatch.set_fused_mode("always")
        got = np.asarray(conv.apply(params, b, x, act="relu", skip=skip))
    finally:
        dispatch.set_fused_mode("auto")
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("sub_rows", [256, 512])
def test_sub_rows_knob_is_schedule_invariant(sub_rows):
    """sub_rows widens the gather sub-tile (fewer, larger window DMAs —
    the DSE's DMA-latency knob).  It must be pure schedule: outputs
    bit-identical to the default TNS=128 for both the PNA and the generic
    mp layer kernels, interpret mode."""
    from gnnbuilder_tpu.ops.pallas.mp_layer import fused_mp_layer
    from gnnbuilder_tpu.ops.pallas.pna_layer import (
        _sub_rows as sub_rows_fn,
        fused_pna_layer,
        supports,
    )

    b = _batch(num_graphs=72, node_budget=1024, seed=9)
    N, F = b.num_nodes, 16
    assert N == 1024
    TN, SL = 512, 32
    assert supports(N, TN, SL, sub_rows)
    assert sub_rows_fn(TN, SL, sub_rows) == sub_rows
    # invalid values fall back to the 128 default rather than miscompiling
    assert sub_rows_fn(TN, SL, 96) == 128
    assert sub_rows_fn(TN, SL, 384) == 128

    rng = np.random.default_rng(11)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)
    x = r(N, F)
    args = (x, b.nbr_nodes, b.in_degree, r(2 * F, F), r(F),
            r(F + 12 * F, F), r(F), r(F, F), r(F))
    base = fused_pna_layer(*args, 2.0, tile_rows=TN, window_slack=SL,
                           interpret=True)
    wide = fused_pna_layer(*args, 2.0, tile_rows=TN, window_slack=SL,
                           interpret=True, sub_rows=sub_rows)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(wide))

    w0, b0_, w1, b1_ = r(F, F), r(F), r(F, F), r(F)
    mp_base = fused_mp_layer(x, b.nbr_nodes, b.in_degree, "gin",
                             w0=w0, b0=b0_, w1=w1, b1=b1_,
                             eps=0.1, tile_rows=TN, window_slack=SL,
                             interpret=True)
    mp_wide = fused_mp_layer(x, b.nbr_nodes, b.in_degree, "gin",
                             w0=w0, b0=b0_, w1=w1, b1=b1_,
                             eps=0.1, tile_rows=TN, window_slack=SL,
                             interpret=True, sub_rows=sub_rows)
    np.testing.assert_array_equal(np.asarray(mp_base), np.asarray(mp_wide))


def test_window_mode_tile_is_schedule_invariant():
    """window_mode='tile' (one window DMA per grid tile, sub-tiles slice
    VMEM) is a pure DMA-schedule change: outputs must be bit-identical to
    the per-sub-tile stream for all three fused layer kernel families,
    including the save_res residual paths."""
    from gnnbuilder_tpu.ops.pallas.gat_layer import fused_gat_layer
    from gnnbuilder_tpu.ops.pallas.mp_layer import fused_mp_layer
    from gnnbuilder_tpu.ops.pallas.pna_layer import fused_pna_layer

    b = _batch(num_graphs=72, node_budget=1024, seed=9)
    N, F = b.num_nodes, 16
    TN, SL = 512, 32
    rng = np.random.default_rng(17)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)
    x = r(N, F)
    skip = r(N, F)

    args = (x, b.nbr_nodes, b.in_degree, r(2 * F, F), r(F),
            r(F + 12 * F, F), r(F), r(F, F), r(F))
    for save in (False, True):
        outs = [
            fused_pna_layer(*args, 2.0, skip=skip, act="relu",
                            tile_rows=TN, window_slack=SL, interpret=True,
                            save_res=save, window_mode=wm)
            for wm in ("sub", "tile")
        ]
        if save:
            for a, c in zip(*outs):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
        else:
            np.testing.assert_array_equal(*map(np.asarray, outs))

    w0, b0_, w1, b1_ = r(F, F), r(F), r(F, F), r(F)
    for conv in ("gin", "lg"):
        kw = (dict(w0=w0, b0=b0_, w1=w1, b1=b1_, eps=0.1)
              if conv == "gin" else {})
        outs = [
            fused_mp_layer(x, b.nbr_nodes, b.in_degree, conv, **kw,
                           skip=skip, act="relu", tile_rows=TN,
                           window_slack=SL, interpret=True, window_mode=wm)
            for wm in ("sub", "tile")
        ]
        np.testing.assert_array_equal(*map(np.asarray, outs))

    H = 4
    gat_args = (x, b.nbr_nodes, b.in_degree, r(F, F),
                r(1, H, F // H), r(1, H, F // H), r(F))
    outs = [
        fused_gat_layer(*gat_args, H, skip=skip, act="relu",
                        tile_rows=TN, window_slack=SL, interpret=True,
                        window_mode=wm)
        for wm in ("sub", "tile")
    ]
    np.testing.assert_array_equal(*map(np.asarray, outs))


def test_window_mode_dispatch_override():
    """set_kernel_overrides(window_mode='tile') drives the whole-layer
    kernels through the tile-window DMA schedule at the model level with
    unchanged outputs (vs the default schedule)."""
    b = _batch(num_graphs=24, node_budget=512)
    conv = gnnb.SUPPORTED_GNN_CONVS["gin"](in_channels=16, out_channels=16)
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (b.num_nodes, 16), jnp.float32)
    params = conv.init(rng, b, x)

    dispatch.set_fused_mode("always")
    try:
        base = np.asarray(conv.apply(params, b, x, act="relu"))
        dispatch.set_kernel_overrides(window_mode="tile")
        tile = np.asarray(conv.apply(params, b, x, act="relu"))
    finally:
        dispatch.set_kernel_overrides(window_mode=None)
        dispatch.set_fused_mode("auto")
    np.testing.assert_array_equal(base, tile)


def test_fused_gine_layer_matches_reference():
    """Whole-layer GINE kernel (ops/pallas/gine_layer.py): dual windowed
    gather (node + CSR-sorted edge window) + relu message + GIN epilogue
    vs the XLA ELL reference, interpret mode, both window modes."""
    from gnnbuilder_tpu.ops.pallas.gine_layer import (
        fused_gine_layer,
        gine_layer_reference,
    )

    rng = np.random.default_rng(21)
    N, F, W = 1024, 16, 4
    base = np.arange(N)[:, None]
    nbr = np.clip(base + rng.integers(-24, 25, (N, W)), 0, N - 1)
    deg = rng.integers(0, W + 1, N).astype(np.int32)
    ro = np.zeros(N + 1, np.int32)
    ro[1:] = np.cumsum(deg)
    E = ((int(ro[-1]) + 7) // 8) * 8 + 512
    nbre = np.zeros((N, W), np.int32)
    for r in range(N):
        nbre[r, : deg[r]] = ro[r] + np.arange(deg[r])
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)
    x, pe, skip = r(N, F), r(E, F), r(N, F)
    w0, b0, w1, b1 = r(F, F), r(F), r(F, F), r(F)

    ref = gine_layer_reference(x, pe, jnp.asarray(nbr, jnp.int32),
                               jnp.asarray(nbre), jnp.asarray(deg),
                               w0, b0, w1, b1, eps=0.15, skip=skip,
                               act="relu")
    outs = []
    for wm in ("sub", "tile"):
        got = fused_gine_layer(
            x, pe, jnp.asarray(nbr, jnp.int32), jnp.asarray(nbre),
            jnp.asarray(ro), jnp.asarray(deg), w0, b0, w1, b1, eps=0.15,
            skip=skip, tile_rows=512, window_slack=24, interpret=True,
            act="relu", window_mode=wm)
        outs.append(got)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-3)
    np.testing.assert_array_equal(*map(np.asarray, outs))


def test_fused_gine_layer_grads():
    """Custom VJP (XLA-reference backward) matches grads of the reference."""
    from gnnbuilder_tpu.ops.pallas.gine_layer import (
        fused_gine_layer_vjp,
        gine_layer_reference,
    )

    rng = np.random.default_rng(22)
    N, F, W = 512, 16, 4
    base = np.arange(N)[:, None]
    nbr = np.clip(base + rng.integers(-24, 25, (N, W)), 0, N - 1)
    deg = rng.integers(0, W + 1, N).astype(np.int32)
    ro = np.zeros(N + 1, np.int32)
    ro[1:] = np.cumsum(deg)
    E = ((int(ro[-1]) + 7) // 8) * 8 + 256
    nbre = np.zeros((N, W), np.int32)
    for r_ in range(N):
        nbre[r_, : deg[r_]] = ro[r_] + np.arange(deg[r_])
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)
    x, pe = r(N, F), r(E, F)
    w0, b0, w1, b1 = r(F, F), r(F), r(F, F), r(F)

    def loss_fused(x_, pe_, w0_):
        o = fused_gine_layer_vjp(
            x_, pe_, jnp.asarray(nbr, jnp.int32), jnp.asarray(nbre),
            jnp.asarray(ro), jnp.asarray(deg), w0_, b0, w1, b1, eps=0.1,
            tile_rows=N, window_slack=24, interpret=True, act="relu")
        return (o ** 2).sum()

    def loss_ref(x_, pe_, w0_):
        o = gine_layer_reference(
            x_, pe_, jnp.asarray(nbr, jnp.int32), jnp.asarray(nbre),
            jnp.asarray(deg), w0_, b0, w1, b1, eps=0.1, act="relu")
        return (o ** 2).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, pe, w0)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, pe, w0)
    for a, c in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=5e-3, rtol=1e-2)


def test_gine_conv_uses_fused_layer():
    """GINEConv dispatches to the whole-layer kernel under mode 'always'
    and matches its own XLA path."""
    rng = np.random.default_rng(4)
    gs = []
    for _ in range(24):
        n = int(rng.integers(4, 12))
        e = int(rng.integers(4, 20))

        class G:
            pass

        g = G()
        g.x = rng.standard_normal((n, 16)).astype(np.float32)
        g.edge_index = rng.integers(0, n, size=(2, e))
        g.edge_attr = rng.standard_normal((e, 8)).astype(np.float32)
        gs.append(g)
    from gnnbuilder_tpu.core.graph import build_graph_batch

    b = build_graph_batch(gs, node_budget=512)
    conv = gnnb.SUPPORTED_GNN_CONVS["gine"](
        in_channels=16, out_channels=16, edge_dim=8)
    rngk = jax.random.PRNGKey(5)
    x = jax.random.normal(rngk, (b.num_nodes, 16), jnp.float32)
    params = conv.init(rngk, b, x)

    try:
        dispatch.set_fused_mode("never")
        ref = np.asarray(conv.apply(params, b, x, act="relu"))
        dispatch.set_fused_mode("always")
        got = np.asarray(conv.apply(params, b, x, act="relu"))
    finally:
        dispatch.set_fused_mode("auto")
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)
