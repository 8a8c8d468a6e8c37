"""Fused readout kernel (ops/pallas/readout.py): banded pooling SpMM + MLP
head + output activation vs the XLA tail, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.data.datasets import FakeDataset
from gnnbuilder_tpu.ops import dispatch


def _setup(rng, G=100, maxg=20, F=128):
    n_node = rng.integers(4, maxg + 1, G).astype(np.int32)
    n_real = int(n_node[:-1].sum())
    N = ((n_real + 255) // 256) * 256 + 512
    n_node[-1] = N - n_real  # ghost graph absorbs all pad rows
    x = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)
    goff = np.zeros(G + 1, np.int64)
    goff[1:] = np.cumsum(n_node)
    seg = np.clip(
        np.searchsorted(goff[1:], np.arange(N), side="right"), 0, G - 1
    )
    mx = jax.ops.segment_max(x, jnp.asarray(seg), num_segments=G)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    return n_node, x, mx, maxg


def _weights(rng, A, F, out=1):
    dims = [A * F, 64, 64, out]
    return tuple(
        (jnp.asarray(rng.normal(size=(dims[i], dims[i + 1]), scale=0.1),
                     jnp.float32),
         jnp.asarray(rng.normal(size=(dims[i + 1],)), jnp.float32))
        for i in range(3)
    )


@pytest.mark.parametrize(
    "aggrs", [("add",), ("mean",), ("add", "mean"), ("add", "mean", "max")]
)
def test_readout_matches_reference(aggrs):
    from gnnbuilder_tpu.ops.pallas.readout import (
        fused_readout,
        readout_reference,
    )

    rng = np.random.default_rng(13)
    n_node, x, mx, maxg = _setup(rng)
    ws = _weights(rng, len(aggrs), x.shape[1])
    m = mx if "max" in aggrs else None
    ref = readout_reference(x, jnp.asarray(n_node), ws, aggrs=aggrs, mx=m,
                            act="relu")
    got = fused_readout(x, jnp.asarray(n_node), ws, aggrs=aggrs, mx=m,
                        act="relu", tile_graphs=32, maxg=maxg,
                        interpret=True)
    # ghost row (last): finite garbage by contract on the fused path
    np.testing.assert_allclose(np.asarray(got[:-1]), np.asarray(ref[:-1]),
                               atol=1e-4, rtol=1e-4)
    assert bool(jnp.isfinite(got[-1]).all())


def test_readout_grads():
    from gnnbuilder_tpu.ops.pallas.readout import (
        fused_readout_vjp,
        readout_reference,
    )

    rng = np.random.default_rng(14)
    n_node, x, mx, maxg = _setup(rng, G=64, maxg=16, F=16)
    ws = _weights(rng, 3, 16)
    flat = tuple(a for wb in ws for a in wb)
    mask = jnp.asarray(np.arange(64) < 63, jnp.float32)[:, None]

    def lf(xx, fw):
        wt = tuple((fw[2 * i], fw[2 * i + 1]) for i in range(3))
        o = fused_readout_vjp(xx, jnp.asarray(n_node), wt,
                              aggrs=("add", "mean", "max"), mx=mx,
                              act="relu", tile_graphs=16, maxg=maxg,
                              interpret=True)
        return ((o * mask) ** 2).sum()

    def lr(xx, fw):
        wt = tuple((fw[2 * i], fw[2 * i + 1]) for i in range(3))
        o = readout_reference(xx, jnp.asarray(n_node), wt,
                              aggrs=("add", "mean", "max"), mx=mx,
                              act="relu")
        return ((o * mask) ** 2).sum()

    gf = jax.grad(lf, argnums=(0, 1))(x, flat)
    gr = jax.grad(lr, argnums=(0, 1))(x, flat)
    for a, c in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        rel = float(jnp.abs(a - c).max() / (jnp.abs(c).max() + 1e-9))
        assert rel < 1e-3


def test_model_dispatches_fused_readout():
    """GNNModel routes pooling+MLP through the readout kernel under
    'always' (proven by a call counter) with masked-output parity vs the
    XLA tail, and training gradients flow through its custom VJP."""
    import gnnbuilder_tpu.ops.pallas.readout as ro

    graphs = FakeDataset(num_graphs=150, avg_num_nodes=14, node_dim=16,
                         seed=3)
    b = gnnb.build_graph_batch(graphs, node_budget=4096)
    model = gnnb.GNNModel(
        graph_input_feature_dim=16, gnn_hidden_dim=16, gnn_num_layers=2,
        gnn_output_dim=16, gnn_conv="gcn",
        pooling_aggrs=("add", "mean", "max"), mlp_out_dim=2,
        mlp_hidden_layers=2,
    )
    params = model.init(jax.random.PRNGKey(0), b)
    ref = np.asarray(model.apply(params, b))

    calls = {"n": 0}
    orig = ro.fused_readout_auto

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    ro.fused_readout_auto = counting
    try:
        dispatch.set_fused_mode("always")
        got = np.asarray(model.apply(params, b))

        def loss(p):
            out = model.apply(p, b)
            m = b.graph_mask[:, None]
            return ((out * m) ** 2).sum()

        gf = jax.grad(loss)(params)
        dispatch.set_fused_mode("never")
        gr = jax.grad(loss)(params)
    finally:
        ro.fused_readout_auto = orig
        dispatch.set_fused_mode("auto")

    assert calls["n"] >= 1, "fused readout not taken"
    m = np.asarray(b.graph_mask)
    np.testing.assert_allclose(got[m], ref[m], atol=1e-4, rtol=1e-4)
    for a, c in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        rel = float(np.abs(np.asarray(a) - np.asarray(c)).max()
                    / (np.abs(np.asarray(c)).max() + 1e-9))
        assert rel < 1e-3


@pytest.mark.parametrize(
    "kw",
    [
        {"mlp_activation": "elu"},           # act outside the fused set
        {"pooling_aggrs": ("max",)},          # no add/mean: band is dead work
    ],
    ids=["unsupported-act", "pure-max"],
)
def test_model_readout_falls_back(kw):
    """Configs the readout kernel does not cover must fall back to the XLA
    tail (not crash) even under 'always' — regression for the elu crash."""
    graphs = FakeDataset(num_graphs=40, avg_num_nodes=12, node_dim=16,
                         seed=5)
    b = gnnb.build_graph_batch(graphs, node_budget=1024)
    margs = dict(
        graph_input_feature_dim=16, gnn_hidden_dim=16, gnn_num_layers=1,
        gnn_output_dim=16, gnn_conv="gcn",
        pooling_aggrs=("add", "mean"), mlp_out_dim=2, mlp_hidden_layers=1,
    )
    margs.update(kw)
    model = gnnb.GNNModel(**margs)
    params = model.init(jax.random.PRNGKey(0), b)
    try:
        dispatch.set_fused_mode("never")
        ref = np.asarray(model.apply(params, b))
        dispatch.set_fused_mode("always")
        got = np.asarray(model.apply(params, b))
    finally:
        dispatch.set_fused_mode("auto")
    m = np.asarray(b.graph_mask)
    np.testing.assert_allclose(got[m], ref[m], atol=1e-4, rtol=1e-4)
