"""GNNModel(remat=True): per-layer rematerialization (jax.checkpoint).

The TPU HBM-for-FLOPs knob: each conv layer's backward residuals are
discarded and the layer forward replays during the backward.  Must be
numerics-neutral: identical param tree, identical forward, gradients
equal to the non-remat model's.
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import pytest

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu import train as gtrain
from gnnbuilder_tpu.core.graph import build_graph_batch
from gnnbuilder_tpu.data.datasets import load_dataset


def _models(conv):
    graphs = load_dataset("qm9", n=24)
    kw = dict(
        graph_input_feature_dim=graphs[0].x.shape[1],
        gnn_hidden_dim=32,
        gnn_num_layers=3,
        gnn_output_dim=16,
        gnn_conv=conv,
        gnn_skip_connection=True,
        pooling_aggrs=("add", "mean"),
        mlp_out_dim=1,
    )
    batch = build_graph_batch(graphs)
    return gnnb.GNNModel(**kw), gnnb.GNNModel(**kw, remat=True), batch


@pytest.mark.parametrize("conv", ["gcn", "pna"])
def test_remat_matches_baseline(conv):
    m0, m1, b = _models(conv)
    p = m0.init(jax.random.PRNGKey(0), b)
    assert jtu.tree_structure(p) == jtu.tree_structure(
        m1.init(jax.random.PRNGKey(0), b)
    ), "remat must not change the param tree"

    o0 = m0.apply(p, b)
    o1 = m1.apply(p, b)
    assert float(jnp.abs(o0 - o1).max()) == 0.0

    y = jnp.ones((b.num_graphs, 1), jnp.float32)

    def loss(params, model):
        out = model.apply(params, b)
        return gtrain.masked_mse_loss(out, y, b.graph_mask)

    g0 = jax.grad(lambda pp: loss(pp, m0))(p)
    g1 = jax.grad(lambda pp: loss(pp, m1))(p)
    max_dev = max(
        jax.tree.leaves(
            jtu.tree_map(lambda a, c: float(jnp.abs(a - c).max()), g0, g1)
        )
    )
    assert max_dev < 1e-6, f"remat grads deviate: {max_dev}"


def test_remat_train_step_runs():
    import optax

    _, m1, b = _models("gin")
    p = m1.init(jax.random.PRNGKey(0), b)
    y = jnp.ones((b.num_graphs, 1), jnp.float32)
    opt = optax.adam(1e-3)
    step = gtrain.make_train_step(m1, opt, donate=False)
    params, opt_state, l = step(p, opt.init(p), b, y)
    assert jnp.isfinite(l)
