"""Component-level PNA latency profile on the canonical QM9 b1024 batch.

Round-3 question: whole-model fused PNA fwd measured 1306us while GIN
(block path) runs 427us — where do PNA's microseconds go?  Times, all
chained-marginal (CLAUDE.md relay rules):

  model_fwd           whole canonical model (6 layers + readout)
  layer_fused_sub     ONE fused pna layer 128->128, default schedule
  layer_fused_128_s0  tile_rows=128, slack=0 (window == 128-block; the
                      block-local schedule candidate, works because the
                      batch is block-packed)
  layer_input_padded  the Fin=11 input layer via the auto-padding path
  readout_fused       fused readout standalone
  layer_xla_block     the XLA block branch of PNAConv (einsum + ell
                      max/min) standalone

Writes results_tpu/pna_profile.json.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gnnbuilder_tpu.bench.canonical import (
        canonical_batches,
        canonical_model,
    )
    from gnnbuilder_tpu.bench.timing import chained_marginal_time, marginal_time
    from gnnbuilder_tpu.ops import dispatch
    from gnnbuilder_tpu.ops.pallas.pna_layer import fused_pna_layer

    log(f"devices: {jax.devices()}")
    on_tpu = jax.default_backend() == "tpu"
    results = {}

    graphs, batches = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024, node_multiple=256,
        block_size=128,
    )
    b = batches[0]
    N = b.num_nodes
    F = 128
    model = canonical_model("pna", "qm9", graphs=graphs)
    params = model.init(jax.random.PRNGKey(0), b)
    delta = float((model.conv_kwargs or {}).get("delta", 1.0))

    # whole model
    fwd = jax.jit(lambda p, bb: model.apply(p, bb))
    st = {"b": b}

    def one_model():
        out = fwd(params, st["b"])
        st["b"] = st["b"].with_node_feat(
            st["b"].node_feat + 1e-12 * out.sum()
        )
        return st["b"].node_feat

    results["model_fwd_us"] = marginal_time(
        one_model, n_lo=5, n_hi=30, repeats=5) * 1e6
    log(f"model_fwd: {results['model_fwd_us']:.1f} us")

    # one fused layer, several schedules
    k = jax.random.PRNGKey(1)
    ks = jax.random.split(k, 6)
    w_pre = jax.random.normal(ks[0], (2 * F, F), jnp.float32) * 0.1
    b_pre = jnp.zeros((F,), jnp.float32)
    k_post = jax.random.normal(ks[2], (13 * F, F), jnp.float32) * 0.1
    b_post = jnp.zeros((F,), jnp.float32)
    w_lin = jax.random.normal(ks[4], (F, F), jnp.float32) * 0.1
    b_lin = jnp.zeros((F,), jnp.float32)
    x0 = jax.random.normal(ks[5], (N, F), jnp.float32)

    def time_layer(name, **kw):
        def f(x):
            return fused_pna_layer(
                x, b.nbr_nodes, b.in_degree,
                w_pre, b_pre, k_post, b_post, w_lin, b_lin, delta,
                gather_mode="split2", mm="bf16",
                interpret=not on_tpu, **kw,
            )

        fj = jax.jit(f)
        x = fj(x0)
        dt = chained_marginal_time(fj, x, n_lo=8, n_hi=40, repeats=5)
        results[name] = dt * 1e6
        log(f"{name}: {dt*1e6:.1f} us")

    tr = 512 if N % 512 == 0 else 256 if N % 256 == 0 else 128
    time_layer("layer_fused_sub_us", tile_rows=tr, window_slack=32,
               sub_rows=128)
    time_layer("layer_fused_128_s0_us", tile_rows=128, window_slack=0)

    # readout standalone (through the model's own tail)
    from gnnbuilder_tpu.ops.pallas.readout import fused_readout_auto
    from gnnbuilder_tpu.ops import segment

    weights = tuple(
        (params["params"]["mlp_head"][f"linear_{i}"]["kernel"],
         params["params"]["mlp_head"][f"linear_{i}"]["bias"])
        for i in range(5)
    )
    h64 = jax.random.normal(ks[5], (N, 64), jnp.float32)
    cnt = b.n_node.astype(jnp.float32)[:, None]

    def f_read(h):
        mx = segment.segment_max(h, b.node_graph, b.num_graphs, count=cnt)
        out = fused_readout_auto(
            h, b.n_node, weights, aggrs=("add", "mean", "max"), mx=mx,
            act="relu", maxg=b.max_graph_nodes_static,
            starts=b.graph_starts, block_size=128,
            interpret=not on_tpu, mm="bf16",
        )
        return h + 1e-12 * out.sum()

    fj = jax.jit(f_read)
    x = fj(h64)
    results["readout_fused_us"] = chained_marginal_time(
        fj, x, n_lo=8, n_hi=40, repeats=5) * 1e6
    log(f"readout_fused: {results['readout_fused_us']:.1f} us")

    # XLA readout tail for comparison
    def f_read_xla(h):
        pooled_s = segment.segment_sum(h, b.node_graph, b.num_graphs)
        mx = segment.segment_max(h, b.node_graph, b.num_graphs, count=cnt)
        pooled = jnp.concatenate(
            [pooled_s, pooled_s / jnp.maximum(cnt, 1.0), mx], axis=-1
        )
        hh = pooled
        for i, (w, bb) in enumerate(weights):
            hh = hh @ w + bb
            if i < len(weights) - 1:
                hh = jax.nn.relu(hh)
        return h + 1e-12 * hh.sum()

    fj = jax.jit(f_read_xla)
    x = fj(h64)
    results["readout_xla_us"] = chained_marginal_time(
        fj, x, n_lo=8, n_hi=40, repeats=5) * 1e6
    log(f"readout_xla: {results['readout_xla_us']:.1f} us")

    # input layer (Fin=11) through the model's first conv via auto-padding
    x11 = jax.random.normal(ks[5], (N, 11), jnp.float32)
    from gnnbuilder_tpu.ops.pallas.pna_layer import fused_pna_layer_auto

    w_pre11 = jax.random.normal(ks[0], (22, F), jnp.float32) * 0.1
    k_post11 = jax.random.normal(ks[2], (11 + 12 * F, F), jnp.float32) * 0.1

    def f_in(x):
        out = fused_pna_layer_auto(
            x, b.nbr_nodes, b.in_degree,
            w_pre11, b_pre, k_post11, b_post, w_lin, b_lin, delta,
            gather_mode="split2", mm="bf16", tile_rows=tr,
            window_slack=32, sub_rows=128, interpret=not on_tpu,
        )
        return x + 1e-12 * out.sum()

    fj = jax.jit(f_in)
    x = fj(x11)
    results["layer_input_padded_us"] = chained_marginal_time(
        fj, x, n_lo=8, n_hi=40, repeats=5) * 1e6
    log(f"layer_input_padded: {results['layer_input_padded_us']:.1f} us")

    out_path = os.path.join(ROOT, "results_tpu", "pna_profile.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
