"""Decompose the in-situ PNA layer cost vs the bare kernel chain.

pna_sched_ab measured the bare fused layer at ~116us (tile schedule,
inner-chain), but the canonical model's per-layer share is ~165us.  Arms
(all inner-chain K=6, chained calls, within-run):

  bare          fused_pna_layer, no skip/act, plain kernel
  vjp           fused_pna_layer_vjp wrapper (custom_vjp, eval mode)
  skip          + skip connection input (extra [N, F] kernel read)
  act           + relu epilogue
  full          vjp + skip + act (the model's exact per-layer config)
  model         the whole canonical model / 6 (layer share incl. input
                padding + readout, for scale)

Writes results_tpu/pna_insitu.json.
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

    from gnnbuilder_tpu.bench.canonical import (
        canonical_batches,
        canonical_model,
    )
    from gnnbuilder_tpu.bench.timing import chained_marginal_time, marginal_time
    from gnnbuilder_tpu.ops.pallas.pna_layer import (
        fused_pna_layer,
        fused_pna_layer_vjp,
    )

    log(f"devices: {jax.devices()}")
    on_tpu = jax.default_backend() == "tpu"
    F = 128
    K = 6

    graphs, batches = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024, node_multiple=256
    )
    b = batches[0]
    N = b.num_nodes

    k = jax.random.PRNGKey(1)
    ks = jax.random.split(k, 6)
    w_pre = jax.random.normal(ks[0], (2 * F, F), jnp.float32) * 0.05
    b_pre = jnp.zeros((F,), jnp.float32)
    k_post = jax.random.normal(ks[2], (13 * F, F), jnp.float32) * 0.05
    b_post = jnp.zeros((F,), jnp.float32)
    w_lin = jax.random.normal(ks[4], (F, F), jnp.float32) * 0.05
    b_lin = jnp.zeros((F,), jnp.float32)
    x0 = jax.random.normal(ks[5], (N, F), jnp.float32)
    sched = dict(tile_rows=256, window_slack=32, sub_rows=128,
                 window_mode="tile", gather_mode="split2", mm="bf16",
                 interpret=not on_tpu)

    def arm(name, layer_fn):
        def f(x):
            for _ in range(K):
                x = layer_fn(x) * 0.1 + x * 0.01
            return x

        fj = jax.jit(f)
        x = fj(x0)
        x.block_until_ready()
        dt = chained_marginal_time(fj, x, n_lo=4, n_hi=16, repeats=5)
        us = dt * 1e6 / K
        log(f"{name}: {us:.1f} us/layer")
        return us

    results = {"meta": {"protocol": f"inner-chain K={K}", "N": N}}
    results["bare"] = arm("bare", lambda x: fused_pna_layer(
        x, b.nbr_nodes, b.in_degree,
        w_pre, b_pre, k_post, b_post, w_lin, b_lin, 2.0, **sched))
    results["vjp"] = arm("vjp", lambda x: fused_pna_layer_vjp(
        x, b.nbr_nodes, b.in_degree,
        w_pre, b_pre, k_post, b_post, w_lin, b_lin, 2.0,
        rev_nbr_nodes=b.rev_nbr_nodes, out_degree=b.out_degree, **sched))
    results["skip"] = arm("skip", lambda x: fused_pna_layer(
        x, b.nbr_nodes, b.in_degree,
        w_pre, b_pre, k_post, b_post, w_lin, b_lin, 2.0, skip=x, **sched))
    results["act"] = arm("act", lambda x: fused_pna_layer(
        x, b.nbr_nodes, b.in_degree,
        w_pre, b_pre, k_post, b_post, w_lin, b_lin, 2.0, act="relu",
        **sched))
    results["full"] = arm("full", lambda x: fused_pna_layer_vjp(
        x, b.nbr_nodes, b.in_degree,
        w_pre, b_pre, k_post, b_post, w_lin, b_lin, 2.0,
        skip=x, act="relu",
        rev_nbr_nodes=b.rev_nbr_nodes, out_degree=b.out_degree, **sched))

    # whole model for scale
    model = canonical_model("pna", "qm9", graphs=graphs)
    params = model.init(jax.random.PRNGKey(0), b)
    fwd = jax.jit(lambda p, bb: model.apply(p, bb))
    st = {"b": b}

    def one_model():
        out = fwd(params, st["b"])
        st["b"] = st["b"].with_node_feat(
            st["b"].node_feat + 1e-12 * out.sum())
        return st["b"].node_feat

    results["model_total_us"] = marginal_time(
        one_model, n_lo=5, n_hi=30, repeats=5) * 1e6
    log(f"model total: {results['model_total_us']:.1f} us")

    out = os.path.join(ROOT, "results_tpu", "pna_insitu.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
