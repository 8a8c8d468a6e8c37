"""Decompose the canonical PNA b1024 train step (round 5).

bench.py's train arm has sat at ~7 ms for three rounds (VERDICT r4
weak #5).  Before building stack-level backward kernels, attribute the
time: training forward (per-layer fused kernels), loss+backward, optax
adam update, and — for contrast — the inference-mode forward (stack
kernel) and the XLA (mode=never) training paths.

All arms chain through a real data dependency (params or x feed the
next call) and use marginal timing; within-run numbers only.

Writes results_tpu/train_decomp.json.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu import train as gtrain
    from gnnbuilder_tpu.bench.canonical import (
        canonical_batches,
        canonical_model,
    )
    from gnnbuilder_tpu.bench.timing import marginal_time
    from gnnbuilder_tpu.ops import dispatch

    log(f"devices: {jax.devices()}")
    graphs, tb = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024, node_multiple=256
    )
    tbatch = tb[0]
    model = canonical_model("pna", "qm9", graphs=graphs)
    y = jnp.zeros((tbatch.num_graphs, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), tbatch)
    results = {"meta": {"bs": 1024, "N": tbatch.num_nodes,
                        "protocol": "chained-marginal, within-run"}}

    def arm(name, call, warm):
        warm()
        dts = sorted(
            marginal_time(call, n_lo=4, n_hi=16, repeats=4)
            for _ in range(3)
        )
        results[name] = {"ms": dts[1] * 1e3,
                         "range_ms": [dts[0] * 1e3, dts[-1] * 1e3]}
        log(f"{name}: {dts[1]*1e3:.2f} ms ({dts[0]*1e3:.2f}-{dts[-1]*1e3:.2f})")

    # --- training-mode forward only (per-layer fused kernels)
    @jax.jit
    def fwd_train(p, b):
        out = model.apply(p, b)
        return jnp.sum(out)

    st = {"x": tbatch.node_feat}

    def call_fwd():
        s = fwd_train(params, tbatch.with_node_feat(st["x"]))
        st["x"] = tbatch.node_feat + s * 1e-30
        return s

    arm("fwd_train", call_fwd, lambda: call_fwd())

    # --- inference-mode forward (stack kernels) for contrast
    @jax.jit
    def fwd_inf(p, b):
        with dispatch.inference_mode():
            out = model.apply(p, b)
        return jnp.sum(out)

    def call_fwd_inf():
        s = fwd_inf(params, tbatch.with_node_feat(st["x"]))
        st["x"] = tbatch.node_feat + s * 1e-30
        return s

    arm("fwd_inference", call_fwd_inf, lambda: call_fwd_inf())

    # --- loss + backward (no optimizer)
    def loss_fn(p, b):
        out = model.apply(p, b)
        return gtrain.masked_mse_loss(out, y, b.graph_mask)

    # chain INSIDE one executable: p' = p + 1e-30*grad(p) — a per-leaf
    # host-side tree.map chained ~50 tiny dispatches per call through the
    # relay and measured 93 ms of pure overhead (first run of this file)
    @jax.jit
    def gstep(p):
        g = jax.grad(loss_fn)(p, tbatch)
        return jax.tree.map(lambda a, b: a + 1e-30 * b, p, g)

    gst = {"p": params}

    def call_grad():
        gst["p"] = gstep(gst["p"])
        return gst["p"]

    arm("grad", call_grad, lambda: call_grad())

    # --- full train step (fwd+bwd+adam)
    opt = optax.adam(1e-3)
    step = gtrain.make_train_step(model, opt, donate=False)
    opt_state = opt.init(params)
    tst = {"p": params, "o": opt_state}

    def call_step():
        p, o, loss = step(tst["p"], tst["o"], tbatch, y)
        tst["p"], tst["o"] = p, o
        return loss

    arm("train_step", call_step, lambda: call_step())

    # --- XLA-only training paths for contrast
    dispatch.set_fused_mode("never")
    try:
        @jax.jit
        def gstep_xla(p):
            g = jax.grad(loss_fn)(p, tbatch)
            return jax.tree.map(lambda a, b: a + 1e-30 * b, p, g)

        def call_grad_xla():
            gst["p"] = gstep_xla(gst["p"])
            return gst["p"]

        arm("grad_xla", call_grad_xla, lambda: call_grad_xla())
    finally:
        dispatch.set_fused_mode("auto")

    results["bwd_est_ms"] = (results["grad"]["ms"]
                             - results["fwd_train"]["ms"])
    results["opt_est_ms"] = (results["train_step"]["ms"]
                             - results["grad"]["ms"])
    log(f"backward ~= {results['bwd_est_ms']:.2f} ms, "
        f"optimizer ~= {results['opt_est_ms']:.2f} ms")

    out = os.path.join(ROOT, "results_tpu", "train_decomp.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps({k: round(v["ms"], 2) for k, v in results.items()
                      if isinstance(v, dict) and "ms" in v}))


if __name__ == "__main__":
    main()
