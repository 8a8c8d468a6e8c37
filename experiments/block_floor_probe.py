"""Where does the block-path per-call overhead live? (round 5)

Driver BENCH_r04 showed block-packed arms consistently ~1.2 ms/call
slower than their device time (b256: 0.285 ms device, 1.51 ms/call;
b1024: 0.97 device, 1.86 call; b4096: ~2.9 device, 4.13 call), while
std-packed arms track their device time + the ~0.1 ms issue floor.
Fixed overhead, independent of batch size -> suspect the per-call HOST
path of block executables, not the kernels.

Arms (all within-run, chained-marginal):
  trivial_args_{std,blk}    jit f(params, batch, c) = c + eps*sum(x):
                            pure arg-marshaling cost of each batch pytree
  trivial_args_blk_f32      same, block_adj cast to f32 (bf16-buffer
                            relay-handling hypothesis)
  trivial_closure_blk       same trivial compute, batch/params closed
                            over (constants): zero arg marshaling
  model_args_{std,blk}      Program.benchmark protocol (the bench.py arm)
  model_closure_blk         full forward, params/batch closed over, carry
                            is the only argument
  stack_args_blk            stack kernel only, args mode

Writes results_tpu/block_floor_probe.json.
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

    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.bench.canonical import (
        canonical_batches,
        canonical_model,
    )
    from gnnbuilder_tpu.bench.timing import marginal_time
    from gnnbuilder_tpu.ops import dispatch

    log(f"devices: {jax.devices()}")
    bs = int(os.environ.get("PROBE_BS", 256))

    graphs, b_std_l = canonical_batches(
        "qm9", n_graphs=max(2 * bs, 64), batch_size=bs, node_multiple=256,
    )
    _, b_blk_l = canonical_batches(
        "qm9", n_graphs=max(2 * bs, 64), batch_size=bs,
        node_multiple=1024, block_size=128,
    )
    b_std, b_blk = b_std_l[0], b_blk_l[0]
    model = canonical_model("pna", "qm9", graphs=graphs)

    progs = {}
    for name, b, blk in (("std", b_std, 0), ("blk", b_blk, 128)):
        p = gnnb.Program(
            model, max_nodes=b.num_nodes, max_edges=b.num_edges,
            max_graphs=b.num_graphs, block_size=blk,
        )
        p.init_params(b)
        progs[name] = p

    results = {"meta": {"bs": bs, "N_std": b_std.num_nodes,
                        "N_blk": b_blk.num_nodes}}

    def chained(callable_step, label, n_hi=40):
        carry = {"c": jnp.zeros(())}

        def call():
            carry["c"] = callable_step(carry["c"])
            return carry["c"]

        call()
        jax.block_until_ready(carry["c"])
        dts = sorted(
            marginal_time(call, n_lo=8, n_hi=n_hi, repeats=4)
            for _ in range(3)
        )
        results[label] = {"us": dts[1] * 1e6,
                          "range_us": [dts[0] * 1e6, dts[-1] * 1e6]}
        log(f"{label}: {dts[1]*1e6:.1f} us "
            f"({dts[0]*1e6:.1f}-{dts[-1]*1e6:.1f})")
        return dts[1]

    # --- trivial compute, args mode: pure per-call pytree/arg cost
    for name, b in (("std", b_std), ("blk", b_blk)):
        p = progs[name]

        @jax.jit
        def triv(params, batch, c):
            return c + jnp.sum(batch.node_feat) * 1e-30

        chained(lambda c, _p=p, _b=b, _f=triv: _f(_p.params, _b, c),
                f"trivial_args_{name}")

    # block_adj dtype variant: bf16 buffer handling hypothesis
    b_blk_f32 = b_blk.replace(
        block_adj=b_blk.block_adj.astype(jnp.float32)
    )

    @jax.jit
    def triv2(params, batch, c):
        return c + jnp.sum(batch.node_feat) * 1e-30

    chained(lambda c: triv2(progs["blk"].params, b_blk_f32, c),
            "trivial_args_blk_f32")

    # closure mode: no per-call args beyond the scalar
    pp, bb = progs["blk"].params, b_blk

    @jax.jit
    def triv_closed(c):
        return c + jnp.sum(bb.node_feat) * 1e-30

    chained(triv_closed, "trivial_closure_blk")

    # --- full model, args mode (the bench.py protocol)
    for name, b in (("std", b_std), ("blk", b_blk)):
        p = progs[name]
        dt = p.benchmark(b, iters=35, repeats=4)["latency_s"]
        results[f"model_args_{name}"] = {"us": dt * 1e6}
        log(f"model_args_{name}: {dt*1e6:.1f} us")

    # --- full model, closure mode
    def fwd_closed():
        @jax.jit
        def f(c):
            b2 = bb.with_node_feat(bb.node_feat + c * 1e-30)
            with dispatch.inference_mode():
                out = model.apply(pp, b2)
            return jnp.sum(out.astype(jnp.float32))

        return f

    chained(fwd_closed(), "model_closure_blk")

    # --- stack kernel only, args mode
    @jax.jit
    def stack_args(params, batch, c):
        h = batch.node_feat + c * 1e-30
        with dispatch.inference_mode():
            out = model.apply(params, batch, h,
                              method=lambda m, g, x: m._fused_gnn_stack(g, x))
        return jnp.sum(out.astype(jnp.float32))

    chained(lambda c: stack_args(pp, bb, c), "stack_args_blk")

    out = os.path.join(ROOT, "results_tpu", "block_floor_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps({k: round(v["us"], 1) for k, v in results.items()
                      if isinstance(v, dict) and "us" in v}))


if __name__ == "__main__":
    main()
