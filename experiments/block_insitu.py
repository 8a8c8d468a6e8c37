"""Inner-chain decomposition of the block-path PNA model (round 4).

The r4_block_ab artifact puts the whole canonical model at ~1.06 ms
(b1024, block128, inference scope).  Where does it go?  The model is
exactly two Pallas kernels + XLA glue (nn/model.py __call__):

  stack      pna_block_stack_auto — all 6 conv layers in one kernel
  readout    fused_readout_auto — pooling + MLP head + output activation
             (max pooling streams in from an XLA segment_max)
  xla_tail   the XLA fallback readout (global_pooling + mlp_head) for
             comparison
  segmax     the XLA segment_max feeding the fused readout
  model      the whole forward (Program.benchmark_inner)

All arms use the inner-chain protocol (k forwards inside one jitted
scan, slope over k=1/5 — the ~0.1 ms per-call issue floor cancels;
round-3's single-call readout numbers, pna_profile.json, carried that
floor).  Within-run numbers only.  Writes results_tpu/block_insitu.json.

Reference analog: the reference's whole design budget went into the PNA
datapath (gnn_builder_lib.h:1750-2157); its readout is a trivial host
loop (model_tb.cpp.jinja).
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

    bs = int(os.environ.get("INSITU_BS", 1024))
    # default node_multiple matches bench.py's block arms (nm1024) so the
    # decomposition explains the driver-visible number
    nm = int(os.environ.get("INSITU_NM", 1024))
    graphs, batches = canonical_batches(
        "qm9", n_graphs=max(2 * bs, 64), batch_size=bs,
        node_multiple=nm, block_size=128,
    )
    b = batches[0]
    model = canonical_model("pna", "qm9", graphs=graphs)
    prog = gnnb.Program(
        model, max_nodes=b.num_nodes, max_edges=b.num_edges,
        max_graphs=b.num_graphs, block_size=128,
    )
    prog.init_params(b)
    params = prog.params
    results = {"meta": {"protocol": "inner-chain k=1/5, within-run",
                        "batch": bs, "N": b.num_nodes}}

    # h after the conv stack (input to the readout arms)
    def _stack(m, g, h):
        out = m._fused_gnn_stack(g, h)
        assert out is not None, "stack kernel did not dispatch"
        return out

    def _readout(m, g, h):
        out = m._fused_readout(g, h)
        assert out is not None, "fused readout did not dispatch"
        return out

    def _xla_tail(m, g, h):
        from gnnbuilder_tpu.nn.model import OUTPUT_ACTIVATIONS

        pooled = m.global_pooling(g, h)
        out = m.mlp_head(pooled)
        if m.output_activation is not None:
            out = OUTPUT_ACTIVATIONS[m.output_activation](out)
        return out

    def _segmax(m, g, h):
        from gnnbuilder_tpu.ops import segment

        count = g.n_node.astype(h.dtype)[:, None]
        return segment.segment_max(h, g.node_graph, g.num_graphs,
                                   count=count)

    with dispatch.inference_mode():
        h_after = jax.jit(
            lambda p, g: model.apply(p, g, g.node_feat, method=_stack)
        )(params, b)
    h_after = jax.block_until_ready(h_after)

    def chain(method, x_in, k):
        """k applications of `method` inside one executable, scalar-coupled
        so the compiler cannot elide or parallelize them."""
        def f(c):
            def body(i, carry):
                with dispatch.inference_mode():
                    out = model.apply(
                        params, b,
                        x_in + carry * jnp.asarray(1e-12, x_in.dtype),
                        method=method,
                    )
                return jnp.sum(out.astype(jnp.float32))

            return jax.lax.fori_loop(0, k, body, c)

        return jax.jit(f)

    def time_arm(name, method, x_in):
        times = {}
        for k in (1, 5):
            fj = chain(method, x_in, k)
            c = fj(jnp.zeros(()))
            c.block_until_ready()
            carry = {"c": c}

            def call():
                carry["c"] = fj(carry["c"])
                return carry["c"]

            dt = marginal_time(call, n_lo=5, n_hi=25, repeats=4)
            if dt * 20 < 2e-3:
                dt = marginal_time(call, n_lo=40, n_hi=200, repeats=4)
            times[k] = dt
        slope = (times[5] - times[1]) / 4
        resolved = slope > 0 and times[5] > 1.25 * times[1]
        us = slope * 1e6 if resolved else times[5] / 5 * 1e6
        results[name] = {
            "us": us, "resolved": resolved,
            "times_us": {k: v * 1e6 for k, v in times.items()},
        }
        log(f"{name}: {us:.1f} us{'' if resolved else ' (UPPER BOUND)'}")
        return us

    t_stack = time_arm("stack", _stack, b.node_feat)
    with dispatch.inference_mode():
        readout_ok = model.apply(params, b, h_after,
                                 method=lambda m, g, h:
                                 m._fused_readout(g, h)) is not None
    if readout_ok:
        t_read = time_arm("readout", _readout, h_after)
    else:
        # tiny smoke shapes can fall below the fused-readout gate; the
        # canonical chip shapes dispatch it
        log("fused readout does not dispatch at this size; skipping arm")
        t_read = float("nan")
    t_xla = time_arm("xla_tail", _xla_tail, h_after)
    t_segmax = time_arm("segmax", _segmax, h_after)

    # whole model via the standard inner-chain entry
    bench = prog.benchmark_inner(b, iters=20, repeats=4)
    t_model = bench["latency_s"] * 1e6
    results["model"] = {"us": t_model, "resolved": bench["resolved"]}
    log(f"model: {t_model:.1f} us")
    results["glue_us"] = t_model - t_stack - t_read
    log(f"glue (model - stack - readout): {results['glue_us']:.1f} us")
    log(f"readout fused vs xla tail: {t_read:.1f} vs {t_xla:.1f} us "
        f"(segmax alone {t_segmax:.1f})")

    suffix = "" if bs == 1024 else f"_b{bs}"
    out = os.path.join(ROOT, "results_tpu", f"block_insitu{suffix}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps({k: round(v["us"], 1) for k, v in results.items()
                      if isinstance(v, dict) and "us" in v}))


if __name__ == "__main__":
    main()
