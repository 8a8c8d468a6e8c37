"""A/B: block-diagonal matmul aggregation vs the windowed fused kernels,
whole canonical model (6 layers + pooling + MLP), forward AND train step.

Arms (same graphs, chained-call protocol, median-of-repeats):
  fused  — standard packing, windowed fused Pallas kernels (round-2 path)
  block  — bin-packed batch (block_size=128), matmul aggregation
           (ops/block.py) + XLA epilogue fusion, Pallas kernels skipped
  block+fused — bin-packed batch with block_mode="fused": windowed
           kernels keep precedence but windows are block-aligned
           (slack still = max graph nodes; measures packing alone)

Also numerics: block-vs-fused forward outputs on the same graphs.

Writes results_tpu/block_model_ab.json.  Run serialized, nohup (CLAUDE.md
chip rules).
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
    import numpy as np
    import optax

    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.bench.canonical import (
        canonical_batches,
        canonical_model,
    )
    from gnnbuilder_tpu.bench.timing import marginal_time
    from gnnbuilder_tpu.ops import dispatch
    from gnnbuilder_tpu.train import make_train_step, stack_targets

    log(f"devices: {jax.devices()}")
    results = {"meta": {"protocol": "chained", "batch_size": 1024}}

    def build(conv, block):
        graphs, batches = canonical_batches(
            "qm9", n_graphs=1100, batch_size=1024,
            node_multiple=256, block_size=128 if block else 0,
        )
        model = canonical_model(conv, "qm9", graphs=graphs)
        b = batches[0]
        target = stack_targets(graphs[:1024], b.num_graphs)
        return model, b, target

    def fwd_time(model, b, params):
        # chained: feed output back through a node-feature perturbation
        fwd = jax.jit(lambda p, bb: model.apply(p, bb))

        st = {"b": b}

        def one():
            out = fwd(params, st["b"])
            st["b"] = st["b"].with_node_feat(
                st["b"].node_feat + 1e-12 * out.sum()
            )
            return st["b"].node_feat

        return marginal_time(one, n_lo=5, n_hi=30, repeats=5)

    def train_time(model, b, target):
        opt = optax.adam(1e-3)
        step = make_train_step(model, opt, donate=False)
        params = model.init(jax.random.PRNGKey(0), b)
        state = opt.init(params)
        params, state, loss = step(params, state, b, target)

        st = {"p": params, "s": state}

        def one():
            st["p"], st["s"], loss = step(st["p"], st["s"], b, target)
            return loss

        return marginal_time(one, n_lo=3, n_hi=18, repeats=5)

    for conv in ("pna", "gin", "gcn", "sage"):
        model_f, b_f, tgt_f = build(conv, block=False)
        model_b, b_b, tgt_b = build(conv, block=True)
        params = model_f.init(jax.random.PRNGKey(0), b_f)

        entry = {"block_nodes": b_b.num_nodes, "std_nodes": b_f.num_nodes}

        # numerics first: same params, block vs fused forward
        o_f = np.asarray(model_f.apply(params, b_f))[:1024]
        o_b = np.asarray(model_b.apply(params, b_b))[:1024]
        scale = max(float(np.abs(o_f).max()), 1e-9)
        entry["fwd_rel_diff"] = float(np.abs(o_f - o_b).max()) / scale

        dispatch.set_kernel_overrides(block_mode="off")
        entry["fused_fwd_us"] = fwd_time(model_f, b_f, params) * 1e6
        entry["fused_train_us"] = train_time(model_f, b_f, tgt_f) * 1e6
        dispatch.set_kernel_overrides(block_mode=None)
        entry["block_fwd_us"] = fwd_time(model_b, b_b, params) * 1e6
        entry["block_train_us"] = train_time(model_b, b_b, tgt_b) * 1e6
        dispatch.set_kernel_overrides(block_mode="fused")
        entry["blockpack_fused_fwd_us"] = fwd_time(model_b, b_b, params) * 1e6
        dispatch.set_kernel_overrides(block_mode=None)

        entry["fwd_speedup"] = entry["fused_fwd_us"] / entry["block_fwd_us"]
        entry["train_speedup"] = (
            entry["fused_train_us"] / entry["block_train_us"]
        )
        log(f"{conv}: {json.dumps(entry)}")
        results[conv] = entry

    out = os.path.join(ROOT, "results_tpu", "block_model_ab.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps({
        "ok": True,
        "pna_fwd_speedup": results["pna"]["fwd_speedup"],
        "pna_train_speedup": results["pna"]["train_speedup"],
    }))


if __name__ == "__main__":
    main()
