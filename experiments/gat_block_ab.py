"""A/B: fused windowed GAT kernel vs dense masked block attention
(ops/block.block_gat_attention) on the canonical b1024 QM9 batch,
within-run, chained protocol.  Decides GATConv's dispatch precedence on
block-packed batches.  Also checks numerics (dense vs never).

Writes results_tpu/gat_block_ab.json.
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

    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.bench.canonical import (
        canonical_batches,
        canonical_model,
    )
    from gnnbuilder_tpu.bench.timing import marginal_time
    from gnnbuilder_tpu.ops import dispatch

    log(f"devices: {jax.devices()}")
    results = {"meta": {"protocol": "chained, within-run", "heads": 4}}

    graphs, batches = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024,
        node_multiple=256, block_size=128,
    )
    b = batches[0]
    model = canonical_model(
        "gat", "qm9", graphs=graphs, conv_kwargs={"heads": 4},
    )
    params = model.init(jax.random.PRNGKey(0), b)
    gmask = np.asarray(b.graph_mask)

    def fwd_time():
        fwd = jax.jit(lambda p, bb: model.apply(p, bb))
        st = {"b": b}

        def one():
            out = fwd(params, st["b"])
            st["b"] = st["b"].with_node_feat(
                st["b"].node_feat + 1e-12 * out.sum()
            )
            return st["b"].node_feat

        return marginal_time(one, n_lo=5, n_hi=30, repeats=5) * 1e6

    # arm 1: default — fused windowed GAT kernel outranks the dense path
    results["fused_windowed_us"] = fwd_time()
    o_fused = np.asarray(model.apply(params, b))
    log(f"fused windowed: {results['fused_windowed_us']:.1f} us")

    # arm 2: dense block attention — no_fused() suppresses the Pallas
    # layer kernels (fused_config) while block_cfg stays live, so GATConv
    # falls through to its block branch
    with dispatch.no_fused():
        results["dense_block_us"] = fwd_time()
        o_dense = np.asarray(model.apply(params, b))
    log(f"dense block: {results['dense_block_us']:.1f} us")

    # reference numerics (never = ELL/flat paths, block off)
    dispatch.set_fused_mode("never")
    try:
        o_ref = np.asarray(model.apply(params, b))
    finally:
        dispatch.set_fused_mode("auto")
    scale = max(float(np.abs(o_ref[gmask]).max()), 1e-9)
    results["dense_rel_vs_never"] = float(
        np.abs((o_dense - o_ref)[gmask]).max()) / scale
    results["fused_rel_vs_never"] = float(
        np.abs((o_fused - o_ref)[gmask]).max()) / scale
    results["speedup_dense_over_fused"] = (
        results["fused_windowed_us"] / results["dense_block_us"]
    )

    out = os.path.join(ROOT, "results_tpu", "gat_block_ab.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
