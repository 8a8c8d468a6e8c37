"""On-hardware verification of the round-5 kernels/schedules.

Checks (fused-vs-XLA-reference on the SAME params/batch on the real
chip; reference arm = set_fused_mode("never")):

  * pna_stack_v4_fwd   — canonical 6-layer PNA model, block b1024, the
                         stack kernel under the round-5 v4 schedule
                         (unrolled block loop, hoisted one-hot, tile cap
                         640 — dispatch.pna_stack_cfg) vs never
  * pna_stack_v4_grad  — jax.grad through the stack VJP vs never
  * pna_stack_v4_bf16  — v4 under the bf16 policy vs the bf16 XLA path
  * pna_sched_agree    — direct kernel calls: v4 == v2 == v1 (tight tol;
                         same math, different schedule)
  * gat_block_mean_fwd — GAT concat=False through the block kernel vs
                         never (round-5 head-mean epilogue)
  * gat_block_edge_fwd — edge-featured GAT through the block kernel's
                         per-pair logit table vs never (skipped with a
                         note if the packed batch is a multigraph)

Writes results_tpu/r5_verify.json.  On all_pass the dispatch
_STAGED_R5 default ships with this artifact (CLAUDE.md staged rollout).
Run serialized, nohup, never kill mid-compile.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")

import jax  # noqa: E402
import numpy as np  # noqa: E402

OUT = os.path.join(ROOT, "results_tpu", "r5_verify.json")


def check(report, name, fn, tol=0.05):
    t0 = time.time()
    try:
        rel = float(fn())
        entry = {"rel": rel, "tol": tol, "pass": bool(rel <= tol),
                 "elapsed_s": round(time.time() - t0, 1)}
    except Exception as e:  # noqa: BLE001
        entry = {"error": f"{type(e).__name__}: {e}", "pass": False,
                 "elapsed_s": round(time.time() - t0, 1)}
    report[name] = entry
    print(f"{name}: {entry}", flush=True)


def main():
    import jax.numpy as jnp

    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.bench.canonical import (
        canonical_batches,
        canonical_model,
    )
    from gnnbuilder_tpu.ops import dispatch

    print(f"devices: {jax.devices()}", flush=True)
    report = {}

    graphs, batches = canonical_batches(
        "qm9", n_graphs=1100, batch_size=1024,
        node_multiple=1024, block_size=128,
    )
    b = batches[0]
    gmask = np.asarray(b.graph_mask)

    def rel_arr(a, r, mask):
        a = np.asarray(a)[mask]
        r = np.asarray(r)[mask]
        return float(np.abs(a - r).max()) / max(float(np.abs(r).max()), 1e-9)

    def with_inf(fn):
        with dispatch.inference_mode():
            return fn()

    def with_never(fn):
        dispatch.set_fused_mode("never")
        try:
            return fn()
        finally:
            dispatch.set_fused_mode("auto")

    # ---- PNA stack under v4 (the dispatch default this round)
    pna = canonical_model("pna", "qm9", graphs=graphs)
    p_pna = pna.init(jax.random.PRNGKey(0), b)
    with dispatch.inference_mode():  # the stack gate is inference-scoped
        cfg_probe = dispatch.pna_stack_cfg(b)

    def pna_v4_fwd():
        assert cfg_probe is not None and cfg_probe.get("sched") == "v4", (
            f"dispatch did not select v4: {cfg_probe}"
        )
        o_k = with_inf(lambda: pna.apply(p_pna, b))
        o_r = with_never(lambda: pna.apply(p_pna, b))
        return rel_arr(o_k, o_r, gmask)

    check(report, "pna_stack_v4_fwd", pna_v4_fwd)
    report["dispatch_cfg"] = {
        k: v for k, v in (cfg_probe or {}).items() if k != "interpret"
    }

    def pna_v4_grad():
        target = jnp.zeros((b.num_graphs, 1), jnp.float32)

        def loss(p):
            with dispatch.inference_mode():
                out = pna.apply(p, b)
            m = b.graph_mask.astype(out.dtype)[:, None]
            return ((out - target) ** 2 * m).sum() / m.sum()

        def loss_r(p):
            out = pna.apply(p, b)
            m = b.graph_mask.astype(out.dtype)[:, None]
            return ((out - target) ** 2 * m).sum() / m.sum()

        g_k = jax.grad(loss)(p_pna)
        g_r = with_never(lambda: jax.grad(loss_r)(p_pna))
        lk, lr = jax.tree.leaves(g_k), jax.tree.leaves(g_r)
        gmax = max(float(np.abs(np.asarray(r)).max()) for r in lr)
        worst = 0.0
        for a, r in zip(lk, lr):
            a, r = np.asarray(a), np.asarray(r)
            denom = max(float(np.abs(r).max()), 1e-3 * gmax, 1e-9)
            worst = max(worst, float(np.abs(a - r).max()) / denom)
        return worst

    check(report, "pna_stack_v4_grad", pna_v4_grad)

    def pna_v4_bf16():
        prog_k = gnnb.Program(
            pna, max_nodes=b.num_nodes, max_edges=b.num_edges,
            max_graphs=b.num_graphs, precision="bf16", block_size=128,
        )
        prog_k.set_params(p_pna)
        o_k = prog_k.forward(b)
        prog_r = gnnb.Program(
            pna, max_nodes=b.num_nodes, max_edges=b.num_edges,
            max_graphs=b.num_graphs, precision="bf16", block_size=128,
        )
        prog_r.set_params(p_pna)
        o_r = with_never(lambda: prog_r.forward(b))
        return rel_arr(o_k, o_r, gmask)

    check(report, "pna_stack_v4_bf16", pna_v4_bf16, tol=0.08)

    # ---- schedule agreement (direct kernel, tight tolerance)
    def sched_agree():
        from gnnbuilder_tpu.ops.pallas.pna_block import (
            fused_pna_block_stack,
        )

        rng = np.random.default_rng(0)
        F, L = 128, 3
        sd = lambda *s: jnp.asarray(
            rng.standard_normal(s).astype(np.float32) * 0.05
        )
        ws = (sd(L, F, F), sd(L, F, F), sd(L, 1, F), sd(L, F, F),
              sd(L, 4 * F, 3 * F), sd(L, 1, F), sd(L, F, F), sd(L, 1, F))
        x0 = sd(b.num_nodes, F)
        kw = dict(deltas=(2.5,) * L, skips=(False, True, False),
                  act="relu", block_size=128, gather_mode="split2",
                  mm="bf16", block_adj=b.block_adj)
        outs = {}
        for sc, tr in (("v1", 1024), ("v2", 1024), ("v4", 640)):
            outs[sc] = np.asarray(fused_pna_block_stack(
                x0, b.nbr_nodes, b.in_degree, *ws, tile_rows=tr,
                sched=sc, **kw,
            ))
        scale = max(np.abs(outs["v1"]).max(), 1e-9)
        return max(
            np.abs(outs["v2"] - outs["v1"]).max(),
            np.abs(outs["v4"] - outs["v1"]).max(),
        ) / scale

    check(report, "pna_sched_agree", sched_agree, tol=1e-3)

    # ---- int8 through the mp stack kernel (round-5 quant epilogue)
    def mp_stack_int8():
        gcn = canonical_model("gcn", "qm9", graphs=graphs)
        p_gcn = gcn.init(jax.random.PRNGKey(3), b)
        from gnnbuilder_tpu.ops.pallas import mp_block as _mb

        mcalls = {"n": 0}
        orig_mp = _mb.mp_block_stack_auto

        def counting_mp(*a, **k):
            mcalls["n"] += 1
            assert k.get("quant"), "int8 policy did not reach the stack"
            return orig_mp(*a, **k)

        prog_k = gnnb.Program(
            gcn, max_nodes=b.num_nodes, max_edges=b.num_edges,
            max_graphs=b.num_graphs, precision="int8", block_size=128,
        )
        prog_k.set_params(p_gcn)
        _mb.mp_block_stack_auto = counting_mp
        try:
            o_k = prog_k.forward(b)
        finally:
            _mb.mp_block_stack_auto = orig_mp
        assert mcalls["n"] >= 1, "int8 stack kernel was not dispatched"
        prog_r = gnnb.Program(
            gcn, max_nodes=b.num_nodes, max_edges=b.num_edges,
            max_graphs=b.num_graphs, precision="int8", block_size=128,
        )
        prog_r.set_params(p_gcn)
        o_r = with_never(lambda: prog_r.forward(b))
        return rel_arr(o_k, o_r, gmask)

    check(report, "mp_stack_int8_vs_xla_int8", mp_stack_int8, tol=0.02)

    # ---- GAT block kernel: mean mode + edge features
    gat_mean = canonical_model(
        "gat", "qm9", graphs=graphs, conv_kwargs={"heads": 4,
                                                  "concat": False},
    )
    p_gm = gat_mean.init(jax.random.PRNGKey(1), b)

    def gat_mean_fwd():
        o_k = with_inf(lambda: gat_mean.apply(p_gm, b))
        o_r = with_never(lambda: gat_mean.apply(p_gm, b))
        return rel_arr(o_k, o_r, gmask)

    check(report, "gat_block_mean_fwd", gat_mean_fwd)

    # edge-featured check runs on a DEDUPLICATED batch (the synthetic
    # qm9 generator emits some parallel edges; real molecules do not —
    # multigraph_static correctly refuses the table on the raw batch,
    # which the report records)
    report["canonical_batch_multigraph"] = bool(b.multigraph_static)
    if True:
        from gnnbuilder_tpu.core.graph import build_graph_batch
        from gnnbuilder_tpu.data.datasets import Graph

        simple = []
        for gg in graphs[:1024]:
            key = gg.edge_index[0] * (gg.num_nodes + 1) + gg.edge_index[1]
            _, idx = np.unique(key, return_index=True)
            simple.append(Graph(x=gg.x, edge_index=gg.edge_index[:, idx],
                                edge_attr=gg.edge_attr[idx]))
        be = build_graph_batch(simple, block_size=128, node_multiple=1024)
        assert not be.multigraph_static
        gmask_e = np.asarray(be.graph_mask)
        gat_edge = canonical_model(
            "gat", "qm9", graphs=graphs, conv_kwargs={"heads": 4,
                                                      "edge_dim": 4},
        )
        p_ge = gat_edge.init(jax.random.PRNGKey(2), be)

        from gnnbuilder_tpu.ops.pallas import gat_block as _gb

        gcalls = {"n": 0}
        orig = _gb.gat_block_layer_auto

        def counting(*a, **k):
            gcalls["n"] += 1
            return orig(*a, **k)

        def gat_edge_fwd():
            _gb.gat_block_layer_auto = counting
            try:
                o_k = with_inf(lambda: gat_edge.apply(p_ge, be))
            finally:
                _gb.gat_block_layer_auto = orig
            assert gcalls["n"] >= 1, "edge-featured block kernel not taken"
            o_r = with_never(lambda: gat_edge.apply(p_ge, be))
            return rel_arr(o_k, o_r, gmask_e)

        check(report, "gat_block_edge_fwd", gat_edge_fwd)

    report["all_pass"] = all(
        v.get("pass", False) for v in report.values() if isinstance(v, dict)
        and ("pass" in v)
    )
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"all_pass": report["all_pass"]}), flush=True)


if __name__ == "__main__":
    main()
