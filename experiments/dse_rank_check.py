"""Does the DSE cost model RANK fast configs correctly? (round 5)

VERDICT r4 next #5's second criterion: sub-noise-floor MAPE cannot be
pushed below the labels' own test-retest spread, but the DSE's job is
RANKING — pick the fastest config among candidates.  This experiment:

1. DSEEngine.from_pretrained ranks a candidate pool of FAST configs
   (batch 64, small hidden dims — the serving regime where MAPE is
   worst) by predicted per-graph latency;
2. the top-3, the median, and the predicted-slowest candidate are each
   measured on chip (median of 3 inner-chain estimates within this
   session);
3. the report records Spearman rank correlation between prediction and
   measurement over all measured points, and whether the predicted
   top-3 truly beat the predicted-slowest.

Writes results_tpu/dse_rank_check.json.
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
    import numpy as np

    from gnnbuilder_tpu.dse.engine import DSEEngine
    from gnnbuilder_tpu.dse.measure import measure_config
    from gnnbuilder_tpu.dse.space import sample_space

    eng = DSEEngine.from_pretrained(dataset="qm9")
    bs = int(os.environ.get("RANK_BS", 64))
    # fast-regime candidate pool: serving-style configs
    axes = {
        "conv": ["gcn", "gin", "sage", "pna"],
        "gnn_hidden_dim": [64, 128, 256],
        "gnn_output_dim": [64, 128],
        "gnn_num_layers": [3, 6],
        "gnn_skip_connection": [True, False],
        "mlp_hidden_dim": [64],
        "mlp_hidden_layers": [2],
        "batch_size": [bs],
        "precision": ["f32", "bf16"],
        "ell_width": [None],
        "tile_rows": [None],
        "gather_mode": [None],
        "block_size": [0, 128],
    }
    pool = sample_space(24, seed=7, axes=axes)
    pred = eng.predict(pool)
    order = np.argsort(pred)
    picks = [int(i) for i in (list(order[:3])
                              + [int(order[len(order) // 2])]
                              + [int(order[-1])])]
    log(f"measuring {len(picks)} of {len(pool)} candidates")

    rows = []
    for rank, i in enumerate(picks):
        cfg = pool[i]
        ests = []
        for _ in range(3):
            try:
                r = measure_config(cfg, dataset="qm9", iters=12,
                                   timing_only=True)
                ests.append(float(r["latency_us"]))
            except Exception as e:  # noqa: BLE001
                log(f"  measure failed: {type(e).__name__}: {e}")
        if not ests:
            continue
        meas = float(np.median(ests))
        cfg_bs = float(cfg.batch_size)
        rows.append({
            "conv": cfg.conv, "hidden": cfg.gnn_hidden_dim,
            "layers": cfg.gnn_num_layers, "precision": cfg.precision,
            "block": getattr(cfg, "block_size", 0),
            "pred_per_graph_us": float(pred[i]),
            "meas_per_graph_us": meas / cfg_bs,
            "meas_total_us": meas,
            "ests_us": ests,
            "pick": ("top3" if rank < 3
                     else ("median" if rank == 3 else "worst")),
        })
        log(f"  {rows[-1]}")

    p = np.array([r["pred_per_graph_us"] for r in rows])
    m = np.array([r["meas_per_graph_us"] for r in rows])

    def spearman(a, b):
        ra = np.argsort(np.argsort(a)).astype(float)
        rb = np.argsort(np.argsort(b)).astype(float)
        ca, cb = ra - ra.mean(), rb - rb.mean()
        return float((ca * cb).sum()
                     / np.sqrt((ca ** 2).sum() * (cb ** 2).sum() + 1e-12))

    top3 = [r["meas_per_graph_us"] for r in rows if r["pick"] == "top3"]
    worst = [r["meas_per_graph_us"] for r in rows if r["pick"] == "worst"]
    report = {
        "rows": rows,
        "spearman_pred_vs_meas": spearman(p, m),
        "top3_all_beat_predicted_worst": bool(
            top3 and worst and max(top3) < min(worst)
        ),
        "protocol": "median-of-3 inner-chain estimates, one session",
    }
    report["batch_size"] = bs
    out = os.path.join(
        ROOT, "results_tpu",
        "dse_rank_check.json" if bs == 64 else f"dse_rank_check_b{bs}.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=1, default=float)
    print(json.dumps({k: v for k, v in report.items() if k != "rows"}))


if __name__ == "__main__":
    main()
