"""DSE speed/accuracy analysis — the process_dse_runtime.py analog.

The reference's selling point for DSE: the sklearn model predicts a
design's latency in ~ms while Vitis synthesis takes 100s-to-hours per
design (process_dse_runtime.py:28-113).  Here the measured ground truth is
a jit compile + timed run (seconds); this module quantifies the same
tradeoff — prediction time vs measurement time vs prediction error — from
a measured corpus.
"""

from __future__ import annotations

import time
from typing import Sequence

import numpy as np

from gnnbuilder_tpu.dse.model import fit_cost_model

__all__ = ["dse_speedup_report"]


def dse_speedup_report(rows: Sequence[dict], n_timing_reps: int = 50) -> dict:
    """Fit the cost model on ``rows`` (measure_many output) and report:

    * mean measurement cost per design (compile + timing), seconds
    * mean prediction cost per design, seconds
    * the speedup ratio (the reference's headline: ~ms vs ~hours)
    * cross-validated MAPE of the predictions
    """
    model, mape = fit_cost_model(rows)
    from gnnbuilder_tpu.dse.model import rows_to_configs

    cfgs = rows_to_configs(rows)

    t0 = time.perf_counter()
    for _ in range(n_timing_reps):
        model.predict(cfgs[:1])
    predict_s = (time.perf_counter() - t0) / n_timing_reps

    measure_s = float(
        np.mean(
            [
                float(r.get("measure_s", r.get("compile_s", 0.0)))
                for r in rows
            ]
        )
    )
    return {
        "num_designs": len(rows),
        "cv_mape": mape,
        "predict_s_per_design": predict_s,
        "measure_s_per_design": measure_s,
        "speedup": measure_s / max(predict_s, 1e-9),
    }
