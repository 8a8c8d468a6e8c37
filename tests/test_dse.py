"""DSE subsystem: space sampling, measurement rows, cost-model fit/predict,
engine optimize loop — the working version of the API the reference stubbed
(dse.py:6-9) with the experiment logic of build_dse_models.py /
process_dse_models.py."""

import os

import numpy as np
import pytest

from gnnbuilder_tpu import dse
from gnnbuilder_tpu.dse.space import DEFAULT_AXES

TINY_AXES = {
    "conv": ["gcn", "gin"],
    "gnn_hidden_dim": [16, 32],
    "gnn_output_dim": [8],
    "gnn_num_layers": [2, 3],
    "gnn_skip_connection": [False],
    "mlp_hidden_dim": [8],
    "mlp_hidden_layers": [1],
    "batch_size": [4],
    "precision": ["f32"],
    "ell_width": [None, 0],
}


def test_space_sampling_deterministic():
    a = dse.sample_space(10, seed=3)
    b = dse.sample_space(10, seed=3)
    assert a == b
    assert len(set(a)) == 10  # without replacement


def test_full_space_covers_axes():
    cfgs = list(dse.full_space(TINY_AXES))
    assert len(cfgs) == 2 * 2 * 2 * 2
    assert {c.conv for c in cfgs} == {"gcn", "gin"}


def test_transform_x_shape_and_encoding():
    cfgs = dse.sample_space(5, seed=0)
    X = dse.transform_x(cfgs)
    assert X.shape == (5, len(dse.model.FEATURE_NAMES))
    # the one-hot list is FROZEN (pickled models index features by name):
    # convs in it sum to 1; later convs (edge, round 4) ride an appended
    # flag instead and leave the one-hot block all-zero
    onehot = X[:, : len(dse.model.CONV_ONE_HOT)].sum(1)
    edge_col = dse.model.FEATURE_NAMES.index("conv_edge")
    for row, cfg in enumerate(cfgs):
        if cfg.conv in dse.model.CONV_ONE_HOT:
            assert onehot[row] == 1 and X[row, edge_col] == 0
        else:
            assert onehot[row] == 0 and X[row, edge_col] == 1


def test_measure_fit_optimize_roundtrip(tmp_path):
    cfgs = list(dse.full_space(TINY_AXES))[:6]
    rows = dse.measure_many(
        cfgs,
        dataset="esol",
        iters=4,
        out_csv=str(tmp_path / "perf_data.csv"),
        verbose=False,
    )
    assert len(rows) == 6
    for r in rows:
        assert r["latency_us"] > 0
        assert r["flops"] >= 0

    model, mape = dse.fit_cost_model(rows)
    assert np.isfinite(mape)
    preds = model.predict(cfgs)
    assert preds.shape == (6,) and (preds > 0).all()

    # pickle round trip (the reference ships its models as pickles,
    # process_dse_models.py:465-474)
    p = str(tmp_path / "model_direct.pk")
    model.save(p)
    loaded = dse.CostModel.load(p)
    np.testing.assert_allclose(loaded.predict(cfgs), preds)

    # resume semantics: re-measuring with the same CSV skips everything
    rows2 = dse.measure_many(
        cfgs, dataset="esol", iters=4,
        out_csv=str(tmp_path / "perf_data.csv"), verbose=False,
    )
    assert len(rows2) == 6


def test_engine_end_to_end(tmp_path):
    eng = dse.DSEEngine(
        dataset="esol", corpus_csv=str(tmp_path / "corpus.csv"),
        objective="latency_us",
    )
    eng.build_corpus(n=5, axes=TINY_AXES, iters=3)
    mape = eng.fit(target="latency_us")
    assert np.isfinite(mape)
    ranked = eng.optimize(list(dse.full_space(TINY_AXES)), top_k=3)
    assert len(ranked) == 3
    assert ranked[0][1] <= ranked[-1][1]
    truth = eng.verify([ranked[0][0]], iters=3)
    assert truth[0]["latency_us"] > 0


def test_speedup_report(tmp_path):
    cfgs = list(dse.full_space(TINY_AXES))[:4]
    rows = dse.measure_many(cfgs, dataset="esol", iters=3, verbose=False)
    rep = dse.dse_speedup_report(rows, n_timing_reps=5)
    assert rep["num_designs"] == 4
    assert rep["predict_s_per_design"] < 1.0
    assert rep["speedup"] > 1.0  # measuring costs more than predicting


def test_pretrained_tune_kernels():
    """The shipped pickle drives the autotuner: from_pretrained loads
    dse_models/model_direct.pk and tune_kernels ranks numerics-preserving
    knob settings and applies the winner via dispatch overrides."""
    from gnnbuilder_tpu.ops import dispatch

    eng = dse.DSEEngine.from_pretrained()
    # a pinned gather_mode must survive tuning (numerics contract)
    dispatch.set_kernel_overrides(gather_mode="highest")
    r = eng.tune_kernels("pna", batch_size=1024, apply=True)
    try:
        assert r["applied"] == {
            "tile_rows": r["best"].tile_rows,
            "ell_width": r["best"].ell_width,
            "window_mode": r["best"].window_mode,
            "block_size": r["best"].block_size,
        }
        assert r["predicted_us_per_graph"] > 0
        # 2 ell_width x 4 tile_rows x 3 window_mode x 2 block_size
        assert len(r["ranked"]) == 48
        preds = [p for _, p in r["ranked"]]
        assert preds == sorted(preds)
        # gather_mode is never tuned (numerics-preserving contract) and a
        # pre-existing override is not clobbered by the apply step
        assert all(c.gather_mode is None for c, _ in r["ranked"])
        assert dispatch._GATHER_MODE == "highest"
        # the applied knobs match what actually executes: tile_rows via the
        # dispatch override, ell_width via the packing-time default
        assert dispatch._TILE_ROWS == r["best"].tile_rows
        from gnnbuilder_tpu.core import graph as _g

        assert _g._DEFAULT_ELL_WIDTH == r["best"].ell_width
    finally:
        dispatch.set_kernel_overrides(None, None, None)


def test_ell_width_override_reaches_packing():
    """set_kernel_overrides(ell_width=0) flips subsequently packed batches
    to the flat segment layout; None restores the auto policy; omitted
    knobs are left untouched."""
    import numpy as np

    from gnnbuilder_tpu.core.graph import build_graph_batch
    from gnnbuilder_tpu.data.datasets import FakeDataset
    from gnnbuilder_tpu.ops import dispatch

    graphs = FakeDataset(num_graphs=4, avg_num_nodes=8, node_dim=4, seed=0)
    try:
        dispatch.set_kernel_overrides(ell_width=0)
        b0 = build_graph_batch(graphs)
        assert b0.nbr_nodes is None  # flat segment path
        dispatch.set_kernel_overrides(ell_width=None)
        b1 = build_graph_batch(graphs)
        assert b1.nbr_nodes is not None  # auto ELL restored
        # explicit per-call width still wins over the process default
        dispatch.set_kernel_overrides(ell_width=0)
        b2 = build_graph_batch(graphs, ell_width=int(b1.nbr_nodes.shape[1]))
        assert b2.nbr_nodes is not None
        # omitted knobs untouched: setting tile_rows alone keeps ell_width
        dispatch.set_kernel_overrides(tile_rows=256)
        b3 = build_graph_batch(graphs)
        assert b3.nbr_nodes is None and dispatch._TILE_ROWS == 256
        assert np.allclose(np.asarray(b0.node_feat), np.asarray(b1.node_feat))
    finally:
        dispatch.set_kernel_overrides(None, None, None)


def test_cv_mape_banded_contract():
    """Banded out-of-fold MAPE (round 4: the scalar CV MAPE is dominated
    by the sub-500us label-noise floor measured in
    results_tpu/dse_label_retest.json; the banded view separates model
    error from label noise).  Pins: bands partition by band_by (total
    latency), counts sum to the corpus, and a clean synthetic target
    yields small error in every populated band."""
    import numpy as np

    from gnnbuilder_tpu.dse.model import cv_mape_banded
    from gnnbuilder_tpu.dse.space import sample_space

    cfgs = sample_space(60, seed=3)
    # deterministic, feature-predictable target (per-graph us)
    y = np.asarray([
        1.0 + 0.01 * c.gnn_hidden_dim * c.gnn_num_layers / c.batch_size
        for c in cfgs
    ])
    total = y * np.asarray([float(c.batch_size) for c in cfgs])
    out = cv_mape_banded(cfgs, y, band_by=total, folds=4)
    assert out, "at least one band populated"
    assert sum(v["n"] for v in out.values()) == len(cfgs)
    for k, v in out.items():
        assert v["n"] > 0 and np.isfinite(v["mape"])


def test_predict_with_noise_floor_bands():
    """predict_with_noise_floor returns the measured cross-session
    label-reproducibility band for each prediction's magnitude (round-5
    abstention API; dse_label_retest.json bands)."""
    import numpy as np

    from gnnbuilder_tpu.dse.model import CostModel, label_noise_floor
    from gnnbuilder_tpu.dse.space import sample_space

    assert label_noise_floor(40.0) == 0.85
    assert label_noise_floor(900.0) == 0.30
    assert label_noise_floor(5000.0) == 0.08

    cfgs = sample_space(24, seed=0)
    rng = np.random.default_rng(0)
    y = np.exp(rng.uniform(np.log(20), np.log(5000), len(cfgs)))
    m = CostModel(target="latency_us").fit(cfgs, y)
    pred, floors = m.predict_with_noise_floor(cfgs)
    assert pred.shape == floors.shape == (len(cfgs),)
    for p, f in zip(pred, floors):
        assert f == label_noise_floor(p)
