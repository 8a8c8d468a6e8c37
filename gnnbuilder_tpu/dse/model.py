"""Learned DSE cost models — predict latency / memory without running.

The analog of the reference's pickled sklearn models
(process_dse_models.py:142-157 ``transform_x`` one-hot encoding;
:223-310 Pipeline(PolynomialFeatures(1), ExtraTreesRegressor(10, depth 8))
fit on 400 synthesized designs with 5-fold-CV MAPE; :465-474 pickling).
Here the training labels are measured kernel timings + HLO cost analysis
instead of csynth reports — predictions in ~ms versus seconds-long compiles,
which is the same value proposition (process_dse_runtime.py:74-113).
"""

from __future__ import annotations

import pickle
from typing import Optional, Sequence

import numpy as np

from gnnbuilder_tpu.dse.space import DSEConfig

__all__ = [
    "transform_x",
    "fit_cost_model",
    "rows_to_configs",
    "CostModel",
    "cv_mape",
]

CONV_ONE_HOT = ["gcn", "gin", "sage", "pna", "gat", "gine", "lg", "simple"]

FEATURE_NAMES = (
    [f"conv_{c}" for c in CONV_ONE_HOT]
    + [
        "gnn_hidden_dim",
        "gnn_output_dim",
        "gnn_num_layers",
        "gnn_skip_connection",
        "mlp_hidden_dim",
        "mlp_hidden_layers",
        "batch_size",
        "is_bf16",
        "is_ell",
        "tile_rows",
        "gather_bf16",
        "avg_nodes",
        "avg_edges",
    ]
)


def transform_x(cfgs: Sequence[DSEConfig]) -> np.ndarray:
    """Config -> feature vector (one-hot conv + numeric knobs) — the
    reference's transform_x (process_dse_models.py:142-157)."""
    rows = []
    for c in cfgs:
        onehot = [1.0 if c.conv == name else 0.0 for name in CONV_ONE_HOT]
        rows.append(
            onehot
            + [
                float(c.gnn_hidden_dim),
                float(c.gnn_output_dim),
                float(c.gnn_num_layers),
                float(bool(c.gnn_skip_connection)),
                float(c.mlp_hidden_dim),
                float(c.mlp_hidden_layers),
                float(c.batch_size),
                1.0 if c.precision == "bf16" else 0.0,
                0.0 if c.ell_width == 0 else 1.0,
                float(c.tile_rows or 0),
                1.0 if c.gather_mode == "bf16" else 0.0,
                float(c.avg_nodes),
                float(c.avg_edges),
            ]
        )
    return np.asarray(rows, dtype=np.float64)


def _make_regressor():
    from sklearn.ensemble import ExtraTreesRegressor
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import PolynomialFeatures

    # same estimator family/sizing as the reference (process_dse_models.py:
    # 223-253): PolynomialFeatures(1) + ExtraTrees(10 trees, depth 8)
    return Pipeline(
        [
            ("poly", PolynomialFeatures(degree=1)),
            (
                "trees",
                ExtraTreesRegressor(
                    n_estimators=10, max_depth=8, random_state=0
                ),
            ),
        ]
    )


class CostModel:
    """Latency (and optionally bytes) predictor over DSEConfigs."""

    def __init__(self, target: str = "latency_us", log_target: bool = True):
        self.target = target
        self.log_target = log_target
        self.pipeline = _make_regressor()

    def fit(self, cfgs: Sequence[DSEConfig], y: np.ndarray) -> "CostModel":
        X = transform_x(cfgs)
        t = np.log(np.maximum(y, 1e-9)) if self.log_target else y
        self.pipeline.fit(X, t)
        return self

    def predict(self, cfgs: Sequence[DSEConfig]) -> np.ndarray:
        X = transform_x(cfgs)
        t = self.pipeline.predict(X)
        return np.exp(t) if self.log_target else t

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(path: str) -> "CostModel":
        with open(path, "rb") as f:
            return pickle.load(f)


def cv_mape(
    cfgs: Sequence[DSEConfig],
    y: np.ndarray,
    folds: int = 5,
    seed: int = 0,
    log_target: bool = True,
) -> float:
    """K-fold cross-validated mean-absolute-percentage error — the accuracy
    figure the reference prints at fit time (process_dse_models.py:263-310)."""
    n = len(cfgs)
    folds = min(folds, n)
    rng = np.random.default_rng(seed)
    idx = rng.permutation(n)
    mapes = []
    for k in range(folds):
        test = idx[k::folds]
        train = np.setdiff1d(idx, test)
        if len(train) == 0 or len(test) == 0:
            continue
        m = CostModel(log_target=log_target)
        m.fit([cfgs[i] for i in train], y[train])
        pred = m.predict([cfgs[i] for i in test])
        mapes.append(
            float(np.mean(np.abs(pred - y[test]) / np.maximum(y[test], 1e-9)))
        )
    return float(np.mean(mapes))


def rows_to_configs(rows: Sequence[dict]) -> list[DSEConfig]:
    """Rebuild DSEConfigs from result rows (CSV round trips stringify)."""
    cfg_fields = set(DSEConfig.__dataclass_fields__)
    cfgs = []
    for r in rows:
        kw = {}
        for k in cfg_fields:
            v = r[k]
            if isinstance(v, str) and k not in ("conv", "precision"):
                if v in ("", "None"):
                    v = None
                elif v in ("True", "False"):
                    v = v == "True"
                else:
                    v = float(v) if "." in v else int(v)
            kw[k] = v
        cfgs.append(DSEConfig(**kw))
    return cfgs


def fit_cost_model(
    rows: Sequence[dict],
    target: str = "latency_us",
    out_path: Optional[str] = None,
    floor: float = 1.0,
) -> tuple[CostModel, float]:
    """Fit from measure_many() rows; returns (model, cv_mape).

    Rows whose target sits at/below ``floor`` (default 1 us) are dropped:
    they are relay measurement-noise artifacts (marginal_time clamps
    negative marginals to ~0) and a single such row poisons the MAPE by
    orders of magnitude."""
    cfgs = rows_to_configs(rows)
    y = np.asarray([float(r[target]) for r in rows])
    keep = y > floor
    if not keep.all():
        import warnings

        warnings.warn(
            f"dropping {int((~keep).sum())}/{len(y)} rows at the "
            f"measurement noise floor (<= {floor})"
        )
        cfgs = [c for c, k in zip(cfgs, keep) if k]
        y = y[keep]
    model = CostModel(target=target).fit(cfgs, y)
    mape = cv_mape(cfgs, y)
    if out_path:
        model.save(out_path)
    return model, mape
