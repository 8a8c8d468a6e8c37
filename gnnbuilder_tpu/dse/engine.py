"""DSEEngine — design-space exploration driver.

The reference declared this API but left it a stub (dse.py:6-9, its
``gnnbuilder/dse_models/`` holding only a ``.touch``); this is the real
implementation: given a model family + dataset, sweep/refine execution
configs using the learned cost model, then (optionally) measure the top
candidates for ground truth — the predict-then-verify loop its experiments
ran by hand (process_dse_runtime.py:74-113).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from gnnbuilder_tpu.dse.measure import measure_config, measure_many
from gnnbuilder_tpu.dse.model import CostModel, fit_cost_model
from gnnbuilder_tpu.dse.space import DSEConfig, full_space, sample_space

__all__ = ["DSEEngine"]


class DSEEngine:
    """Explore execution configs for a model spec on a dataset.

    Typical flow::

        eng = DSEEngine(dataset="qm9")
        rows = eng.build_corpus(n=40)        # measure a seed corpus
        eng.fit()                            # learned latency model (+MAPE)
        best = eng.optimize(candidates)      # rank by prediction
        truth = eng.verify(best[:3])         # measure winners
    """

    def __init__(
        self,
        dataset: str = "qm9",
        corpus_csv: Optional[str] = None,
        objective: str = "latency_per_graph_us",
    ):
        self.dataset = dataset
        self.corpus_csv = corpus_csv
        self.objective = objective
        self.rows: list[dict] = []
        self.cost_model: Optional[CostModel] = None
        self.mape: Optional[float] = None
        if corpus_csv and os.path.exists(corpus_csv):
            import csv

            with open(corpus_csv) as f:
                self.rows = list(csv.DictReader(f))

    @classmethod
    def from_pretrained(
        cls, dataset: str = "qm9", model_path: Optional[str] = None
    ) -> "DSEEngine":
        """Engine backed by the shipped cost-model pickle
        (dse_models/model_direct.pk — the reference ships its fitted
        models the same way, process_dse_models.py:299-310) so users can
        rank/tune without measuring a corpus first."""
        if model_path is None:
            model_path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
                "dse_models", "model_direct.pk",
            )
        eng = cls(dataset=dataset)
        eng.cost_model = CostModel.load(model_path)
        return eng

    # ------------------------------------------------------------- corpus
    def build_corpus(
        self, n: int = 40, seed: int = 0, axes: Optional[dict] = None,
        iters: int = 10,
    ) -> list[dict]:
        cfgs = sample_space(n, seed=seed, axes=axes)
        self.rows = measure_many(
            cfgs, dataset=self.dataset, iters=iters, out_csv=self.corpus_csv
        )
        return self.rows

    # ---------------------------------------------------------------- fit
    def fit(self, target: Optional[str] = None) -> float:
        target = target or self.objective
        if not self.rows:
            raise RuntimeError("no corpus; call build_corpus() first")
        self.cost_model, self.mape = fit_cost_model(self.rows, target=target)
        return self.mape

    # ------------------------------------------------------------ predict
    def predict(self, cfgs: Sequence[DSEConfig]) -> np.ndarray:
        if self.cost_model is None:
            self.fit()
        return self.cost_model.predict(cfgs)

    def optimize(
        self,
        candidates: Optional[Sequence[DSEConfig]] = None,
        top_k: int = 5,
    ) -> list[tuple[DSEConfig, float]]:
        """Rank candidate configs by predicted objective (ascending)."""
        if candidates is None:
            candidates = list(full_space())
        preds = self.predict(candidates)
        order = np.argsort(preds)[:top_k]
        return [(candidates[i], float(preds[i])) for i in order]

    # ------------------------------------------------------------- verify
    def verify(self, cfgs: Sequence[DSEConfig], iters: int = 15) -> list[dict]:
        """Measure ground truth for the predicted winners."""
        return [
            measure_config(c, dataset=self.dataset, iters=iters) for c in cfgs
        ]

    # --------------------------------------------------------------- tune
    def tune_kernels(
        self,
        conv: str,
        gnn_hidden_dim: int = 128,
        gnn_output_dim: int = 64,
        gnn_num_layers: int = 6,
        gnn_skip_connection: bool = True,
        batch_size: int = 256,
        precision: str = "f32",
        avg_nodes: float = 16.0,
        avg_edges: float = 34.0,
        apply: bool = True,
    ) -> dict:
        """Pick the execution knobs (tile_rows, ell_width) for a FIXED
        model/batch spec by cost-model prediction, optionally applying
        them process-wide via ops.dispatch.set_kernel_overrides — the
        autotuner role SURVEY §7 assigns the DSE.

        Only numerics-preserving knobs are tuned, and an existing
        gather_mode override is left untouched (the tuner must never
        silently trade accuracy for speed).  ``ell_width`` is a
        packing-time knob: applying it changes the default for batches
        packed AFTER the call (core/graph.set_default_ell_width); already
        built batches keep their layout.
        """
        base = dict(
            conv=conv, gnn_hidden_dim=gnn_hidden_dim,
            gnn_output_dim=gnn_output_dim, gnn_num_layers=gnn_num_layers,
            gnn_skip_connection=gnn_skip_connection,
            batch_size=batch_size, precision=precision,
            avg_nodes=avg_nodes, avg_edges=avg_edges,
        )
        cands = [
            DSEConfig(**base, ell_width=ew, tile_rows=tr,
                      window_mode=wm, block_size=bs_)
            for ew in (None, 0)
            for tr in (None, 256, 512, 1024)
            for wm in (None, "sub", "tile")
            for bs_ in (0, 128)
        ]
        ranked = self.optimize(cands, top_k=len(cands))
        best, best_pred = ranked[0]
        applied = {}
        if apply:
            from gnnbuilder_tpu.ops import dispatch

            dispatch.set_kernel_overrides(
                tile_rows=best.tile_rows, ell_width=best.ell_width,
                window_mode=best.window_mode,
            )
            applied = {
                "tile_rows": best.tile_rows, "ell_width": best.ell_width,
                "window_mode": best.window_mode,
                # block_size is a packing-time layout choice — report it
                # so the caller packs batches accordingly (build_graph_
                # batch / Program / GraphLoader block_size)
                "block_size": getattr(best, "block_size", 0),
            }
        return {
            "best": best,
            "predicted_us_per_graph": best_pred,
            "ranked": ranked,
            "applied": applied,
        }
