"""Design-space exploration: config space, measurement, learned cost models,
and the DSEEngine driver.

TPU-native re-architecture of the reference's L4 DSE layer (SURVEY.md §2):
where the reference samples HLS configs, synthesizes 400 of them for hours
(experiments/build_dse_models.py), and fits ExtraTrees on csynth latency/BRAM
reports (experiments/process_dse_models.py), this subsystem samples execution
policies (batch bucket, precision, ELL width, model shape), measures compiled
kernels in seconds, and fits the same family of regressors on real timings +
compiled-HLO cost analysis.
"""

from gnnbuilder_tpu.dse.engine import DSEEngine
from gnnbuilder_tpu.dse.measure import measure_config, measure_many
from gnnbuilder_tpu.dse.model import (
    CostModel,
    cv_mape,
    fit_cost_model,
    transform_x,
)
from gnnbuilder_tpu.dse.space import DSEConfig, full_space, sample_space
from gnnbuilder_tpu.dse.analysis import dse_speedup_report

__all__ = [
    "DSEEngine",
    "DSEConfig",
    "full_space",
    "sample_space",
    "measure_config",
    "measure_many",
    "CostModel",
    "cv_mape",
    "fit_cost_model",
    "transform_x",
    "dse_speedup_report",
]
