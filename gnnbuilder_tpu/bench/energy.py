"""Energy accounting — the RAPL / nvidia-smi analog, with this
environment's honest limits.

The reference measures CPU package energy via Intel RAPL
(/sys/class/powercap, build_base_benchmarks.py:188-213) and GPU power by
sampling ``nvidia-smi dmon`` (:280-348).  Neither transfers here:

* the benchmark host is a VM with no ``/sys/class/powercap`` exposure
  (checked at import; ``rapl_available()``), and
* the TPU is reached through a remote relay that exposes no power
  telemetry — there is no libtpu power counter surface on this tunnel.

What CAN be stated rigorously is an UPPER BOUND: energy/graph <=
board-TDP x latency/graph.  That bound is what this module computes,
with the TDP values explicit and overridable (``GNNB_TPU_TDP_W``,
``GNNB_CPU_TDP_W``) and every emitted field suffixed ``_bound`` so it
can never be mistaken for a measurement.  If RAPL is present (bare-metal
deployments), ``cpu_energy_j`` measures the real package counter delta
around a callable, restoring reference-grade CPU numbers.
"""

from __future__ import annotations

import glob
import os
import time
from typing import Callable, Optional

__all__ = [
    "rapl_available",
    "cpu_energy_j",
    "energy_bound_j_per_graph",
    "TPU_TDP_W",
    "CPU_TDP_W",
]

# TPU v5e board power, upper bound.  Public comparisons place v5e peak
# board power well under 250 W; 200 W is a deliberately conservative
# default for the bound.  Override with GNNB_TPU_TDP_W.
TPU_TDP_W = float(os.environ.get("GNNB_TPU_TDP_W", 200.0))
# single pinned CPU core + its share of uncore; reference measured
# ~12.6 W package on its 1-core runs (results_testing/energy_pyg_cpu_*)
CPU_TDP_W = float(os.environ.get("GNNB_CPU_TDP_W", 15.0))

_RAPL_GLOB = "/sys/class/powercap/intel-rapl:*/energy_uj"


def rapl_available() -> bool:
    return bool(glob.glob(_RAPL_GLOB))


def _read_rapl_uj() -> int:
    return sum(int(open(p).read()) for p in glob.glob(_RAPL_GLOB))


def cpu_energy_j(fn: Callable, *args, **kw) -> Optional[tuple]:
    """Measured package energy around ``fn(*args, **kw)`` via RAPL, or
    None when the counters are not exposed (VMs, this environment).
    Returns (result, joules, seconds)."""
    if not rapl_available():
        return None
    e0, t0 = _read_rapl_uj(), time.perf_counter()
    out = fn(*args, **kw)
    e1, t1 = _read_rapl_uj(), time.perf_counter()
    return out, (e1 - e0) / 1e6, t1 - t0


def energy_bound_j_per_graph(
    latency_s_per_graph: float, tdp_w: float
) -> float:
    """Upper bound: a device drawing at most ``tdp_w`` for the per-graph
    latency spends at most this many joules per graph."""
    return tdp_w * latency_s_per_graph
