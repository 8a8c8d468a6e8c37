"""Roofline accounting — edges/s and %-of-peak reporting.

The reference reports cycle-accurate latency from csynth plus resource
utilization (utils.py:118-173); the TPU equivalent is a roofline model:
how close does the measured kernel run to the chip's compute or bandwidth
bound, whichever binds.  Used by the benchmark harness and by bench.py to
report the BASELINE.json "edges/s vs roofline" target.

Peak numbers are per-chip datasheet values; "min_bytes" is the
information-theoretic traffic (inputs + params + outputs once), which is
the fused-kernel target — XLA's own "bytes accessed" (cost_analysis) shows
how much extra the unfused graph moves.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["chip_peaks", "roofline_report"]

# per-chip peaks: (dense matmul FLOP/s at bf16-input/f32-accum, HBM bytes/s)
_PEAKS = {
    # TPU v5e (v5 lite): 197 TFLOP/s bf16, 819 GB/s HBM
    "v5 lite": (197e12, 819e9),
    "v5e": (197e12, 819e9),
    # TPU v5p
    "v5p": (459e12, 2765e9),
    # TPU v4
    "v4": (275e12, 1228e9),
    # generic fallback
    "default": (197e12, 819e9),
}


def chip_peaks(device=None) -> tuple[float, float]:
    """(peak_flops, peak_bytes_per_s) for the current / given device."""
    import jax

    if device is None:
        devs = jax.devices()
        if not devs:
            return _PEAKS["default"]
        device = devs[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peaks in _PEAKS.items():
        if key in kind:
            return peaks
    return _PEAKS["default"]


def roofline_report(
    measured_latency_s: float,
    flops: float,
    min_bytes: float,
    xla_bytes: Optional[float] = None,
    num_edges: Optional[int] = None,
    device=None,
) -> dict:
    """Bound the kernel by compute and bandwidth; report % of roofline.

    ``min_bytes`` should be the minimal HBM traffic (read inputs + params,
    write outputs, once each).  roofline_latency = max(compute, bandwidth)
    bound; fraction_of_roofline = roofline_latency / measured (1.0 = at the
    roofline, >1 impossible, smaller = headroom remains).
    """
    peak_flops, peak_bw = chip_peaks(device)
    t_compute = flops / peak_flops
    t_memory = min_bytes / peak_bw
    t_min = max(t_compute, t_memory)
    rep = {
        "measured_latency_s": measured_latency_s,
        "compute_bound_s": t_compute,
        "memory_bound_s": t_memory,
        "roofline_latency_s": t_min,
        "fraction_of_roofline": t_min / max(measured_latency_s, 1e-12),
        "bound": "compute" if t_compute >= t_memory else "memory",
        "peak_flops": peak_flops,
        "peak_bytes_per_s": peak_bw,
        "achieved_flops": flops / max(measured_latency_s, 1e-12),
    }
    if xla_bytes is not None:
        rep["xla_bytes_accessed"] = xla_bytes
        rep["traffic_amplification"] = xla_bytes / max(min_bytes, 1.0)
    if num_edges is not None:
        rep["edges_per_s"] = num_edges / max(measured_latency_s, 1e-12)
        rep["roofline_edges_per_s"] = num_edges / max(t_min, 1e-12)
    return rep


def program_min_bytes(program, batch) -> float:
    """Minimal traffic for one forward: node/edge features + tables read
    once, parameters read once, output written once."""
    import jax

    n_bytes = 0
    for leaf in jax.tree.leaves(batch):
        if hasattr(leaf, "nbytes"):
            n_bytes += leaf.nbytes
    p_bytes = sum(
        p.nbytes for p in jax.tree.leaves(program.params) if hasattr(p, "nbytes")
    )
    out_bytes = batch.num_graphs * 4 * getattr(
        program.model, "mlp_out_dim", 1
    )
    return float(n_bytes + p_bytes + out_bytes)
