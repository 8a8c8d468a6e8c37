"""Profiling utilities — jax.profiler integration + per-call accounting.

The reference's tracing story is wall-clock chrono timing in the generated
testbench plus cycle counts from csynth (SURVEY.md §5).  Here:

* ``trace(dir)``    — context manager around jax.profiler for TensorBoard/
                      Perfetto traces of real device execution;
* ``profile_program`` — one-stop report for a compiled Program on a batch:
                      marginal latency, FLOPs/bytes from compiled-HLO cost
                      analysis, roofline fractions, edges/s.
"""

from __future__ import annotations

import contextlib

__all__ = ["trace", "profile_program"]


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """jax.profiler trace around a block (may be unsupported on relayed
    backends; falls back to a no-op with a warning)."""
    import jax

    try:
        jax.profiler.start_trace(
            log_dir, create_perfetto_link=create_perfetto_link
        )
        started = True
    except Exception as e:  # relay backends may not support profiling
        import warnings

        warnings.warn(f"jax.profiler unavailable: {e}")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def profile_program(program, batch, iters: int = 20) -> dict:
    """Latency + cost + roofline in one dict (the csynth-report analog with
    measured instead of estimated cycles)."""
    import numpy as np

    from gnnbuilder_tpu.bench.roofline import (
        program_min_bytes,
        roofline_report,
    )

    bench = program.benchmark(batch, iters=iters)
    cost = program.cost_analysis(batch)
    real_edges = int(np.asarray(batch.edge_mask).sum())
    roof = roofline_report(
        bench["latency_s"],
        flops=float(cost.get("flops", 0.0)),
        min_bytes=program_min_bytes(program, batch),
        xla_bytes=float(cost.get("bytes accessed", 0.0)),
        num_edges=real_edges,
    )
    return {**bench, **roof}
