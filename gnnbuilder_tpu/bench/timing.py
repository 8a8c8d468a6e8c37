"""Reliable device timing.

On this environment's tunneled TPU (axon relay), ``block_until_ready()``
returns when the remote call is enqueued, not when it finishes — naive timing
reports impossible numbers (>peak FLOP/s).  The only reliable sync is a
device->host transfer, which itself costs a fixed ~25-40 ms relay round trip.
``marginal_time`` therefore times two different call counts, each fenced by a
tiny scalar transfer, and returns the per-call difference — fixed overheads
(transfer, dispatch queue fill) cancel out.

MEASUREMENT PROTOCOL (the one all committed artifacts use):
  * chained calls (x = fn(x)) so consecutive device calls cannot overlap
    or elide through the relay — ``chained_marginal_time``;
  * median over ``repeats`` marginal estimates (relay noise has heavy
    positive outliers; a min would bias low);
  * resolution guard: an estimate whose total timed window is below the
    relay jitter is UNRESOLVED — ``strict=True`` raises
    ``MeasurementUnresolved`` instead of returning a physically
    meaningless clamp (the round-2 window_mode_ab ``lin_tile: 0.001us``
    artifact is exactly this failure mode, now annotated invalid).
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

__all__ = [
    "marginal_time",
    "chained_marginal_time",
    "timed_fence",
    "MeasurementUnresolved",
]

# total timed-window seconds below which a marginal estimate cannot be
# distinguished from relay jitter (~1-2 ms per fenced window)
_MIN_WINDOW_S = 2e-3


class MeasurementUnresolved(RuntimeError):
    """The timed window was too small to resolve the per-call marginal
    (sub-relay-jitter); widen n_hi - n_lo or chain more work per call."""


def timed_fence(out) -> float:
    """Force full materialization of a pytree output; returns a checksum
    so the transfer cannot be elided."""
    leaf = out
    while isinstance(leaf, (tuple, list, dict)):
        leaf = (
            next(iter(leaf.values())) if isinstance(leaf, dict) else leaf[0]
        )
    return float(np.asarray(jnp.sum(leaf)))


def marginal_time(
    fn, *args, n_lo: int = 5, n_hi: int = 25, warmup: int = 3,
    repeats: int = 2, strict: bool = False,
) -> float:
    """Marginal seconds per ``fn(*args)`` call, relay overhead cancelled.

    ``strict=True`` raises :class:`MeasurementUnresolved` when the
    estimate is below the measurement resolution (estimate * call gap <
    relay jitter) instead of returning the clamped floor."""
    if n_hi <= n_lo:  # keep a measurable gap for any caller-supplied iters
        n_lo = max(1, n_hi // 2)
        n_hi = max(n_lo + 1, n_hi)
    for _ in range(warmup):
        timed_fence(fn(*args))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        timed_fence(out)
        return time.perf_counter() - t0

    estimates = []
    for _ in range(repeats):
        t_lo = run(n_lo)
        t_hi = run(n_hi)
        estimates.append((t_hi - t_lo) / (n_hi - n_lo))
    # median: relay noise has heavy positive outliers (a min would bias low
    # through the symmetric component)
    est = float(np.median(estimates))
    if strict and est * (n_hi - n_lo) < _MIN_WINDOW_S:
        raise MeasurementUnresolved(
            f"marginal estimate {est*1e6:.3f} us over a {n_hi - n_lo}-call "
            f"gap is below the {_MIN_WINDOW_S*1e3:.0f} ms relay-jitter "
            "resolution; widen the call-count gap"
        )
    return max(est, 1e-9)


def chained_marginal_time(
    fn, x0, n_lo: int = 10, n_hi: int = 50, repeats: int = 5,
    strict: bool = False,
) -> float:
    """marginal_time over a CHAINED call sequence: the closure feeds each
    output back as the next input (x = fn(x)), so consecutive device calls
    cannot overlap or elide through the axon relay — the HONEST protocol
    for per-op numbers (CLAUDE.md).  ``fn`` must map its output shape to
    its input shape."""
    st = {"x": x0}

    def one():
        st["x"] = fn(st["x"])
        return st["x"]

    return marginal_time(
        one, n_lo=n_lo, n_hi=n_hi, repeats=repeats, strict=strict
    )
