"""Reliable device timing.

On this environment's tunneled TPU (axon relay), ``block_until_ready()``
returns when the remote call is enqueued, not when it finishes — naive timing
reports impossible numbers (>peak FLOP/s).  The only reliable sync is a
device->host transfer, which itself costs a fixed ~25-40 ms relay round trip.
``marginal_time`` therefore times two different call counts, each fenced by a
tiny scalar transfer, and returns the per-call difference — fixed overheads
(transfer, dispatch queue fill) cancel out.
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

__all__ = ["marginal_time", "timed_fence"]


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
    fn, *args, n_lo: int = 5, n_hi: int = 25, warmup: int = 3, repeats: int = 2
) -> float:
    """Marginal seconds per ``fn(*args)`` call, relay overhead cancelled."""
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
    return max(est, 1e-9)


def chained_marginal_time(
    fn, x0, n_lo: int = 10, n_hi: int = 50, repeats: int = 5
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

    return marginal_time(one, n_lo=n_lo, n_hi=n_hi, repeats=repeats)
