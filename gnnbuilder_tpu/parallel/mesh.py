"""Device mesh construction for multi-chip scaling.

The reference is a single-device accelerator generator with no distribution
story (SURVEY.md section 2.4); here multi-chip is first-class: a 2-D
("dp", "tp") mesh where

* ``dp`` (data/edge parallel) shards the flat node/edge arrays of a
  GraphBatch — the edge-partitioned large-graph/batch axis (the GNN analog
  of sequence/context parallelism, BASELINE.json north star), and
* ``tp`` (tensor parallel) shards weight matrices along output features —
  the multi-chip generalization of the reference's intra-kernel p_in/p_out
  unroll factors (models.py:32, gnn_builder_lib.h:819-831).

Collectives ride ICI via XLA GSPMD; no NCCL/MPI analog is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "make_multihost_mesh"]


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % tp == 0, (n, tp)
        dp = n // tp
    assert dp * tp <= n, f"dp({dp}) * tp({tp}) > devices({n})"
    # submeshes (dp*tp < n) are legal: scaling sweeps measure width k on the
    # first k devices (parallel/scaling.py)
    arr = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def make_multihost_mesh(tp: int = 1) -> Mesh:
    """Global ("dp","tp") mesh over every process's devices.

    Call ``jax.distributed.initialize()`` on each host first.  Devices are
    explicitly grouped by owning process (``jax.devices()`` global order
    follows physical topology and may interleave hosts on torus slices), so
    consecutive dp shards stay host-local: the halo ring's ppermute
    neighbors are intra-host (ICI) except the one seam pair per host
    boundary, and only the optimizer's gradient all-reduce crosses DCN —
    the layout docs/distribution.md §3 prescribes.  Single-process this
    equals ``make_mesh(tp=tp)``.
    """
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devices)
    assert n % tp == 0, (n, tp)
    arr = np.array(devices).reshape(n // tp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
