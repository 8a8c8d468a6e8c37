"""Pallas TPU kernels — the hand-tiled fast path under the XLA ops.

Kernels here are drop-in replacements for specific op chains in
ops/ell.py, selected by the compile layer when their static preconditions
hold (see each kernel's ``supports``).  Everything has an XLA fallback with
identical numerics, which is also the training path until custom VJPs land.
"""

from gnnbuilder_tpu.ops.pallas.ell_agg import fused_ell_aggregate, supports

__all__ = ["fused_ell_aggregate", "supports"]
