"""Int8 quantized linear algebra — the precision point beyond the
reference's fixed-point menu.

The reference's FPX(W,I) ap_fixed types trade LUT/DSP area for error
(code_gen.py:39-52); on TPU the analogous trade is the MXU's native
int8 x int8 -> int32 mode at 2x bf16 throughput.  Two activation-scale
schemes:

* dynamic (default): symmetric per-output-channel weight scales x
  per-row dynamic activation scales — no calibration data needed;
* static: per-site activation scales recorded from representative
  batches (``calibration(record=...)`` around an eager forward), then
  baked in as constants — removes the per-row abs-max reduction from
  the serving path and is what ``Program.export`` freezes into the
  deployable artifact.  The analog of the reference choosing ap_fixed
  integer widths from dataset statistics (code_gen.py:117-119).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "quantize_weight",
    "quantize_rows",
    "int8_matmul",
    "int8_matmul_static",
    "calibration",
    "active_calibration",
]


def quantize_weight(w: jax.Array):
    """Symmetric per-output-channel (axis 1) int8 quantization.

    Returns (q [in, out] int8, scale [out] f32) with w ≈ q * scale.
    """
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_rows(x: jax.Array):
    """Symmetric per-row dynamic int8 quantization of activations."""
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s


# ---------------------------------------------------------------------------
# Static activation calibration.
#
# A contextvar carries the calibration state so quantized call sites
# (nn/linear.py) need no signature changes — the same pattern as the
# precision policy (compile/precision.py).  Sites are keyed by the flax
# module path, which is deterministic across traces.
# ---------------------------------------------------------------------------

_CALIB: contextvars.ContextVar = contextvars.ContextVar(
    "gnnb_int8_calibration", default=None
)


class _CalibState:
    __slots__ = ("record", "scales")

    def __init__(self, record: Optional[dict], scales: Optional[dict]):
        self.record = record    # site -> running max |x| (recording mode)
        self.scales = scales    # site -> static activation scale (serving)


@contextlib.contextmanager
def calibration(record: Optional[dict] = None,
                scales: Optional[dict] = None):
    """Activate int8 activation-scale calibration.

    ``record={}``: run the forward EAGERLY (unjitted) inside this context;
    each quantized site updates ``record[site]`` with its max |activation|.
    ``scales={site: s}``: quantized sites use the static scale instead of
    the per-row dynamic one (s = max_abs / 127 from a recorded dict).
    """
    tok = _CALIB.set(_CalibState(record, scales))
    try:
        yield
    finally:
        _CALIB.reset(tok)


def active_calibration() -> Optional[_CalibState]:
    return _CALIB.get()


def scales_from_record(record: dict) -> dict:
    """max-abs record -> static symmetric scale per site."""
    return {k: max(float(v), 1e-12) / 127.0 for k, v in record.items()}


def int8_matmul_static(x: jax.Array, w: jax.Array, s_x: float) -> jax.Array:
    """f32-in/f32-out int8 matmul with a STATIC activation scale: the
    per-row abs-max reduction disappears from the serving path (values
    beyond the calibrated range saturate at ±127, like ap_fixed)."""
    wq, sw = quantize_weight(w)
    xq = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq,
        wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * s_x * sw[None, :]


def int8_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """f32-in/f32-out matmul computed on the int8 MXU path.

    Quantizes both operands symmetrically, contracts in int32, and rescales:
    y = (x_q @ w_q) * s_x * s_w.
    """
    xq, sx = quantize_rows(x)
    wq, sw = quantize_weight(w)
    y = jax.lax.dot_general(
        xq,
        wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * sx * sw[None, :]
