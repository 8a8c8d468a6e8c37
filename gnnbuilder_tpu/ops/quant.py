"""Int8 quantized linear algebra — the precision point beyond the
reference's fixed-point menu.

The reference's FPX(W,I) ap_fixed types trade LUT/DSP area for error
(code_gen.py:39-52); on TPU the analogous trade is the MXU's native
int8 x int8 -> int32 mode at 2x bf16 throughput.  Scheme: symmetric
per-output-channel weight scales (static) x per-row dynamic activation
scales — the standard PTQ recipe, no calibration data needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["quantize_weight", "quantize_rows", "int8_matmul"]


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
