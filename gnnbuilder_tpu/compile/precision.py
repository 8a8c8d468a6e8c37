"""Precision policy — the TPU-native analog of the reference's ap_fixed FPX
type spec (code_gen.py:39-52).

Where the reference picks ``ap_fixed<W,I>`` widths per design, a TPU program
picks a dtype policy: parameter storage dtype, compute (matmul input) dtype,
and accumulation dtype.  The MXU natively computes bf16 x bf16 -> f32 and
int8 x int8 -> i32, so the useful points are:

* ``Precision.f32()``   — float32 everywhere (parity/testing; FPX(32,16) analog)
* ``Precision.bf16()``  — bf16 params+compute, f32 accumulate (FPX(16,10) analog,
  the reference's "fpga_par" precision point)
* ``Precision.int8()``  — int8 quantized matmuls with per-channel scales
  (beyond the reference's precision menu; see ops/pallas quantization kernels)
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses

import jax.numpy as jnp

__all__ = ["Precision", "active_precision"]

# trace-time precision context: Program.activate()s it around model.apply so
# layers (nn/linear.py) can pick the quantized compute path without plumbing
# a flag through every module signature
_ACTIVE: contextvars.ContextVar = contextvars.ContextVar(
    "gnnb_precision", default=None
)


def active_precision():
    """The Precision currently activated by the enclosing Program (or None)."""
    return _ACTIVE.get()


@dataclasses.dataclass(frozen=True)
class Precision:
    name: str
    param_dtype: jnp.dtype
    compute_dtype: jnp.dtype
    accum_dtype: jnp.dtype

    @staticmethod
    def f32() -> "Precision":
        return Precision("f32", jnp.float32, jnp.float32, jnp.float32)

    @staticmethod
    def bf16() -> "Precision":
        return Precision("bf16", jnp.bfloat16, jnp.bfloat16, jnp.float32)

    @staticmethod
    def int8() -> "Precision":
        return Precision("int8", jnp.int8, jnp.int8, jnp.int32)

    @staticmethod
    def from_name(name: str) -> "Precision":
        try:
            return getattr(Precision, name)()
        except AttributeError:
            raise ValueError(f"unknown precision {name!r}") from None

    @contextlib.contextmanager
    def activate(self):
        tok = _ACTIVE.set(self)
        try:
            yield self
        finally:
            _ACTIVE.reset(tok)

    def cast_params(self, params):
        import jax

        if self.name in ("f32", "int8"):
            # int8 keeps master weights in f32; layers quantize per-matmul
            # (symmetric per-channel, ops/quant.py) under activate()
            return params
        if self.name == "bf16":
            return jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32
                else p,
                params,
            )
        raise NotImplementedError(self.name)

    def __str__(self) -> str:
        return self.name
