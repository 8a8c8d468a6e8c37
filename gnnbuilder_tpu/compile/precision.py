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

import dataclasses

import jax.numpy as jnp

__all__ = ["Precision"]


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

    def cast_params(self, params):
        import jax

        if self.name == "f32":
            return params
        if self.name == "bf16":
            return jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32
                else p,
                params,
            )
        raise NotImplementedError(
            "int8 parameter quantization is applied per-kernel; see dse/"
        )

    def __str__(self) -> str:
        return self.name
