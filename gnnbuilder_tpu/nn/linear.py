"""Dense layers with torch-compatible initialization.

The reference's linear kernels (gnn_builder_lib.h:808-1045) are block-parallel
GEMVs whose unroll factors p_in/p_out come from the model spec; on TPU a
linear layer is an MXU matmul and the p-factors map to Pallas tile shapes
(see gnnbuilder_tpu/ops/pallas).  Initialization matches torch.nn.Linear
(kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) for both weight and bias)
so models trained in this framework behave like the reference's torch models.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax.nn import initializers

# U(+-sqrt(1/fan_in)) — equals torch.nn.Linear's kaiming_uniform(a=sqrt(5))
torch_kernel_init = initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_in", distribution="uniform"
)


def torch_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    bound = 1.0 / (fan_in**0.5)
    import jax.random as jr

    return jr.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class PairLinear(nn.Module):
    """Linear over a virtual concat [a || b], split into two half-kernels.

    Mathematically identical to ``Linear(features)`` applied to
    ``concat([a, b], -1)`` with fan_in = 2F, but evaluated as
    ``u = a @ W[:F] + bias`` and ``v = b @ W[F:]`` on *node* arrays so the
    per-edge (or per-ELL-slot) message is just ``u_i + v_j`` — no per-edge
    matmul, no concat materialization.  This is what makes PNA's pre_nn
    (reference pna_conv lin stage, gnn_builder_lib.h:1750-1834) run at node
    cost instead of edge cost.  Parameter names/shapes match ``Linear`` so
    torch ports are unchanged.
    """

    features: int

    @nn.compact
    def __call__(self, a, b):
        fan = a.shape[-1] + b.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init, (fan, self.features), jnp.float32
        )
        bias = self.param(
            "bias",
            lambda k, s, d: torch_bias_init(k, s, d, fan_in=fan),
            (self.features,),
            jnp.float32,
        )
        Fa = a.shape[-1]
        u = jnp.dot(a, kernel[:Fa], preferred_element_type=jnp.float32) + bias
        v = jnp.dot(b, kernel[Fa:], preferred_element_type=jnp.float32)
        return u, v


class BlockScaledLinear(nn.Module):
    """Linear over a virtual concat ``[x || A*c_1 || ... || A*c_S]`` where
    each ``c_s`` is a per-row (diagonal) scale — evaluated blockwise as
    ``x@K_0 + bias + sum_s c_s * (A @ K_s)`` since per-row scaling commutes
    with the matmul.  Same FLOPs, but the wide concat (the reference PNA's
    EMB*13 buffer, gnn_builder_lib.h:2092) never hits memory.  Parameter
    names/shapes match ``Linear`` on the real concat, so torch ports are
    unchanged.
    """

    features: int

    @nn.compact
    def __call__(self, x, a, scales):
        Fx, Fa, S = x.shape[-1], a.shape[-1], len(scales)
        fan = Fx + Fa * S
        kernel = self.param(
            "kernel", torch_kernel_init, (fan, self.features), jnp.float32
        )
        bias = self.param(
            "bias",
            lambda k, s, d: torch_bias_init(k, s, d, fan_in=fan),
            (self.features,),
            jnp.float32,
        )
        out = jnp.dot(x, kernel[:Fx], preferred_element_type=jnp.float32)
        out = out + bias
        # one matmul for all scaler blocks: [N, Fa] @ [Fa, S*features]
        ks = jnp.concatenate(
            [
                kernel[Fx + i * Fa : Fx + (i + 1) * Fa]
                for i in range(S)
            ],
            axis=1,
        )
        y = jnp.dot(a, ks, preferred_element_type=jnp.float32)
        for i, c in enumerate(scales):
            blk = y[:, i * self.features : (i + 1) * self.features]
            out = out + (blk if c is None else c * blk)
        return out


class Linear(nn.Module):
    """nn.Dense with torch-style init and optional compute dtype policy."""

    features: int
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype | None = None  # compute dtype; None = infer

    @nn.compact
    def __call__(self, x):
        from gnnbuilder_tpu.compile.precision import active_precision

        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init, (fan_in, self.features), self.param_dtype
        )
        prec = active_precision()
        if prec is not None and prec.name == "int8":
            # MXU int8 path: per-channel weight scales + per-row dynamic OR
            # calibrated-static activation scales (ops/quant.py) — the FPX
            # fixed-point analog
            from gnnbuilder_tpu.ops.quant import (
                active_calibration,
                int8_matmul,
                int8_matmul_static,
            )

            site = "/".join(str(p) for p in self.scope.path)
            calib = active_calibration()
            if calib is not None and calib.record is not None:
                # recording pass runs eagerly; values are concrete
                m = float(jnp.max(jnp.abs(x)))
                calib.record[site] = max(calib.record.get(site, 0.0), m)
            if (calib is not None and calib.scales is not None
                    and site in calib.scales):
                y = int8_matmul_static(
                    x, kernel.astype(jnp.float32), calib.scales[site]
                )
            else:
                y = int8_matmul(x, kernel.astype(jnp.float32))
        else:
            y = jnp.dot(
                x.astype(self.dtype) if self.dtype else x,
                kernel.astype(self.dtype) if self.dtype else kernel,
                preferred_element_type=jnp.float32,
            )
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s, d: torch_bias_init(k, s, d, fan_in=fan_in),
                (self.features,),
                self.param_dtype,
            )
            y = y + bias
        return y
