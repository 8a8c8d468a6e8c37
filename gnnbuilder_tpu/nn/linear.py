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


class Linear(nn.Module):
    """nn.Dense with torch-style init and optional compute dtype policy."""

    features: int
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype | None = None  # compute dtype; None = infer

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init, (fan_in, self.features), self.param_dtype
        )
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
