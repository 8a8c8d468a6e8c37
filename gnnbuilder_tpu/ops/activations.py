"""Activation library matching the reference's 13 scalar activations
(gnn_builder_lib.h:308-540) with PyTorch-parity numerics.

On TPU these are VPU element-wise ops that XLA fuses into the surrounding
matmuls; there is no need for the reference's per-element PIPELINE pragmas or
the fixed-point overflow clamp in ``activation_gelu_approx_tanh``
(gnn_builder_lib.h:393-416) — but the tanh-approx variant itself is provided
for numerics-compatible low-precision execution.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["ACTIVATIONS", "get_activation"]


def identity(x):
    return x


def relu(x):
    return jax.nn.relu(x)


def elu(x, alpha: float = 1.0):
    return jax.nn.elu(x, alpha)


def hardtanh(x, min_val: float = -1.0, max_val: float = 1.0):
    return jnp.clip(x, min_val, max_val)


def leakyrelu(x, negative_slope: float = 0.01):
    return jax.nn.leaky_relu(x, negative_slope)


def gelu(x):
    # exact erf formulation — matches torch.nn.GELU(approximate="none")
    return jax.nn.gelu(x, approximate=False)


def gelu_approx_tanh(x):
    # tanh approximation — matches torch.nn.GELU(approximate="tanh") and the
    # reference's hardware gelu (gnn_builder_lib.h:393-416, minus the
    # fixed-point clamp which bf16/f32 does not need)
    c = math.sqrt(2.0 / math.pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def sigmoid(x):
    return jax.nn.sigmoid(x)


def silu(x):
    return jax.nn.silu(x)


def tanh(x):
    return jnp.tanh(x)


def softsign(x):
    return jax.nn.soft_sign(x)


def sin(x):
    return jnp.sin(x)


def cos(x):
    return jnp.cos(x)


ACTIVATIONS = {
    "identity": identity,
    "relu": relu,
    "elu": elu,
    "hardtanh": hardtanh,
    "leakyrelu": leakyrelu,
    "gelu": gelu,
    "gelu_approx_tanh": gelu_approx_tanh,
    "sigmoid": sigmoid,
    "silu": silu,
    "tanh": tanh,
    "softsign": softsign,
    "sin": sin,
    "cos": cos,
}

# activations accepted by model containers, mirroring the reference's
# SUPPORTED_ACTIVATIONS = [ReLU, GELU, Sigmoid, Tanh] (models.py:360)
SUPPORTED_MODEL_ACTIVATIONS = ("relu", "gelu", "sigmoid", "tanh")

# output activations (constructed with dim=-1 in the reference,
# models.py:500-502); applied over the last axis
OUTPUT_ACTIVATIONS = {
    "softmax": lambda x: jax.nn.softmax(x, axis=-1),
    "log_softmax": lambda x: jax.nn.log_softmax(x, axis=-1),
}


def get_activation(name):
    if callable(name):
        return name
    if name is None:
        return identity
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise ValueError(
            f"unknown activation {name!r}; supported: {sorted(ACTIVATIONS)}"
        ) from None
