"""MLP head with per-stage tile hints.

Mirror of the reference's MLP (models.py:365-450): ``hidden_layers`` hidden
Linear+activation stages followed by one output Linear (or a single Linear
when hidden_layers == 0).  ``p_in/p_hidden/p_out`` are tile hints (HLS unroll
factors in the reference, Pallas/MXU block hints here); ``p_factors`` exposes
them per linear stage with the same semantics as models.py:432-446.
"""

from __future__ import annotations

import flax.linen as nn

from gnnbuilder_tpu.nn.linear import Linear
from gnnbuilder_tpu.ops.activations import get_activation

__all__ = ["MLP"]


class MLP(nn.Module):
    in_dim: int
    out_dim: int
    hidden_dim: int = 64
    hidden_layers: int = 2
    activation: str = "relu"
    p_in: int = 1
    p_hidden: int = 1
    p_out: int = 1

    def setup(self):
        if self.hidden_layers < 0:
            raise ValueError("hidden_layers must be >= 0")
        layers = []
        if self.hidden_layers == 0:
            layers.append(Linear(self.out_dim, name="linear_0"))
        else:
            for i in range(self.hidden_layers):
                layers.append(Linear(self.hidden_dim, name=f"linear_{i}"))
            layers.append(
                Linear(self.out_dim, name=f"linear_{self.hidden_layers}")
            )
        self.linear_layers = layers
        self.act = get_activation(self.activation)

    def __call__(self, x):
        for i, lin in enumerate(self.linear_layers):
            x = lin(x)
            if i < len(self.linear_layers) - 1:
                x = self.act(x)
        return x

    @property
    def p_factors(self):
        if self.hidden_layers == 0:
            return [(self.p_in, self.p_out)]
        out = []
        for i in range(self.hidden_layers):
            out.append((self.p_in if i == 0 else self.p_hidden, self.p_hidden))
        out.append((self.p_hidden, self.p_out))
        return out

    @property
    def num_of_layers(self) -> int:
        return self.hidden_layers + 1 if self.hidden_layers > 0 else 1
