"""Activation-kernel parity vs torch on the reference's fixture: a 64-point
linspace over [-10, 10] through every activation (gen_test_data.py:35-72;
the reference's first kernel test, test.cpp:11-90)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from gnnbuilder_tpu.ops import activations as A

X = np.linspace(-10, 10, 64, dtype=np.float32)

TORCH_EQUIV = {
    "identity": lambda t: t,
    "relu": tF.relu,
    "elu": tF.elu,
    "hardtanh": tF.hardtanh,
    "leakyrelu": tF.leaky_relu,
    "gelu": lambda t: tF.gelu(t, approximate="none"),
    "gelu_approx_tanh": lambda t: tF.gelu(t, approximate="tanh"),
    "sigmoid": torch.sigmoid,
    "silu": tF.silu,
    "tanh": torch.tanh,
    "softsign": tF.softsign,
    "sin": torch.sin,
    "cos": torch.cos,
}


@pytest.mark.parametrize("name", sorted(TORCH_EQUIV))
def test_activation_matches_torch(name):
    fn = A.get_activation(name)
    got = np.asarray(fn(jnp.asarray(X)))
    want = TORCH_EQUIV[name](torch.tensor(X)).numpy()
    # reference parity bar: eps 1e-3 (test.cpp:1146); we hold 1e-5
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_all_thirteen_reference_activations_present():
    # the reference's 13 scalar activations (gnn_builder_lib.h:308-540)
    expected = {
        "elu", "hardtanh", "leakyrelu", "relu", "gelu", "gelu_approx_tanh",
        "sigmoid", "silu", "tanh", "softsign", "sin", "cos", "identity",
    }
    assert expected <= set(A.ACTIVATIONS)


def test_unknown_activation_raises():
    with pytest.raises(ValueError, match="unknown activation"):
        A.get_activation("nope")
