"""Port torch golden-model parameters into flax param trees.

The reference serializes every torch parameter to ``.bin`` and reloads it in
the C++ testbench (code_gen.py:239-246, model_tb.cpp.jinja:29-65).  Here the
same role is played in-memory: copy a ``verify.torch_ref`` model's weights
into the exact flax tree the JAX model expects, so parity tests compare the
two forwards on identical weights.  torch Linear stores weight [out, in];
flax Dense kernel is [in, out] — transposed on the way over.
"""

from __future__ import annotations

import numpy as np
import torch

__all__ = ["port_conv", "port_mlp", "port_model"]


def _t(p: torch.Tensor) -> np.ndarray:
    return p.detach().cpu().numpy().astype(np.float32)


def _linear(mod: torch.nn.Linear) -> dict:
    out = {"kernel": _t(mod.weight).T}
    if mod.bias is not None:
        out["bias"] = _t(mod.bias)
    return out


def port_conv(conv_type: str, tconv) -> dict:
    if conv_type == "gcn":
        return {"lin": _linear(tconv.lin), "bias": _t(tconv.bias)}
    if conv_type == "gin":
        return {"lin0": _linear(tconv.lin0), "lin1": _linear(tconv.lin1)}
    if conv_type == "gine":
        return {
            "lin_edge": _linear(tconv.lin_edge),
            "lin0": _linear(tconv.lin0),
            "lin1": _linear(tconv.lin1),
        }
    if conv_type == "sage":
        return {"lin_l": _linear(tconv.lin_l), "lin_r": _linear(tconv.lin_r)}
    if conv_type == "pna":
        return {
            "pre_nn": _linear(tconv.pre_nn),
            "post_nn": _linear(tconv.post_nn),
            "lin": _linear(tconv.lin),
        }
    if conv_type == "gat":
        out = {
            "lin": _linear(tconv.lin),
            "att_src": _t(tconv.att_src),
            "att_dst": _t(tconv.att_dst),
            "bias": _t(tconv.bias),
        }
        if getattr(tconv, "edge_dim", None) is not None:
            out["lin_edge"] = _linear(tconv.lin_edge)
            out["att_edge"] = _t(tconv.att_edge)
        return out
    if conv_type == "edge":
        # lin0 is torch Linear [out, 2*in] -> PairLinear kernel [2*in, out]
        return {"lin0": _linear(tconv.lin0), "lin1": _linear(tconv.lin1)}
    if conv_type in ("lg", "simple"):
        return {}
    raise ValueError(f"unknown conv type {conv_type}")


def port_mlp(tmlp) -> dict:
    return {
        f"linear_{i}": _linear(lin)
        for i, lin in enumerate(tmlp.linear_layers)
    }


def port_model(conv_type: str, tmodel) -> dict:
    """Full TorchGNNModel -> flax GNNModel params."""
    params = {}
    for i, tconv in enumerate(tmodel.gnn_convs):
        p = port_conv(conv_type, tconv)
        if p:
            params[f"gnn_convs_{i}"] = p
    params["mlp_head"] = port_mlp(tmodel.mlp_head)
    return {"params": params}
