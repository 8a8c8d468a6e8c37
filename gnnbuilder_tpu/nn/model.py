"""GNNModel — the declarative whole-model container.

Mirror of the reference's GNNModel (models.py:462-575): a uniform conv stack
(first layer F_in -> hidden, interior hidden -> hidden, last hidden -> F_out),
optional skip connections on interior layers added *before* the activation
(models.py:562-564), multi-aggregation global pooling, an MLP head, and an
optional output activation applied over the last axis (models.py:500-502).

Forward semantics are exactly models.py:551-575 — this is the golden
semantics the parity tests enforce against the torch reference.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn

from gnnbuilder_tpu.core.graph import GraphBatch
from gnnbuilder_tpu.nn.conv import SUPPORTED_GNN_CONVS
from gnnbuilder_tpu.nn.mlp import MLP
from gnnbuilder_tpu.nn.pool import GlobalPooling
from gnnbuilder_tpu.ops.activations import (
    OUTPUT_ACTIVATIONS,
    SUPPORTED_MODEL_ACTIVATIONS,
)

__all__ = ["GNNModel"]

# convs that consume edge features
_EDGE_CONVS = ("gine",)


class GNNModel(nn.Module):
    graph_input_feature_dim: int
    gnn_hidden_dim: int
    gnn_num_layers: int
    gnn_output_dim: int
    gnn_conv: str  # key into SUPPORTED_GNN_CONVS
    gnn_activation: str = "relu"
    gnn_skip_connection: bool = False
    graph_input_edge_dim: Optional[int] = None
    pooling_aggrs: Sequence[str] = ("add",)
    mlp_hidden_dim: int = 64
    mlp_hidden_layers: int = 2
    mlp_out_dim: int = 1
    mlp_activation: str = "relu"
    output_activation: Optional[str] = None  # "softmax" | "log_softmax"
    gnn_p_in: int = 1
    gnn_p_hidden: int = 1
    gnn_p_out: int = 1
    mlp_p_in: int = 1
    mlp_p_hidden: int = 1
    mlp_p_out: int = 1
    conv_kwargs: Optional[dict] = None  # e.g. {"delta": 2.78} for PNA
    # rematerialize each conv layer in the backward (jax.checkpoint):
    # trades the per-layer backward residuals (PNA saves ~9F floats/node —
    # ~0.5 GB at qm9 b1024 x 6 layers) for a forward replay.  The TPU
    # HBM-for-FLOPs knob; off by default because the hand-written backward
    # kernels (ops/pallas/ell_bwd.py) are faster when memory fits.
    remat: bool = False

    def __post_init__(self):
        # eager validation at construction, like the reference's
        # GNNModel.__init__ gates (models.py:489-502) — not deferred to the
        # first trace
        super().__post_init__()
        self._validate()

    def _validate(self):
        if self.gnn_conv not in SUPPORTED_GNN_CONVS:
            raise ValueError(
                f"gnn_conv must be one of {sorted(SUPPORTED_GNN_CONVS)}"
            )
        if self.gnn_activation not in SUPPORTED_MODEL_ACTIVATIONS:
            raise ValueError(
                f"gnn_activation must be one of {SUPPORTED_MODEL_ACTIVATIONS}"
            )
        if (
            self.output_activation is not None
            and self.output_activation not in OUTPUT_ACTIVATIONS
        ):
            raise ValueError(
                f"output_activation must be one of {sorted(OUTPUT_ACTIVATIONS)}"
            )
        if self.gnn_num_layers == 0 and (
            self.graph_input_feature_dim != self.gnn_output_dim
        ):
            raise ValueError(
                "gnn_num_layers=0 requires graph_input_feature_dim =="
                " gnn_output_dim"
            )
        from gnnbuilder_tpu.nn.pool import SUPPORTED_GLOBAL_POOLING_AGGRS

        for a in self.pooling_aggrs:
            if a not in SUPPORTED_GLOBAL_POOLING_AGGRS:
                raise ValueError(
                    f"pooling aggregation {a!r} not supported; options: "
                    f"{SUPPORTED_GLOBAL_POOLING_AGGRS}"
                )

    def setup(self):
        conv_cls = SUPPORTED_GNN_CONVS[self.gnn_conv]
        if self.remat:
            # static_argnums counts the lifted __call__'s positional args
            # with the module itself at 0: (module, g, x, act, skip) ->
            # act (a string) must be static
            conv_cls = nn.remat(conv_cls, static_argnums=(3,))
        kw: dict[str, Any] = dict(self.conv_kwargs or {})
        if self.gnn_conv in _EDGE_CONVS:
            kw["edge_dim"] = self.graph_input_edge_dim

        convs = []
        for i, (in_dim, out_dim, p_in, p_out) in enumerate(
            self._layer_dims()
        ):
            convs.append(
                conv_cls(
                    in_channels=in_dim,
                    out_channels=out_dim,
                    p_in=p_in,
                    p_out=p_out,
                    name=f"gnn_convs_{i}",
                    **kw,
                )
            )
        self.gnn_convs = convs
        self.global_pooling = GlobalPooling(
            aggrs=tuple(self.pooling_aggrs), name="global_pooling"
        )
        self.mlp_head = MLP(
            in_dim=self.gnn_output_dim * len(self.pooling_aggrs),
            out_dim=self.mlp_out_dim,
            hidden_dim=self.mlp_hidden_dim,
            hidden_layers=self.mlp_hidden_layers,
            activation=self.mlp_activation,
            p_in=self.mlp_p_in,
            p_hidden=self.mlp_p_hidden,
            p_out=self.mlp_p_out,
            name="mlp_head",
        )

    def _layer_dims(self):
        """(in_dim, out_dim, p_in, p_out) per conv layer — models.py:509-549."""
        dims = []
        L = self.gnn_num_layers
        if L == 1:
            dims.append(
                (
                    self.graph_input_feature_dim,
                    self.gnn_output_dim,
                    self.gnn_p_in,
                    self.gnn_p_out,
                )
            )
        elif L > 1:
            for i in range(L):
                if i == 0:
                    dims.append(
                        (
                            self.graph_input_feature_dim,
                            self.gnn_hidden_dim,
                            self.gnn_p_in,
                            self.gnn_p_hidden,
                        )
                    )
                elif i == L - 1:
                    dims.append(
                        (
                            self.gnn_hidden_dim,
                            self.gnn_output_dim,
                            self.gnn_p_hidden,
                            self.gnn_p_out,
                        )
                    )
                else:
                    dims.append(
                        (
                            self.gnn_hidden_dim,
                            self.gnn_hidden_dim,
                            self.gnn_p_hidden,
                            self.gnn_p_hidden,
                        )
                    )
        return dims

    def __call__(self, g: GraphBatch, x=None):
        """Forward pass; returns [G, mlp_out_dim] per-graph predictions
        (ghost graph row included — mask it with g.graph_mask downstream)."""
        h = g.node_feat if x is None else x
        L = self.gnn_num_layers
        stacked = self._fused_gnn_stack(g, h)
        if stacked is not None:
            h = stacked
        else:
            for i, conv in enumerate(self.gnn_convs):
                # skip-add + activation are delegated to the conv so fused
                # kernels can absorb them into their epilogue; the conv's
                # XLA paths apply the identical math (nn/conv.py _finish)
                skip = (
                    h if self.gnn_skip_connection and 0 < i < L - 1
                    else None
                )
                # positional act/skip so nn.remat's static_argnums can mark
                # the activation string static (kwargs cannot be)
                h = conv(g, h, self.gnn_activation, skip)
        fused = self._fused_readout(g, h)
        if fused is not None:
            return fused
        pooled = self.global_pooling(g, h)
        out = self.mlp_head(pooled)
        if self.output_activation is not None:
            out = OUTPUT_ACTIVATIONS[self.output_activation](out)
        return out

    def _fused_gnn_stack(self, g: GraphBatch, h):
        """Whole-stack Pallas kernel (every conv layer in one kernel, the
        hidden state VMEM-resident — ops/pallas/pna_block.py) when the
        dispatch policy allows: block-packed batch + inference scope.
        Returns None to fall back to the per-layer conv loop (identical
        math — pinned by tests/test_pna_block_stack.py)."""
        if self.is_initializing():
            return None
        if self.gnn_num_layers < 1:
            return None
        if self.gnn_conv in ("gcn", "gin", "sage"):
            return self._fused_mp_stack(g, h)
        if self.gnn_conv != "pna":
            return None
        kw = dict(self.conv_kwargs or {})
        if "aggregators" in kw or "scalers" in kw:
            return None  # non-default PNA configs keep the per-layer path
        from gnnbuilder_tpu.ops import dispatch
        from gnnbuilder_tpu.ops.pallas.pna_block import _ACTS as _STACK_ACTS

        if self.gnn_activation not in _STACK_ACTS:
            return None
        cfg = dispatch.pna_stack_cfg(g, self.gnn_num_layers)
        if cfg is None:
            return None
        from gnnbuilder_tpu.ops.pallas.pna_block import pna_block_stack_auto

        p = self.variables["params"]
        layers = []
        for i in range(self.gnn_num_layers):
            q = p[f"gnn_convs_{i}"]
            layers.append((
                q["pre_nn"]["kernel"], q["pre_nn"]["bias"],
                q["post_nn"]["kernel"], q["post_nn"]["bias"],
                q["lin"]["kernel"], q["lin"]["bias"],
            ))
        L = self.gnn_num_layers
        delta = float(kw.get("delta", 1.0))
        skips = tuple(
            self.gnn_skip_connection and 0 < i < L - 1 for i in range(L)
        )
        return pna_block_stack_auto(
            h, g.nbr_nodes, g.in_degree, layers,
            deltas=(delta,) * L, skips=skips, act=self.gnn_activation,
            out_dim=self.gnn_output_dim, block_adj=g.block_adj, **cfg,
        )

    def _fused_mp_stack(self, g: GraphBatch, h):
        """Whole-stack kernel for the mp conv family (gcn/gin/sage —
        ops/pallas/mp_block.py): every layer in one kernel, hidden state
        VMEM-resident, no per-layer [N, F] HBM round trips.  Same gate
        shape as the PNA stack; returns None for the per-layer loop
        (identical math — pinned by tests/test_mp_block_stack.py)."""
        from gnnbuilder_tpu.ops import dispatch
        from gnnbuilder_tpu.ops.pallas.pna_block import _ACTS as _STACK_ACTS

        conv = self.gnn_conv
        if self.gnn_activation not in _STACK_ACTS:
            return None
        cfg = dispatch.mp_stack_cfg(g, conv, self.gnn_num_layers)
        if cfg is None:
            return None
        from gnnbuilder_tpu.ops.pallas.mp_block import mp_block_stack_auto

        p = self.variables["params"]
        layers, epss = [], []
        for i in range(self.gnn_num_layers):
            q = p[f"gnn_convs_{i}"]
            if conv == "gcn":
                layers.append((q["lin"]["kernel"], q["bias"], None, None))
            elif conv == "gin":
                layers.append((q["lin0"]["kernel"], q["lin0"]["bias"],
                               q["lin1"]["kernel"], q["lin1"]["bias"]))
            else:  # sage
                layers.append((q["lin_l"]["kernel"], q["lin_l"]["bias"],
                               q["lin_r"]["kernel"], None))
            epss.append(float(getattr(self.gnn_convs[i], "eps", 0.0)))
        L = self.gnn_num_layers
        skips = tuple(
            self.gnn_skip_connection and 0 < i < L - 1 for i in range(L)
        )
        return mp_block_stack_auto(
            h, g.block_adj, g.in_degree, conv, layers,
            epss=tuple(epss), skips=skips, act=self.gnn_activation,
            out_dim=self.gnn_output_dim, **cfg,
        )

    def _fused_readout(self, g: GraphBatch, h):
        """Whole-readout Pallas kernel (pooling + MLP + output activation,
        ops/pallas/readout.py) when the dispatch policy allows; exact max
        pooling stays in XLA and streams into the kernel.  Returns None to
        fall back to the XLA tail above (identical math)."""
        if self.is_initializing():
            return None
        from gnnbuilder_tpu.ops import dispatch

        aggrs = tuple(self.pooling_aggrs)
        cfg = dispatch.readout_config(
            g, aggrs=aggrs, act=self.mlp_activation,
            out_act=self.output_activation,
        )
        if cfg is None:
            return None
        from gnnbuilder_tpu.ops import segment
        from gnnbuilder_tpu.ops.pallas.readout import fused_readout_auto

        mx = None
        if "max" in aggrs:
            if g.graph_starts is not None and g.max_graph_nodes_static:
                # contiguous-window max: 219 us -> gather-bound
                # (results_tpu/block_insitu.json, round 4)
                mx = segment.contiguous_segment_max(
                    h, g.graph_starts, g.n_node, g.max_graph_nodes_static
                )
            else:
                count = g.n_node.astype(h.dtype)[:, None]
                mx = segment.segment_max(
                    h, g.node_graph, g.num_graphs, count=count
                )
        p = self.variables["params"]["mlp_head"]
        n_lin = self.mlp_head.num_of_layers
        weights = tuple(
            (p[f"linear_{i}"]["kernel"], p[f"linear_{i}"]["bias"])
            for i in range(n_lin)
        )
        return fused_readout_auto(
            h, g.n_node, weights, aggrs=aggrs, mx=mx,
            act=self.mlp_activation, out_act=self.output_activation,
            maxg=g.max_graph_nodes_static,
            starts=g.graph_starts if cfg.get("block_size") else None,
            quant=cfg.pop("int8", False), **cfg,
        )

    # --- introspection mirroring the reference (models.py:577-634) ---
    @property
    def input_node_features_dim(self):
        return self.graph_input_feature_dim

    @property
    def input_edge_features_dim(self):
        return self.graph_input_edge_dim

    @property
    def output_features_dim(self):
        return self.mlp_out_dim

    @property
    def gnn_layer_sizes(self):
        return [(d[0], d[1]) for d in self._layer_dims()]
