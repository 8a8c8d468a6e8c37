"""Canonical benchmark model + harness pieces.

The reference's benchmark model (build_gnnbuilder_benchmarks.py:59-118):
6 GNN layers, hidden 128, gnn output 64, skip connections, global pooling
add+mean+max, MLP head with 4 hidden layers x 64, output dim 1 (regression).
Benchmarked as conv x dataset over {gcn, gin, pna, sage} x {qm9, esol,
freesolv, lipo, hiv} at batch=1 (BASELINE.md).  This module builds the same
model TPU-side plus the padded batches to run it on.
"""

from __future__ import annotations

import numpy as np

from gnnbuilder_tpu.core.graph import build_graph_batch
from gnnbuilder_tpu.data.datasets import DATASET_SPECS, load_dataset
from gnnbuilder_tpu.nn.model import GNNModel
from gnnbuilder_tpu.utils.stats import compute_pna_delta

__all__ = ["canonical_model", "canonical_batches", "CANONICAL"]

CANONICAL = dict(
    gnn_hidden_dim=128,
    gnn_num_layers=6,
    gnn_output_dim=64,
    gnn_skip_connection=True,
    pooling_aggrs=("add", "mean", "max"),
    mlp_hidden_dim=64,
    mlp_hidden_layers=4,
    mlp_out_dim=1,
)


def canonical_model(
    conv: str, dataset: str, graphs=None, **overrides
) -> GNNModel:
    spec = DATASET_SPECS[dataset]
    kw = dict(CANONICAL)
    kw.update(overrides)
    conv_kwargs = kw.pop("conv_kwargs", {})
    if conv == "pna" and "delta" not in conv_kwargs:
        if graphs is None:
            graphs = load_dataset(dataset, n=200)
        conv_kwargs["delta"] = compute_pna_delta(graphs)
    return GNNModel(
        graph_input_feature_dim=spec.node_dim,
        graph_input_edge_dim=spec.edge_dim,
        gnn_conv=conv,
        conv_kwargs=conv_kwargs,
        **kw,
    )


def canonical_batches(
    dataset: str,
    n_graphs: int = 1000,
    batch_size: int = 1,
    node_multiple: int = 8,
    edge_multiple: int = 8,
    seed: int = 0,
    block_size: int = 0,
    node_dim: int = None,
):
    """Greedily pack the first ``n_graphs`` graphs into uniform-bucket batches
    of ``batch_size`` graphs; all batches share one (max) bucket so a single
    executable serves the whole sweep.  ``block_size`` > 0 selects the
    block-diagonal bin-packed layout (core/graph.py) — the bucket then
    covers the worst-case pack waste across chunks.  ``node_dim`` zero-pads
    node features to the given width (DSE rows for the in==out convs
    LG/Simple run with input == hidden; pad values are timing-inert)."""
    graphs = load_dataset(dataset, n=n_graphs, seed=seed)
    if node_dim is not None:
        import dataclasses as _dc

        graphs = [
            _dc.replace(
                g,
                x=np.pad(
                    g.x[:, :node_dim],
                    ((0, 0), (0, max(node_dim - g.x.shape[1], 0))),
                ),
            )
            for g in graphs
        ]
    chunks = [
        graphs[i : i + batch_size] for i in range(0, len(graphs), batch_size)
    ]
    chunks = [c for c in chunks if len(c) == batch_size]
    # one shared bucket: max nodes/edges over chunks
    max_e = max(sum(g.num_edges for g in c) for c in chunks)

    def rup(x, m):
        return ((x + m - 1) // m) * m

    if block_size:
        import math

        align = math.lcm(block_size, node_multiple)

        def packed_rows(c):
            cur = 0
            for g in c:
                if (cur % block_size) + g.num_nodes > block_size:
                    cur = rup(cur, block_size)
                cur += g.num_nodes
            return rup(cur + 1, align)

        node_budget = max(packed_rows(c) for c in chunks)
    else:
        max_n = max(sum(g.num_nodes for g in c) for c in chunks)
        node_budget = rup(max_n + 1, node_multiple)
    edge_budget = rup(max_e, edge_multiple)
    batches = [
        build_graph_batch(
            c,
            node_budget=node_budget,
            edge_budget=edge_budget,
            graph_budget=batch_size + 1,
            node_multiple=node_multiple,
            edge_multiple=edge_multiple,
            block_size=block_size or None,
        )
        for c in chunks
    ]
    return graphs, batches
