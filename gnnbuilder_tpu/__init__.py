"""gnnbuilder_tpu — a TPU-native GNN message-passing framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
sharc-lab/gnn-builder (FPL 2023): the declarative GNN model family for
graph-level molecular property prediction, compiled to tunable accelerator
kernels with golden-parity verification and a cost-model-driven design-space
exploration — targeting TPU (MXU matmuls, static padded shapes, shard_map
multi-chip scaling) instead of Vitis HLS FPGAs.

Public surface mirrors the reference's ``gnnbuilder/__init__.py:24-46``.
"""

from gnnbuilder_tpu.core.graph import GraphBatch, build_graph_batch
from gnnbuilder_tpu.nn.conv import (
    EdgeConv,
    GATConv,
    GCNConv,
    GINConv,
    GINEConv,
    LGConv,
    PNAConv,
    SAGEConv,
    SimpleConv,
    SUPPORTED_GNN_CONVS,
)
from gnnbuilder_tpu.nn.mlp import MLP
from gnnbuilder_tpu.nn.model import GNNModel
from gnnbuilder_tpu.nn.pool import GlobalPooling, SUPPORTED_GLOBAL_POOLING_AGGRS
from gnnbuilder_tpu.compile.program import Program, enable_persistent_cache
from gnnbuilder_tpu.compile.precision import Precision
from gnnbuilder_tpu.dse import DSEEngine, DSEConfig, CostModel
from gnnbuilder_tpu.utils.stats import (
    compute_average_degree,
    compute_average_nodes_and_edges,
    compute_in_deg_histogram,
    compute_max_nodes_and_edges,
    compute_median_degree,
    compute_median_nodes_and_edges,
)

__version__ = "0.1.0"

__all__ = [
    "GraphBatch",
    "build_graph_batch",
    "GCNConv",
    "GINConv",
    "GINEConv",
    "GATConv",
    "PNAConv",
    "SAGEConv",
    "LGConv",
    "SimpleConv",
    "EdgeConv",
    "SUPPORTED_GNN_CONVS",
    "MLP",
    "GNNModel",
    "GlobalPooling",
    "SUPPORTED_GLOBAL_POOLING_AGGRS",
    "Program",
    "enable_persistent_cache",
    "Precision",
    "DSEEngine",
    "DSEConfig",
    "CostModel",
    "compute_max_nodes_and_edges",
    "compute_average_nodes_and_edges",
    "compute_median_nodes_and_edges",
    "compute_average_degree",
    "compute_median_degree",
    "compute_in_deg_histogram",
]
