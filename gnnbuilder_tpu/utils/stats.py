"""Dataset statistics used to size padding buckets and PNA degree scalers.

Numpy counterparts of the reference's utilities (gnnbuilder/utils.py:9-96):
node/edge max/average/median, average/median in-degree, in-degree histogram
(for PNA's delta), plus ``compute_pna_delta`` — the mean log(in_degree+1)
the reference feeds PNAConv (PyG's avg_deg_log / models.py:227-237).

A "dataset" is any iterable of graphs with ``x [n, F]`` and
``edge_index [2, e]`` numpy arrays (see gnnbuilder_tpu.data).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "compute_max_nodes_and_edges",
    "compute_average_nodes_and_edges",
    "compute_median_nodes_and_edges",
    "compute_average_degree",
    "compute_median_degree",
    "compute_in_deg_histogram",
    "compute_pna_delta",
]


def _num_nodes(g) -> int:
    return int(g.x.shape[0])


def _num_edges(g) -> int:
    return int(g.edge_index.shape[1])


def _in_degrees(g) -> np.ndarray:
    return np.bincount(
        np.asarray(g.edge_index[1], dtype=np.int64), minlength=_num_nodes(g)
    )


def compute_max_nodes_and_edges(dataset):
    max_node = max((_num_nodes(g) for g in dataset), default=0)
    max_edge = max((_num_edges(g) for g in dataset), default=0)
    return max_node, max_edge


def compute_average_nodes_and_edges(dataset, round_val: bool = True):
    nodes = [_num_nodes(g) for g in dataset]
    edges = [_num_edges(g) for g in dataset]
    avg_nodes = float(np.mean(nodes))
    avg_edges = float(np.mean(edges))
    if round_val:
        return int(round(avg_nodes)), int(round(avg_edges))
    return avg_nodes, avg_edges


def compute_median_nodes_and_edges(dataset, round_val: bool = True):
    nodes = [_num_nodes(g) for g in dataset]
    edges = [_num_edges(g) for g in dataset]
    return int(np.median(nodes)), int(np.median(edges))


def compute_average_degree(dataset, round_val: bool = True):
    per_graph = [float(np.mean(_in_degrees(g))) for g in dataset]
    avg = float(np.mean(per_graph))
    if round_val:
        return int(np.ceil(avg))
    return avg


def compute_median_degree(dataset):
    per_graph = [float(np.median(_in_degrees(g))) for g in dataset]
    return int(np.ceil(np.median(per_graph)))


def compute_in_deg_histogram(dataset):
    max_degree = 0
    degs = []
    for g in dataset:
        d = _in_degrees(g)
        degs.append(d)
        if d.size:
            max_degree = max(max_degree, int(d.max()))
    hist = np.zeros(max_degree + 1, dtype=np.int64)
    for d in degs:
        hist += np.bincount(d, minlength=max_degree + 1)
    return hist


def compute_pna_delta(dataset) -> float:
    """Mean log(in_degree + 1) over all nodes — PNA's avg_deg_log scaler
    normalizer (PyG PNAConv.get_degree_histogram semantics)."""
    logs = []
    for g in dataset:
        d = _in_degrees(g).astype(np.float64)
        logs.append(np.log(d + 1.0))
    if not logs:
        return 1.0
    return float(np.mean(np.concatenate(logs)))
