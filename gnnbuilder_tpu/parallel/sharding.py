"""Sharding specs for graph batches and parameters over a ("dp","tp") mesh.

Edge-partitioning layout: node rows, edge rows and graph rows of a
``GraphBatch`` are all sharded along ``dp``.  Message gathers then read
remote node features; XLA GSPMD lowers them to ICI collectives
(all-gather / all-to-all) automatically — correctness first, with the
hand-overlapped Pallas path as the optimization layer on top (ops/pallas).

Parameters shard along ``tp`` on the output-feature dimension wherever it is
divisible; everything else replicates.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnnbuilder_tpu.core.graph import GraphBatch

__all__ = [
    "batch_shardings",
    "param_shardings",
    "shard_batch",
    "shard_batch_global",
    "shard_params",
]


def batch_shardings(mesh: Mesh, batch: GraphBatch) -> GraphBatch:
    """A GraphBatch-shaped pytree of NamedShardings (dp edge partitioning)."""

    def node(_):
        return NamedSharding(mesh, P("dp"))

    rep = NamedSharding(mesh, P())
    return GraphBatch(
        node_feat=NamedSharding(mesh, P("dp", None)),
        senders=NamedSharding(mesh, P("dp")),
        receivers=NamedSharding(mesh, P("dp")),
        edge_feat=(
            NamedSharding(mesh, P("dp", None))
            if batch.edge_feat is not None
            else None
        ),
        node_graph=node(None),
        in_degree=node(None),
        row_offsets=rep,  # [N+1] — replicated (small)
        n_node=rep,
        n_edge=rep,
        node_mask=node(None),
        edge_mask=node(None),
        graph_mask=rep,
        # ELL tables are node-row arrays: shard along dp with the nodes
        nbr_nodes=(
            NamedSharding(mesh, P("dp", None))
            if batch.nbr_nodes is not None
            else None
        ),
        nbr_edges=(
            NamedSharding(mesh, P("dp", None))
            if batch.nbr_edges is not None
            else None
        ),
        rev_nbr_nodes=(
            NamedSharding(mesh, P("dp", None))
            if batch.rev_nbr_nodes is not None
            else None
        ),
        out_degree=(
            node(None) if batch.out_degree is not None else None
        ),
        # block rows follow the node rows (T = N / B blocks, 128-aligned,
        # so dp shard boundaries never split a block)
        block_adj=(
            NamedSharding(mesh, P("dp", None, None))
            if batch.block_adj is not None
            else None
        ),
        graph_starts=rep if batch.graph_starts is not None else None,
        num_graphs_static=batch.num_graphs_static,
        max_graph_nodes_static=batch.max_graph_nodes_static,
        block_size_static=batch.block_size_static,
        multigraph_static=batch.multigraph_static,
    )


def shard_batch(mesh: Mesh, batch: GraphBatch) -> GraphBatch:
    sh = batch_shardings(mesh, batch)

    def put(x, s):
        if x is None or isinstance(x, int):
            return x
        return jax.device_put(x, s)

    return jax.tree.map(
        put, batch, sh, is_leaf=lambda x: x is None
    )


def shard_batch_global(mesh: Mesh, batch: GraphBatch) -> GraphBatch:
    """Multi-host batch placement (docs/distribution.md §3).

    Every process packs the SAME global GraphBatch — the packer is
    deterministic (native/packing.cpp counting sort; numpy fallback
    likewise), so given the same graph list all hosts hold identical
    arrays, including the global-id ELL tables and graph indexing that a
    naive per-host concat could not produce.  Each host then materializes
    only its addressable shard via ``jax.make_array_from_callback`` — no
    cross-host transfer, no full-batch HBM copy per device.

    Single-process this places exactly what ``shard_batch`` places (pinned
    by tests/test_train_parallel.py); under ``jax.distributed`` the same
    call builds the global sharded batch across hosts.
    """
    import numpy as np

    sh = batch_shardings(mesh, batch)

    def put(x, s):
        if x is None or isinstance(x, int):
            return x
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, s, lambda idx, a=arr: a[idx]
        )

    return jax.tree.map(put, batch, sh, is_leaf=lambda x: x is None)


def halo_batch_specs(batch: GraphBatch) -> GraphBatch:
    """GraphBatch-shaped pytree of PartitionSpecs for the explicit halo
    path (shard_map in_specs): node-row arrays shard along dp, everything
    else replicates.  Edge arrays replicate because the halo formulation
    reads neighbors through ELL tables only (parallel/halo.py)."""
    node2 = P("dp", None)
    node1 = P("dp")
    rep = P()
    return GraphBatch(
        node_feat=node2,
        senders=rep,
        receivers=rep,
        edge_feat=rep if batch.edge_feat is not None else None,
        node_graph=node1,
        in_degree=node1,
        row_offsets=rep,
        n_node=rep,
        n_edge=rep,
        node_mask=node1,
        edge_mask=rep,
        graph_mask=rep,
        nbr_nodes=node2 if batch.nbr_nodes is not None else None,
        nbr_edges=node2 if batch.nbr_edges is not None else None,
        rev_nbr_nodes=node2 if batch.rev_nbr_nodes is not None else None,
        out_degree=node1 if batch.out_degree is not None else None,
        block_adj=(
            P("dp", None, None) if batch.block_adj is not None else None
        ),
        graph_starts=rep if batch.graph_starts is not None else None,
        num_graphs_static=batch.num_graphs_static,
        max_graph_nodes_static=batch.max_graph_nodes_static,
        block_size_static=batch.block_size_static,
        multigraph_static=batch.multigraph_static,
    )


def model_p_factors(model) -> dict:
    """Per-layer parallelism factors from a GNNModel spec, keyed by the
    flax param-path prefix.  This is what makes the reference's
    p_in/p_hidden/p_out knobs (models.py:32,77,394-396) LOAD-BEARING on
    TPU: a layer with p > 1 shards its kernels' output features over the
    ``tp`` mesh axis (parallel hardware devoted to that layer); p == 1
    replicates.  The DSE can tune them like the reference tunes unroll
    factors."""
    out = {}
    for i, (_, _, _, p_out) in enumerate(model._layer_dims()):
        out[f"gnn_convs_{i}"] = int(p_out)
    # MLP: hidden layers take p_hidden, the final one p_out
    n_lin = model.mlp_hidden_layers + 1
    for i in range(n_lin):
        p = model.mlp_p_out if i == n_lin - 1 else model.mlp_p_hidden
        out[f"mlp_head/linear_{i}"] = int(p)
    return out


def param_shardings(mesh: Mesh, params, p_factors: dict | None = None):
    """PartitionSpec tree: 2-D kernels shard output features over tp.

    Without ``p_factors``, every divisible kernel shards (GSPMD-friendly
    default).  With ``p_factors`` (model_p_factors), only layers whose
    factor is > 1 shard — the explicit per-layer parallelism contract.
    """
    tp = mesh.shape["tp"]

    def path_str(path):
        return "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )

    def spec(path, p):
        if not (hasattr(p, "ndim") and p.ndim == 2 and tp > 1
                and p.shape[1] % tp == 0):
            return NamedSharding(mesh, P())
        if p_factors is not None:
            ps = "/" + path_str(path) + "/"
            factor = next(
                (v for k, v in p_factors.items() if f"/{k}/" in ps), 1
            )
            if factor <= 1:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(None, "tp"))

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(mesh: Mesh, params, p_factors: dict | None = None):
    return jax.tree.map(
        lambda p, s: jax.device_put(p, s),
        params,
        param_shardings(mesh, params, p_factors),
    )
