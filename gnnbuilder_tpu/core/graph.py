"""Core padded-graph data structures — the TPU-native graph substrate.

The reference framework sizes every on-chip buffer with compile-time
``MAX_NODES`` / ``MAX_EDGES`` bounds and builds CSR neighbor tables on the
accelerator each call (reference: gnnbuilder/code_gen.py:72-73,
gnn_builder_lib.h:1047-1207).  The TPU-native equivalent is a *statically
shaped, padded, edge-sorted* batch representation:

* All arrays have static (bucketed) shapes so XLA compiles one program per
  bucket instead of one per graph.
* Edges are sorted by receiver on the host at batch-construction time, so
  on-device aggregations can use ``segment_sum(..., indices_are_sorted=True)``
  and Pallas kernels can walk contiguous CSR row blocks.
* Padding uses the "ghost graph" trick: one trailing graph absorbs all pad
  nodes, and pad edges connect ghost node -> ghost node, so segment reductions
  stay mask-free on the hot path; masks exist for pooling / losses.
* Degree tables (the analog of ``compute_degree_tables``,
  gnn_builder_lib.h:1051-1083) and CSR row offsets (the analog of
  ``compute_neighbor_tables``, gnn_builder_lib.h:1086-1124) are computed once
  on the host (optionally by the native C++ packer) and shipped with the batch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["GraphBatch", "build_graph_batch", "pad_sizes",
           "resolve_block_size"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """A statically-shaped batch of graphs packed into flat node/edge arrays.

    Shapes (all static within one padding bucket):
      N = padded node count, E = padded edge count, G = padded graph count
      (the last graph is the ghost graph holding all padding).

    Edge direction follows the PyG convention: ``senders[e] -> receivers[e]``,
    messages flow sender (source, "j") to receiver (target, "i"), and
    aggregation happens at the receiver.  ``senders``/``receivers`` are sorted
    by receiver (ties broken by original edge order), so per-receiver segments
    are contiguous.
    """

    # --- data ---
    node_feat: jax.Array            # [N, F] float
    senders: jax.Array              # [E] int32, sorted by receivers
    receivers: jax.Array            # [E] int32, non-decreasing
    edge_feat: Optional[jax.Array]  # [E, Fe] float or None
    node_graph: jax.Array           # [N] int32 graph id per node (pad -> G-1)
    # --- host-precomputed tables ---
    in_degree: jax.Array            # [N] int32 count of real incoming edges
    row_offsets: jax.Array          # [N+1] int32 CSR offsets into senders
    n_node: jax.Array               # [G] int32 real node count per graph
    n_edge: jax.Array               # [G] int32 real edge count per graph
    node_mask: jax.Array            # [N] bool, True for real nodes
    edge_mask: jax.Array            # [E] bool, True for real edges
    graph_mask: jax.Array           # [G] bool, True for real graphs
    # --- optional ELL (padded neighbor table) layout for scatter-free
    # aggregation: nbr slot d of node v holds its d-th incoming neighbor /
    # edge (pad slots -> ghost ids; valid iff d < in_degree[v]).  The analog
    # of the reference's gather_node_neighbors tables
    # (gnn_builder_lib.h:1168-1207), built host-side by the packer.
    nbr_nodes: Optional[jax.Array] = None   # [N, W] int32
    nbr_edges: Optional[jax.Array] = None   # [N, W] int32
    # reverse (out-neighbor) table + out-degree: slot d of node j holds the
    # RECEIVER of j's d-th outgoing edge.  Consumed by the hand-written
    # Pallas backward kernels (ops/pallas/ell_bwd.py): the transpose of an
    # in-neighbor aggregation is an out-neighbor aggregation, so with this
    # table the backward is the same scatter-free windowed gather as the
    # forward.  Built by core/packing.build_reverse_ell.
    rev_nbr_nodes: Optional[jax.Array] = None  # [N, Wr] int32
    out_degree: Optional[jax.Array] = None     # [N] int32
    # --- optional block-diagonal dense layout (build_graph_batch
    # block_size=B): graphs are bin-packed so no graph crosses a B-row
    # boundary, making the batch adjacency a block-diagonal dense tensor
    # A[t, i, j] = #edges (t*B+j) -> (t*B+i).  The aggregation SpMM then
    # becomes one MXU-native batched matmul (ops/block.py) with no gather,
    # no window DMA, and XLA-native autodiff (the transpose is the same
    # matmul on A^T).  Counts are small integers, exact in bf16.
    block_adj: Optional[jax.Array] = None      # [T, B, B] bf16 edge counts
    # row of each graph's first node.  Standard packing: exclusive cumsum
    # of n_node (ghost entry = first pad row).  Block packing: the
    # bin-packed starts (ghost entry = N-1; its pad rows are scattered).
    graph_starts: Optional[jax.Array] = None   # [G] int32

    # static metadata (not traced)
    num_graphs_static: int = dataclasses.field(
        metadata=dict(static=True), default=0
    )
    # largest real graph in the batch (nodes) — bounds the Pallas window
    # slack (ops/pallas/ell_agg.py); 0 = unknown, disables the fused path
    max_graph_nodes_static: int = dataclasses.field(
        metadata=dict(static=True), default=0
    )
    # block-diagonal packing block size B (0 = standard contiguous packing).
    # When nonzero: N % B == 0, no graph crosses a B-row boundary, and
    # block_adj holds the [N/B, B, B] dense block adjacency.
    block_size_static: int = dataclasses.field(
        metadata=dict(static=True), default=0
    )
    # True when some (sender, receiver) pair repeats (parallel edges).
    # Kernels whose dense per-pair formulations are exact only for simple
    # graphs (the block GAT edge-logit table) gate on it; molecular
    # datasets are simple graphs, so it is almost always False.
    multigraph_static: bool = dataclasses.field(
        metadata=dict(static=True), default=False
    )

    @property
    def num_nodes(self) -> int:
        return self.node_feat.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.n_node.shape[0]

    @property
    def feature_dim(self) -> int:
        return self.node_feat.shape[1]

    @property
    def ell_width(self) -> Optional[int]:
        return None if self.nbr_nodes is None else self.nbr_nodes.shape[1]

    def replace(self, **kw) -> "GraphBatch":
        return dataclasses.replace(self, **kw)

    def with_node_feat(self, x: jax.Array) -> "GraphBatch":
        return self.replace(node_feat=x)


# register GraphBatch for jax.export serialization (Program.export): the
# pytree auxdata is the tuple of static metadata fields
try:
    import json as _json

    from jax import export as _jexport

    _jexport.register_pytree_node_serialization(
        GraphBatch,
        serialized_name="gnnbuilder_tpu.core.graph.GraphBatch",
        serialize_auxdata=lambda aux: _json.dumps(list(aux)).encode(),
        deserialize_auxdata=lambda b: tuple(_json.loads(b.decode())),
    )
except (ImportError, AttributeError, ValueError):  # older jax / re-import
    pass


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_sizes(
    num_nodes: int,
    num_edges: int,
    num_graphs: int,
    node_multiple: int = 8,
    edge_multiple: int = 8,
) -> tuple[int, int, int]:
    """Bucketed padded sizes: +1 ghost node/graph, rounded up to multiples.

    Rounding to (sublane-friendly) multiples keeps the number of distinct
    compiled programs small — the TPU analog of the reference's single
    compile-time MAX_NODES/MAX_EDGES bound, but adaptive.
    """
    n_pad = _round_up(num_nodes + 1, node_multiple)
    e_pad = _round_up(max(num_edges, 1), edge_multiple)
    g_pad = num_graphs + 1
    return n_pad, e_pad, g_pad


# in-degree above which the ELL layout stops paying off (gather+reduce work
# scales with N*ell_width; power-law graphs should use the flat segment path)
ELL_MAX_WIDTH = 64

# --- block-packing auto policy -------------------------------------------
# Crossover (total REAL nodes in the batch) above which block-diagonal
# packing wins over standard contiguous packing.  Round-5 measurements
# moved this DOWN from the first 8192 guess: the round-4 driver's
# b256-block "regression" was per-call relay overhead, not kernel time
# (results_tpu/block_insitu_b256.json: 285 us DEVICE time for the b256
# block model), and bench_r5's within-run arms had block WINNING at b256
# (0.51 vs 0.80 ms/call medians).  Block packing needs only a handful of
# 128-row blocks to amortize; below ~1024 nodes the padded block grid is
# mostly waste and standard packing keeps tighter shapes.
# Env-overridable for re-measurement on new hardware.
_BLOCK_AUTO_MIN_NODES = int(
    __import__("os").environ.get("GNNB_BLOCK_AUTO_MIN_NODES", "1024")
)
_BLOCK_AUTO_SIZE = 128


def resolve_block_size(block_size, n_node_list) -> Optional[int]:
    """Resolve a ``block_size`` argument that may be the string "auto".

    "auto" picks block-diagonal packing (B=128) when the batch is large
    enough to amortize the block kernels' per-step overhead AND every
    graph fits in one block; otherwise standard packing.  Numeric values
    and None pass through unchanged."""
    if block_size != "auto":
        return block_size
    if not n_node_list:
        return None
    if max(n_node_list) > _BLOCK_AUTO_SIZE:
        return None
    if sum(n_node_list) < _BLOCK_AUTO_MIN_NODES:
        return None
    return _BLOCK_AUTO_SIZE

# process-wide default for build_graph_batch(ell_width=None) — the DSE
# autotuner's handle on the batch layout (ops/dispatch.set_kernel_overrides)
_DEFAULT_ELL_WIDTH: Optional[int] = None


def set_default_ell_width(w: Optional[int]) -> None:
    """Set the packing-time ELL width used when build_graph_batch is called
    with ell_width=None.  ``None`` restores the automatic policy; ``0``
    disables ELL tables (flat segment path); an int fixes the bucket width.
    Only affects batches packed after the call."""
    global _DEFAULT_ELL_WIDTH
    _DEFAULT_ELL_WIDTH = w


def build_graph_batch(
    graphs,
    node_budget: Optional[int] = None,
    edge_budget: Optional[int] = None,
    graph_budget: Optional[int] = None,
    node_multiple: int = 8,
    edge_multiple: int = 8,
    ell_width: Optional[int] = None,
    rev_ell_width: Optional[int] = None,
    dtype=np.float32,
    block_size: Optional[int] = None,
) -> GraphBatch:
    """Pack a list of host graphs into one padded ``GraphBatch``.

    ``graphs`` is a sequence of objects with ``x [n,F]``, ``edge_index [2,e]``
    (numpy) and optionally ``edge_attr [e,Fe]``.  Runs entirely on the host in
    numpy (or via the native C++ packer when available, see
    gnnbuilder_tpu/native).  Mirrors the semantics of the reference's
    testbench data packing (code_gen.py:227-305) + on-chip table build
    (gnn_builder_lib.h:1051-1166), done once ahead of time instead of per call.

    ``block_size=B`` selects the block-diagonal dense layout: graphs are
    bin-packed (order-preserving, greedy) so no graph crosses a B-row
    boundary, pad rows appear BETWEEN graphs, and ``block_adj`` carries the
    [N/B, B, B] dense block adjacency for the matmul aggregation path
    (ops/block.py).  Requires every graph to have <= B nodes; B should be
    a multiple of 128 (the MXU tile).  Node-count overhead is the pack
    waste (~mean_graph_nodes/2 rows per block; ~8% on QM9 at B=128).
    ``block_size="auto"`` applies the measured crossover policy
    (``resolve_block_size``): block packing for large batches, standard
    for small ones — the analog of the reference's per-dataset MAX_NODES
    sizing choices (code_gen.py:72-98).
    """
    from gnnbuilder_tpu.core import packing

    if block_size == "auto":
        block_size = resolve_block_size(
            "auto", [int(g.x.shape[0]) for g in graphs]
        )

    xs, eidx, eattr = [], [], []
    has_edge_feat = graphs[0].edge_attr is not None if graphs else False
    n_node, n_edge = [], []
    for g in graphs:
        xs.append(np.asarray(g.x, dtype=dtype))
        eidx.append(np.asarray(g.edge_index, dtype=np.int64))
        if has_edge_feat:
            eattr.append(np.asarray(g.edge_attr, dtype=dtype))
        n_node.append(int(g.x.shape[0]))
        n_edge.append(int(g.edge_index.shape[1]))

    num_nodes = int(sum(n_node))
    num_edges = int(sum(n_edge))
    num_graphs = len(graphs)

    n_pad, e_pad, g_pad = pad_sizes(
        num_nodes, num_edges, num_graphs, node_multiple, edge_multiple
    )

    # graph row starts: contiguous cumsum, or greedy block bin-pack
    if block_size:
        big = [n for n in n_node if n > block_size]
        assert not big, (
            f"block_size={block_size} < largest graph ({max(big)} nodes); "
            "use a larger block or standard packing"
        )
        starts, cur = [], 0
        for n in n_node:
            if (cur % block_size) + n > block_size:
                cur = _round_up(cur, block_size)
            starts.append(cur)
            cur += n
        starts = np.asarray(starts, dtype=np.int64)
        # +1 keeps the ghost row (n_pad - 1) a pad row even when the last
        # block packed full; lcm honors both alignment contracts
        import math

        n_pad = _round_up(cur + 1, math.lcm(block_size, node_multiple))
    else:
        starts = np.zeros((num_graphs,), dtype=np.int64)
        np.cumsum(np.asarray(n_node[:-1], dtype=np.int64), out=starts[1:])

    if node_budget is not None:
        assert node_budget >= n_pad, (node_budget, n_pad)
        if block_size:
            assert node_budget % block_size == 0, (node_budget, block_size)
        n_pad = node_budget
    if edge_budget is not None:
        assert edge_budget >= e_pad, (edge_budget, e_pad)
        e_pad = edge_budget
    if graph_budget is not None:
        assert graph_budget >= g_pad, (graph_budget, g_pad)
        g_pad = graph_budget

    # row index of every real node, graph-major (non-contiguous iff blocked)
    n_node_a = np.asarray(n_node, dtype=np.int64)
    row_index = (
        np.repeat(starts, n_node_a)
        + (
            np.arange(num_nodes, dtype=np.int64)
            - np.repeat(np.cumsum(n_node_a) - n_node_a, n_node_a)
        )
        if num_nodes
        else np.zeros((0,), dtype=np.int64)
    )

    feat_dim = xs[0].shape[1]
    x = np.zeros((n_pad, feat_dim), dtype=dtype)
    if num_nodes:
        x[row_index] = np.concatenate(xs, axis=0)

    edge_index = (
        np.concatenate(eidx, axis=1)
        if num_edges
        else np.zeros((2, 0), dtype=np.int64)
    )
    if block_size:
        # explicit bin-packed offsets (the native fast path assumes the
        # contiguous cumsum layout; molecular edge counts are small enough
        # that the vectorized numpy offset path is not hot)
        per_edge_off = np.repeat(starts, np.asarray(n_edge, dtype=np.int64))
        senders_raw = edge_index[0].astype(np.int64) + per_edge_off
        receivers_raw = edge_index[1].astype(np.int64) + per_edge_off
        node_graph = np.repeat(
            np.arange(num_graphs, dtype=np.int32), n_node_a
        )
    else:
        senders_raw, receivers_raw, node_graph = packing.concat_graphs(
            np.asarray(n_edge, dtype=np.int64),
            n_node_a,
            edge_index,
            num_nodes,
        )

    ghost = n_pad - 1  # pad nodes region holds the ghost node at the end

    # edge-endpoint validity bound: real rows are a prefix under standard
    # packing but interleave with pad rows under block packing (never the
    # ghost row, which stays reserved for pad edges)
    id_bound = (n_pad - 1) if block_size else num_nodes
    senders, receivers, perm, row_offsets, in_degree = packing.sort_and_csr(
        senders_raw, receivers_raw, id_bound, n_pad, e_pad, ghost
    )

    # ELL neighbor tables (scatter-free aggregation layout).  Width policy:
    # None -> auto (batch max in-degree rounded to a multiple of 4, skipped
    # for high-degree batches); 0 -> disabled; int -> fixed bucket width.
    max_deg = int(in_degree.max()) if num_edges else 0
    if ell_width is None:
        ell_width = _DEFAULT_ELL_WIDTH
    if ell_width is None:
        w = max(_round_up(max_deg, 4), 4)
        ell_width = w if w <= ELL_MAX_WIDTH else 0
    nbr_nodes = nbr_edges = rev_nbr = out_deg = None
    if ell_width:
        assert ell_width >= max_deg, (
            f"ell_width={ell_width} < batch max in-degree {max_deg}"
        )
        nbr_nodes, nbr_edges = packing.build_ell(
            senders, row_offsets, e_pad, ell_width, ghost
        )
        # reverse table for the Pallas backward kernels; width sized to the
        # batch max OUT-degree (independent of the forward width) unless a
        # fixed bucket width is requested (0 disables)
        max_out = (
            int(np.bincount(senders_raw, minlength=1).max()) if num_edges else 0
        )
        if rev_ell_width is None:
            rev_w = max(_round_up(max_out, 4), 4)
            if rev_w > ELL_MAX_WIDTH:
                rev_w = 0
        else:
            rev_w = rev_ell_width
            assert rev_w == 0 or rev_w >= max_out, (
                f"rev_ell_width={rev_w} < batch max out-degree {max_out}"
            )
        if rev_w:
            rev_nbr, out_deg = packing.build_reverse_ell(
                senders_raw, receivers_raw, id_bound, n_pad, e_pad, ghost,
                rev_w,
            )

    edge_feat = None
    if has_edge_feat:
        fe = eattr[0].shape[1]
        ef = np.zeros((e_pad, fe), dtype=dtype)
        if num_edges:
            ef[:num_edges] = np.concatenate(eattr, axis=0)[perm]
        edge_feat = ef

    ng = np.full((n_pad,), g_pad - 1, dtype=np.int32)  # pad -> ghost graph
    ng[row_index] = node_graph

    nn_ = np.zeros((g_pad,), dtype=np.int32)
    ne_ = np.zeros((g_pad,), dtype=np.int32)
    nn_[:num_graphs] = np.array(n_node, dtype=np.int32)
    ne_[:num_graphs] = np.array(n_edge, dtype=np.int32)
    nn_[g_pad - 1] = n_pad - num_nodes
    ne_[g_pad - 1] = e_pad - num_edges

    node_mask = np.zeros((n_pad,), dtype=bool)
    node_mask[row_index] = True
    edge_mask = np.zeros((e_pad,), dtype=bool)
    edge_mask[:num_edges] = True
    graph_mask = np.zeros((g_pad,), dtype=bool)
    graph_mask[:num_graphs] = True

    # dense block adjacency (bf16-exact small-integer counts); row sums
    # reproduce in_degree by construction
    block_adj = None
    if block_size:
        T = n_pad // block_size
        A = np.zeros((T, block_size, block_size), dtype=np.float32)
        if num_edges:
            tb, li = np.divmod(receivers_raw, block_size)
            lj = senders_raw % block_size
            assert (senders_raw // block_size == tb).all(), "cross-block edge"
            np.add.at(A, (tb, li, lj), 1.0)
        block_adj = A

    graph_starts = np.zeros((g_pad,), dtype=np.int32)
    graph_starts[:num_graphs] = starts.astype(np.int32)
    # ghost entry: first pad row under standard packing (its rows are the
    # contiguous tail); the reserved ghost row under block packing (its pad
    # rows are scattered between graphs)
    graph_starts[num_graphs:] = (n_pad - 1) if block_size else num_nodes

    return GraphBatch(
        node_feat=jnp.asarray(x),
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        edge_feat=jnp.asarray(edge_feat) if edge_feat is not None else None,
        node_graph=jnp.asarray(ng),
        in_degree=jnp.asarray(in_degree),
        row_offsets=jnp.asarray(row_offsets),
        n_node=jnp.asarray(nn_),
        n_edge=jnp.asarray(ne_),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        graph_mask=jnp.asarray(graph_mask),
        nbr_nodes=jnp.asarray(nbr_nodes) if nbr_nodes is not None else None,
        nbr_edges=jnp.asarray(nbr_edges) if nbr_edges is not None else None,
        rev_nbr_nodes=jnp.asarray(rev_nbr) if rev_nbr is not None else None,
        out_degree=jnp.asarray(out_deg) if out_deg is not None else None,
        block_adj=(
            jnp.asarray(block_adj, jnp.bfloat16)
            if block_adj is not None
            else None
        ),
        graph_starts=jnp.asarray(graph_starts),
        num_graphs_static=g_pad,
        # bucketed (multiple of 8): this is STATIC metadata — distinct
        # values mean distinct jit cache entries, so exact per-batch maxima
        # would recompile per batch; the Pallas window slack rounds up to 8
        # anyway, so bucketing loses nothing
        max_graph_nodes_static=(
            _round_up(int(max(n_node)), 8) if n_node else 0
        ),
        block_size_static=int(block_size or 0),
        multigraph_static=bool(
            num_edges
            and np.unique(
                senders_raw.astype(np.int64) * n_pad + receivers_raw
            ).size < num_edges
        ),
    )
