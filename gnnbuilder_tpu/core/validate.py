"""GraphBatch invariant checker — the framework's sanitizer.

The reference guards its hand-built CSR scatter with numpy-vs-networkx
cross-checks in its fixture generator (gen_test_data.py:129-173); this is
the runtime equivalent: verify every structural invariant the kernels rely
on (sorted edges, CSR consistency, ELL table consistency, ghost-padding
discipline, graph contiguity — the property the Pallas window trick needs).
Used in tests and as a debugging tool for custom data pipelines:

    from gnnbuilder_tpu.core.validate import validate_batch
    validate_batch(batch)   # raises AssertionError with a precise message
"""

from __future__ import annotations

import numpy as np

__all__ = ["validate_batch"]


def validate_batch(b, strict_ell: bool = True) -> None:
    """Raise AssertionError on the first violated invariant."""
    N, E, G = b.num_nodes, b.num_edges, b.num_graphs
    snd = np.asarray(b.senders)
    rcv = np.asarray(b.receivers)
    deg = np.asarray(b.in_degree)
    ro = np.asarray(b.row_offsets)
    ng = np.asarray(b.node_graph)
    nmask = np.asarray(b.node_mask)
    emask = np.asarray(b.edge_mask)
    gmask = np.asarray(b.graph_mask)
    n_node = np.asarray(b.n_node)
    ghost = N - 1

    # shapes
    assert snd.shape == rcv.shape == (E,), "edge array shapes"
    assert ro.shape == (N + 1,), "row_offsets shape"
    assert deg.shape == ng.shape == nmask.shape == (N,), "node array shapes"

    blk = getattr(b, "block_size_static", 0)

    # masks: prefixes under standard packing (real data first); under
    # block packing node padding interleaves, so only edge/graph masks
    # stay prefixes
    prefix_masks = [("edge", emask), ("graph", gmask)]
    if not blk:
        prefix_masks.append(("node", nmask))
    for name, m in prefix_masks:
        k = int(m.sum())
        assert m[:k].all() and not m[k:].any(), f"{name}_mask not a prefix"
    n_real = int(nmask.sum())
    e_real = int(emask.sum())
    g_real = int(gmask.sum())
    real_rows = np.flatnonzero(nmask)

    # edges sorted by receiver; pad edges are ghost self-loops
    assert (np.diff(rcv) >= 0).all(), "receivers not sorted"
    assert (snd[e_real:] == ghost).all() and (rcv[e_real:] == ghost).all(), \
        "pad edges must be ghost->ghost"
    assert nmask[snd[:e_real]].all() and nmask[rcv[:e_real]].all(), \
        "real edges reference pad nodes"

    # in-degree counts real edges only and row offsets are its prefix sums
    # (ghost row additionally absorbs the pad-edge tail)
    counts = np.zeros(N, np.int64)
    np.add.at(counts, rcv[:e_real], 1)
    assert (deg == counts).all(), "in_degree mismatch"
    csr_counts = counts.copy()
    csr_counts[ghost] += E - e_real
    assert (ro[1:] == np.cumsum(csr_counts)).all(), "row_offsets mismatch"
    # CSR rows point at their own receivers
    probe_rows = (
        (0, n_real // 2, max(n_real - 1, 0))
        if not blk
        else tuple(real_rows[[0, len(real_rows) // 2, -1]])
        if len(real_rows)
        else ()
    )
    for v in probe_rows:
        seg = rcv[ro[v] : ro[v + 1]]
        assert (seg == v).all(), f"CSR row {v} inconsistent"

    # graph contiguity + per-graph node counts (the window-locality basis:
    # each graph occupies consecutive rows — block packing only moves the
    # padding between graphs, never inside one)
    ng_real = ng[real_rows]
    assert (np.diff(ng_real) >= 0).all(), "graphs not contiguous"
    for gi in range(g_real):
        assert (ng_real == gi).sum() == n_node[gi], f"n_node[{gi}]"
    assert (ng[~nmask] == G - 1).all(), "pad nodes not in ghost graph"
    # edges never cross graphs
    assert (ng[snd[:e_real]] == ng[rcv[:e_real]]).all(), "cross-graph edge"

    # block-diagonal layout invariants
    if blk:
        assert N % blk == 0, "padded nodes not a block multiple"
        gs = np.asarray(b.graph_starts)
        for gi in range(g_real):
            s, n = int(gs[gi]), int(n_node[gi])
            assert (ng[s : s + n] == gi).all(), f"graph_starts[{gi}]"
            assert s // blk == (s + n - 1) // blk, \
                f"graph {gi} crosses a block boundary"
        if b.block_adj is not None:
            A = np.asarray(b.block_adj, dtype=np.float64)
            T = N // blk
            assert A.shape == (T, blk, blk), "block_adj shape"
            ref = np.zeros((T, blk, blk))
            tb, li = np.divmod(rcv[:e_real].astype(np.int64), blk)
            lj = snd[:e_real].astype(np.int64) % blk
            assert (snd[:e_real] // blk == tb).all(), "cross-block edge"
            np.add.at(ref, (tb, li, lj), 1.0)
            assert (A == ref).all(), "block_adj counts mismatch"
            assert (A.sum(2).reshape(-1) == deg).all(), \
                "block_adj row sums != in_degree"

    # ELL tables agree with CSR
    if b.nbr_nodes is not None and strict_ell:
        nbr = np.asarray(b.nbr_nodes)
        nbe = np.asarray(b.nbr_edges)
        W = nbr.shape[1]
        assert (deg[:n_real] <= W).all(), "ELL width < max in-degree"
        slot = np.arange(W)[None, :]
        valid = slot < deg[:, None]
        # valid slots reproduce the sorted senders; pad slots hold ghosts
        rows = np.arange(N)[:, None]
        expect_e = ro[:-1][:, None] + slot
        ok = ~valid | (nbe == np.minimum(expect_e, E - 1))
        assert ok.all(), "nbr_edges disagree with CSR"
        ok2 = ~valid | (nbr == snd[np.minimum(expect_e, E - 1)])
        assert ok2.all(), "nbr_nodes disagree with sorted senders"
        assert (nbr[~valid & (rows != ghost)] == ghost).all(), \
            "ELL pad slots must hold the ghost id"
