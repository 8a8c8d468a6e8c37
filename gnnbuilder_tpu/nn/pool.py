"""Graph-level readout: multi-aggregation global pooling.

TPU-native counterpart of the reference's GlobalPooling (models.py:317-359,
PyG MultiAggregation concat mode) and its HLS kernels global_{add,mean,max}_
pool (gnn_builder_lib.h:2705-2803).  Pad nodes all live in the ghost graph
(core/graph.py), so per-graph segment reductions need no masks on the hot
path; the ghost row of the output is garbage and is masked by losses/metrics.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from gnnbuilder_tpu.core.graph import GraphBatch
from gnnbuilder_tpu.ops import segment

SUPPORTED_GLOBAL_POOLING_AGGRS = ("add", "max", "mean")

__all__ = ["GlobalPooling", "SUPPORTED_GLOBAL_POOLING_AGGRS"]


class GlobalPooling(nn.Module):
    """Concatenated multi-aggregation over each graph's nodes.

    ``aggrs`` is an ordered subset of {"add", "max", "mean"}; output is
    [G, len(aggrs) * F] with aggregations concatenated in the given order —
    exactly the reference's MultiAggregation cat mode (models.py:351-352).
    """

    aggrs: Sequence[str] = ("add",)
    mode: str = "cat"

    def __post_init__(self):
        super().__post_init__()
        if not self.aggrs:
            raise ValueError("Aggregation list is empty.")
        for a in self.aggrs:
            if a not in SUPPORTED_GLOBAL_POOLING_AGGRS:
                raise NotImplementedError(
                    f"Aggregation {a} is not supported. Supported: "
                    f"{SUPPORTED_GLOBAL_POOLING_AGGRS}."
                )
        if self.mode != "cat":
            raise NotImplementedError("only cat mode is supported")

    @property
    def num_of_aggrs(self) -> int:
        return len(self.aggrs)

    def __call__(self, g: GraphBatch, x):
        import jax

        from gnnbuilder_tpu.parallel.halo import active_halo

        n_graphs = g.num_graphs
        seg = g.node_graph
        count = g.n_node.astype(x.dtype)[:, None]
        halo = active_halo()
        outs = []
        s = None
        if "add" in self.aggrs or "mean" in self.aggrs:
            s = segment.segment_sum(x, seg, n_graphs)
            if halo is not None:
                # inside shard_map each shard reduced its own node rows;
                # per-graph partials combine across the axis
                s = jax.lax.psum(s, halo[0])
        for a in self.aggrs:
            if a == "add":
                outs.append(s)
            elif a == "mean":
                outs.append(s / jnp.maximum(count, 1.0))
            elif a == "max":
                if halo is not None:
                    m = jax.ops.segment_max(x, seg, num_segments=n_graphs)
                    m = jnp.where(jnp.isfinite(m), m, -3e38)
                    # pmax has no differentiation rule; all_gather + max is
                    # the same reduction ([G, F] partials are tiny) and its
                    # backward routes cotangents to the achieving shard
                    m = jnp.max(jax.lax.all_gather(m, halo[0]), axis=0)
                    outs.append(jnp.where(count > 0, m, 0.0))
                elif (g.graph_starts is not None
                      and g.max_graph_nodes_static
                      and g.num_graphs * g.max_graph_nodes_static
                      <= 4 * g.num_nodes):
                    # graphs are contiguous row ranges under both packings:
                    # gather-window max instead of XLA's scatter-max
                    # (219 us -> gather-bound, block_insitu.json round 4).
                    # The [G, maxg, F] window (and its scatter-add backward)
                    # only pays off while it stays comparable to the node
                    # array — a skewed batch where one big graph inflates
                    # maxg for everyone (G*maxg >> N) falls back to the
                    # scatter-max below instead of blowing up memory.
                    outs.append(segment.contiguous_segment_max(
                        x, g.graph_starts, g.n_node,
                        g.max_graph_nodes_static,
                    ))
                else:
                    outs.append(
                        segment.segment_max(x, seg, n_graphs, count=count)
                    )
        return jnp.concatenate(outs, axis=-1)
