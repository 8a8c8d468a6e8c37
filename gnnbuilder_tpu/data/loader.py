"""Batched data loader with background packing — the framework's IO path.

The reference's "data pipeline" is its testbench serializer: every graph is
dumped to .bin files once and streamed back by C++ loaders
(model_tb.cpp.jinja:100-131).  The TPU-native equivalent is a training/
inference loader that overlaps host-side batch packing (the native C++
counting-sort/ELL packer, core/packing.py) with device execution: a
producer thread packs the next batches into a bounded queue while the
accelerator consumes the current one.

    loader = GraphLoader(graphs, batch_size=256, shuffle=True, seed=0)
    for batch, target in loader.epoch():
        params, opt_state, loss = step(params, opt_state, batch, target)
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Sequence

import numpy as np

from gnnbuilder_tpu.core.graph import build_graph_batch

__all__ = ["GraphLoader"]


class GraphLoader:
    """Iterate padded GraphBatches (+ stacked targets) over a graph list.

    All batches share one padding bucket (max over the dataset at the given
    batch size) so a single compiled executable serves every step —
    the loader-side guarantee behind the Program bucket policy.
    """

    def __init__(
        self,
        graphs: Sequence,
        batch_size: int = 32,
        shuffle: bool = False,
        seed: int = 0,
        target_dim: int = 1,
        node_multiple: int = 8,
        edge_multiple: int = 8,
        drop_last: bool = True,
        prefetch: int = 2,
        block_size: int = 0,
    ):
        self.graphs = list(graphs)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.target_dim = target_dim
        self.node_multiple = node_multiple
        self.edge_multiple = edge_multiple
        self.drop_last = drop_last
        self.prefetch = prefetch
        # block_size > 0 selects the block-diagonal bin-packed layout
        # (core/graph.py) — aggregation as batched MXU matmuls
        self.block_size = int(block_size)

        # one shared bucket across every possible batch composition: worst
        # case = the batch_size largest graphs packed together
        ns = sorted((g.x.shape[0] for g in self.graphs), reverse=True)
        es = sorted((g.edge_index.shape[1] for g in self.graphs), reverse=True)
        k = min(batch_size, len(self.graphs))
        if self.block_size:
            import math

            bsz = self.block_size
            assert ns[0] <= bsz, (ns[0], bsz)
            # worst-case pack: each block holds at least
            # floor(bsz / max_graph) graphs of the largest kind
            per = max(bsz // ns[0], 1) if ns[0] else bsz
            blocks = -(-k // per) + 1
            align = math.lcm(bsz, node_multiple)
            self.node_budget = self._rup(blocks * bsz + 1, align)
        else:
            self.node_budget = self._rup(sum(ns[:k]) + 1, node_multiple)
        self.edge_budget = self._rup(max(sum(es[:k]), 1), edge_multiple)
        self.graph_budget = batch_size + 1
        self._epoch = 0

    @staticmethod
    def _rup(x: int, m: int) -> int:
        return ((x + m - 1) // m) * m

    def __len__(self) -> int:
        n = len(self.graphs) // self.batch_size
        if not self.drop_last and len(self.graphs) % self.batch_size:
            n += 1
        return n

    def _chunks(self) -> list[list]:
        order = np.arange(len(self.graphs))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        chunks = []
        bs = self.batch_size
        for i in range(0, len(order), bs):
            idx = order[i : i + bs]
            if len(idx) < bs and self.drop_last:
                continue
            chunks.append([self.graphs[j] for j in idx])
        return chunks

    def _pack(self, chunk):
        from gnnbuilder_tpu.train import stack_targets

        batch = build_graph_batch(
            chunk,
            node_budget=self.node_budget,
            edge_budget=self.edge_budget,
            graph_budget=self.graph_budget,
            node_multiple=self.node_multiple,
            edge_multiple=self.edge_multiple,
            block_size=self.block_size or None,
        )
        target = stack_targets(chunk, batch.num_graphs, self.target_dim)
        return batch, target

    def epoch(self) -> Iterator:
        """One epoch, background-packed with a bounded prefetch queue."""
        chunks = self._chunks()
        self._epoch += 1
        if self.prefetch <= 0:
            for c in chunks:
                yield self._pack(c)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _END = object()
        err: list[BaseException] = []
        cancel = threading.Event()

        def producer():
            try:
                for c in chunks:
                    item = self._pack(c)
                    # bounded put that notices consumer abandonment: if the
                    # epoch() generator is closed early (break/exception in
                    # the training loop), a blocking q.put would leak this
                    # thread + its packed batches forever
                    while not cancel.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if cancel.is_set():
                        return
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                while True:
                    try:
                        q.put(_END, timeout=0.1)
                        break
                    except queue.Full:
                        if cancel.is_set():
                            break

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                yield item
        finally:
            cancel.set()
            # drain so a producer blocked mid-put can observe cancellation
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)
        if err:
            raise err[0]
