"""Serving frontend — micro-batching inference over exported artifacts.

The reference's deployable product is a compiled accelerator binary plus
host plumbing that feeds it one graph per call (`.xclbin` + `m_axi`
transfers, code_gen.py:457-489, model_tb.cpp.jinja:167-204).  The
TPU-native deployable is a serialized StableHLO program
(``Program.export``) — this module is the runtime that turns it into a
service:

* ``GNNServer`` owns the executable + resident parameters and a request
  queue.  A background worker packs waiting requests into the artifact's
  padding bucket (micro-batching: up to ``max_batch`` graphs or
  ``max_wait_ms``, whichever first) and runs them as ONE device call —
  the batching the reference's batch=1 hardware could not do, and the
  main reason a TPU serves orders of magnitude more graphs/s.
* Requests return futures; per-request wall latency is recorded and
  summarized as p50/p99 (``stats()``).
* Works from a live ``Program`` or from a serialized artifact file (the
  artifact path needs no model definition — bucket geometry is recovered
  from the program's input specs).

See demos/serve_demo.py for the end-to-end flow and
tests/test_serving.py for the parity + latency-accounting tests.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Sequence

import numpy as np

__all__ = ["GNNServer", "load_artifact"]


def load_artifact(path: str):
    """Deserialize an exported program; returns (call, params_avals,
    batch_avals) where the avals describe the exact (padded) input shapes
    the artifact was compiled for."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    args, kwargs = exp.in_tree.unflatten(list(exp.in_avals))
    params_avals, batch_avals = args
    return exp.call, params_avals, batch_avals


class _Pending:
    __slots__ = ("graph", "future", "t_submit")

    def __init__(self, graph):
        self.graph = graph
        self.future: Future = Future()
        self.t_submit = time.perf_counter()


class GNNServer:
    """Micro-batching server over a compiled GNN forward.

    Construct from a live program::

        server = GNNServer.from_program(prog)

    or from an exported artifact + parameters::

        server = GNNServer(fn, params, node_budget=N, edge_budget=E,
                           graph_budget=G)

    then ``submit(graph) -> Future`` (streaming) or
    ``predict(graphs) -> np.ndarray`` (sync convenience).
    """

    def __init__(
        self,
        fn,
        params,
        node_budget: int,
        edge_budget: int,
        graph_budget: int,
        max_batch: Optional[int] = None,
        max_wait_ms: float = 2.0,
        max_graph_nodes: Optional[int] = None,
        ell_width: Optional[int] = None,
        rev_ell_width: Optional[int] = None,
        strict_shapes: bool = False,
        block_size: int = 0,
    ):
        self._fn = fn
        self._params = params
        self._budgets = (node_budget, edge_budget, graph_budget)
        # GraphBatch.max_graph_nodes_static is STATIC pytree metadata (it
        # sizes the Pallas gather windows): every served batch must carry
        # the same value the executable was compiled for.  Any bound >= the
        # actual largest graph is correct; requests beyond it are rejected.
        self._max_graph_nodes = max_graph_nodes
        # likewise the ELL table widths are compiled shapes: pin them so
        # every packed batch matches the executable (a request whose degree
        # exceeds the width fails that batch with a clear error)
        self._ell_width = ell_width
        self._rev_ell_width = rev_ell_width
        # block-diagonal bin-packed layout (core/graph.py): batches pack
        # into block_size-row MXU blocks; the executable was compiled for
        # that layout, so every served batch must use it too
        self._block = int(block_size)
        # strict (artifact) mode: shapes are frozen in the executable, so
        # over-width requests are rejected at submit; flexible (live
        # Program) mode: the worker falls back to auto widths and jit
        # compiles another executable for the new shape
        self._strict = strict_shapes
        # ghost graph occupies one slot
        self._max_batch = max_batch or (graph_budget - 1)
        self._max_wait = max_wait_ms / 1e3
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._lat_ms: list[float] = []
        self._served = 0
        self._batches = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        # dispatched-but-unmaterialized batches (pipelining): a dedicated
        # resolver thread materializes them, so host-side packing of the
        # NEXT batch overlaps the device->host sync of the previous ones
        # (through the axon relay that sync is a fixed ~26 ms — serialized
        # with packing it WAS the throughput ceiling, serve_r4.json).
        # The small maxsize bounds in-flight device memory and applies
        # backpressure to the dispatch loop.
        self._resolve_q: "queue.Queue" = queue.Queue(maxsize=3)
        self._resolver = threading.Thread(target=self._resolve_loop,
                                          daemon=True)
        self._resolver.start()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------ construct
    @classmethod
    def from_program(cls, prog, batch_example=None, **kw) -> "GNNServer":
        fwd = prog.compile(batch_example)
        b = prog.bucket
        if batch_example is not None:
            kw.setdefault(
                "max_graph_nodes", batch_example.max_graph_nodes_static
            )
            kw.setdefault("ell_width", batch_example.ell_width or 0)
            kw.setdefault(
                "rev_ell_width",
                batch_example.rev_nbr_nodes.shape[1]
                if batch_example.rev_nbr_nodes is not None
                else 0,
            )
        kw.setdefault("block_size", getattr(prog, "block_size", 0))
        return cls(
            lambda batch: fwd(prog.params, batch),
            None,
            node_budget=b.max_nodes,
            edge_budget=b.max_edges,
            graph_budget=b.max_graphs,
            **kw,
        )

    @classmethod
    def from_bundle(cls, dirpath: str, **kw) -> "GNNServer":
        """Serve a ``Program.export_bundle`` directory (artifact + params
        — fully self-contained, the shipped-.xclbin-plus-weights analog)."""
        import os

        from gnnbuilder_tpu.compile.program import Program

        _, params = Program.load_bundle(dirpath)
        return cls.from_artifact(
            os.path.join(dirpath, "model.stablehlo"), params, **kw
        )

    @classmethod
    def from_artifact(cls, path: str, params, **kw) -> "GNNServer":
        """Serve a ``Program.export`` artifact: no model definition or
        framework compile step needed at load time (the .xclbin analog)."""
        call, _, batch_avals = load_artifact(path)
        n = batch_avals.node_feat.shape[0]
        e = batch_avals.senders.shape[0]
        g = batch_avals.n_node.shape[0]
        kw.setdefault(
            "max_graph_nodes", batch_avals.max_graph_nodes_static or None
        )
        kw.setdefault(
            "ell_width",
            batch_avals.nbr_nodes.shape[1]
            if batch_avals.nbr_nodes is not None
            else 0,
        )
        kw.setdefault(
            "rev_ell_width",
            batch_avals.rev_nbr_nodes.shape[1]
            if batch_avals.rev_nbr_nodes is not None
            else 0,
        )
        kw.setdefault("strict_shapes", True)
        return cls(
            lambda batch: call(params, batch),
            None,
            node_budget=n,
            edge_budget=e,
            graph_budget=g,
            **kw,
        )

    # -------------------------------------------------------------- requests
    def submit(self, graph) -> Future:
        """Enqueue one graph; the future resolves to its [out_dim] numpy
        prediction."""
        p = _Pending(graph)
        err = self._validate(graph)
        if err is not None:
            p.future.set_exception(ValueError(err))
            return p.future
        self._q.put(p)
        return p.future

    def _validate(self, graph) -> Optional[str]:
        n = graph.x.shape[0]
        # hard limits only apply to frozen artifacts; a live Program just
        # compiles another executable for bigger shapes
        if self._strict and self._max_graph_nodes and (
                n > self._max_graph_nodes):
            return (f"graph has {n} nodes; this executable was compiled "
                    f"for graphs <= {self._max_graph_nodes} nodes")
        if self._strict and graph.edge_index.shape[1]:
            recv = np.asarray(graph.edge_index[1])
            send = np.asarray(graph.edge_index[0])
            if self._ell_width:
                d = int(np.bincount(recv, minlength=n).max())
                if d > self._ell_width:
                    return (f"graph max in-degree {d} exceeds the compiled "
                            f"neighbor-table width {self._ell_width}")
            if self._rev_ell_width:
                d = int(np.bincount(send, minlength=n).max())
                if d > self._rev_ell_width:
                    return (f"graph max out-degree {d} exceeds the compiled "
                            f"reverse-table width {self._rev_ell_width}")
        return None

    def predict(self, graphs: Sequence,
                timeout: float = 600.0) -> np.ndarray:
        # generous default: the FIRST call through a freshly deserialized
        # artifact compiles the StableHLO for this device
        futs = [self.submit(g) for g in graphs]
        return np.stack([f.result(timeout=timeout) for f in futs])

    # ----------------------------------------------------------------- stats
    def stats(self) -> dict:
        with self._lock:
            lats = np.asarray(self._lat_ms, dtype=np.float64)
            served, batches = self._served, self._batches
        out = {
            "served": served,
            "batches": batches,
            "avg_batch": served / max(batches, 1),
        }
        if lats.size:
            out.update(
                p50_ms=float(np.percentile(lats, 50)),
                p90_ms=float(np.percentile(lats, 90)),
                p99_ms=float(np.percentile(lats, 99)),
            )
        return out

    def close(self, timeout: Optional[float] = None):
        """Stop dispatching and resolve/fail everything outstanding.

        Blocks until the worker thread actually exits — it may be inside
        a minutes-long flexible-mode recompile in ``self._fn`` — because
        the resolver's shutdown sentinel must only be enqueued once the
        worker can no longer hand off batches (the queue is FIFO, so the
        sentinel then drains every in-flight batch first).  Pass
        ``timeout`` to bound the wait; on expiry the daemon worker is
        abandoned WITHOUT sending the sentinel, so the (daemon) resolver
        keeps draining any late handoff rather than stranding its
        futures.  Requests still sitting in the submit queue are failed
        either way.
        """
        self._stop.set()
        deadline = (None if timeout is None
                    else time.perf_counter() + timeout)
        while self._worker.is_alive():
            wait = 0.5
            if deadline is not None:
                wait = min(wait, deadline - time.perf_counter())
                if wait <= 0:
                    break
            self._worker.join(timeout=wait)
        if not self._worker.is_alive():
            # worker is dead: every batch it will ever dispatch is already
            # in _resolve_q ahead of the sentinel
            self._resolve_q.put(None)
            self._resolver.join(timeout=60.0)
        # fail requests the worker never picked up
        try:
            while True:
                p = self._q.get_nowait()
                if not p.future.done():
                    p.future.set_exception(
                        RuntimeError("GNNServer closed before this request "
                                     "was dispatched"))
        except queue.Empty:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---------------------------------------------------------------- worker
    def _fits(self, chunk: list, g) -> bool:
        nb, eb, gb = self._budgets
        if self._block:
            # exact greedy bin-pack simulation (chunks are small)
            cur = 0
            for gg in [p.graph for p in chunk] + [g]:
                ng = gg.x.shape[0]
                if ng > self._block:
                    return False
                if (cur % self._block) + ng > self._block:
                    cur = -(-cur // self._block) * self._block
                cur += ng
            n = -(-(cur + 1) // self._block) * self._block
        else:
            n = sum(p.graph.x.shape[0] for p in chunk) + g.x.shape[0] + 8
        e = sum(p.graph.edge_index.shape[1] for p in chunk) + (
            g.edge_index.shape[1]
        )
        return n <= nb and e + 8 <= eb and len(chunk) + 2 <= gb

    def _run(self):
        from gnnbuilder_tpu.core.graph import build_graph_batch

        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                continue  # the resolver thread drains in-flight batches
            chunk = [first]
            deadline = time.perf_counter() + self._max_wait
            while len(chunk) < self._max_batch:
                # drain instantly-available requests without consuming the
                # wait budget: max_wait bounds how long we WAIT for
                # stragglers, not how many queued requests we may take
                # (the deadline-capped drain was ~50 graphs/0.5 ms — it
                # silently capped every micro-batch regardless of
                # max_batch, measured on chip in serve_bench round 4)
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    remaining = deadline - time.perf_counter()
                    if remaining <= 0:
                        break
                    try:
                        nxt = self._q.get(timeout=remaining)
                    except queue.Empty:
                        break
                if not self._fits(chunk, nxt.graph):
                    # bucket full: run what we have, requeue the extra
                    self._q.put(nxt)
                    break
                chunk.append(nxt)

            try:
                nb, eb, gb = self._budgets
                gs = [p.graph for p in chunk]
                try:
                    batch = build_graph_batch(
                        gs, node_budget=nb, edge_budget=eb, graph_budget=gb,
                        ell_width=self._ell_width,
                        rev_ell_width=self._rev_ell_width,
                        block_size=self._block or None,
                    )
                except (AssertionError, ValueError):
                    if self._strict:
                        raise
                    # live-Program mode: a batch outgrew the pinned ELL
                    # widths — auto-size and let jit compile for the shape
                    batch = build_graph_batch(
                        gs, node_budget=nb, edge_budget=eb, graph_budget=gb,
                        block_size=self._block or None,
                    )
                if (self._max_graph_nodes
                        and batch.max_graph_nodes_static
                        <= self._max_graph_nodes):
                    # pin the static window bound to the compiled value
                    # (any bound >= the batch's largest graph is valid);
                    # a larger batch keeps its own bound (flexible mode
                    # only — strict rejected it at submit)
                    batch = batch.replace(
                        max_graph_nodes_static=self._max_graph_nodes
                    )
                # PIPELINED DISPATCH: jit calls are async — issue the
                # device work now, materialize LATER.  The per-call host
                # cost (packing + the ~0.1 ms issue floor,
                # results_tpu/dispatch_floor.json) then overlaps the
                # previous batch's device compute.  Under load (another
                # request already queued) materialization of THIS batch
                # is deferred one iteration; when the queue is idle it
                # resolves immediately, so light-load p50 is unchanged.
                dev_out = self._fn(batch)
            except Exception as e:  # noqa: BLE001 — surface to callers
                for p in chunk:
                    p.future.set_exception(e)
                continue

            # hand off to the resolver; blocks only when 3 batches are
            # already awaiting materialization (backpressure)
            self._resolve_q.put((chunk, dev_out))

    def _resolve_loop(self):
        while True:
            item = self._resolve_q.get()
            if item is None:
                return
            self._resolve_one(item)

    def _resolve_one(self, item):
        chunk, dev_out = item
        try:
            out = np.asarray(dev_out)
        except Exception as e:  # noqa: BLE001 — device-side failure
            for p in chunk:
                p.future.set_exception(e)
            return
        t_done = time.perf_counter()
        with self._lock:
            self._served += len(chunk)
            self._batches += 1
            for p in chunk:
                self._lat_ms.append((t_done - p.t_submit) * 1e3)
        for i, p in enumerate(chunk):
            p.future.set_result(out[i])
