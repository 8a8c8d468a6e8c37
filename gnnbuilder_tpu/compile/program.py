"""Program — the compile/run driver, analog of the reference's ``Project``
(code_gen.py:62-337).

Where ``Project`` renders Jinja -> HLS C++ -> csynth -> bitstream, a TPU
``Program`` lowers the model through JAX tracing into one compiled XLA
executable per padding bucket:

* ``Project(max_nodes, max_edges)``  ->  padding-bucket policy (static shapes)
* ``gen_hw_model()``                 ->  ``compile()`` (jit + AOT lower)
* ``gen_testbench_data()``           ->  verify.golden serialization
* ``build_and_run_testbench()``      ->  ``run_parity_check()`` (MAE vs torch)
* csynth report                      ->  ``cost_analysis()`` (XLA HLO cost)

The Program also owns parameter state (init or ported from torch) and the
donated-buffer caching that replaces the reference's on-chip parameter cache
behind ``copy_parameters_flag`` (model.cpp.jinja:724-730) — on TPU parameters
simply stay resident in HBM between calls.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gnnbuilder_tpu.compile.precision import Precision
from gnnbuilder_tpu.core.graph import GraphBatch, build_graph_batch
from gnnbuilder_tpu.nn.model import GNNModel

__all__ = ["Program", "BucketSpec", "enable_persistent_cache"]


def enable_persistent_cache(path: str = "~/.cache/gnnbuilder_tpu_xla") -> str:
    """Persist compiled executables across processes (serving cold-start).

    The reference's deployable artifact is the .xclbin the host loads
    instantly (code_gen.py:457-489); the jit analog is JAX's persistent
    compilation cache — first process pays the XLA/Mosaic compile, every
    later process (a restarted server, a new worker) loads the executable
    from disk.  Program.export (StableHLO) remains the portable artifact;
    this cache is the machine-local fast path.  Returns the cache dir.
    """
    import os

    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every compilation, not only the slow ones
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    """Static padded sizes for one compiled executable — the TPU analog of the
    reference's compile-time MAX_NODES/MAX_EDGES (code_gen.py:72-73), but
    many-bucketed instead of single worst-case."""

    max_nodes: int
    max_edges: int
    max_graphs: int

    def fits(self, n: int, e: int, g: int) -> bool:
        return (
            n + 1 <= self.max_nodes
            and e <= self.max_edges
            and g + 1 <= self.max_graphs
        )


class Program:
    def __init__(
        self,
        model: GNNModel,
        max_nodes: int = 500,
        max_edges: int = 500,
        max_graphs: int = 2,
        precision: Precision | str = "f32",
        seed: int = 0,
        block_size: int = 0,
    ):
        self.model = model
        if block_size:
            assert max_nodes % block_size == 0, (max_nodes, block_size)
        # block_size > 0 selects the block-diagonal bin-packed layout
        # (core/graph.py): aggregation runs as batched MXU matmuls
        # (ops/block.py / the block kernels).  Requires every graph to
        # have <= block_size nodes; best for small-molecule datasets.
        self.block_size = int(block_size)
        self.bucket = BucketSpec(max_nodes, max_edges, max_graphs)
        self.precision = (
            precision
            if isinstance(precision, Precision)
            else Precision.from_name(precision)
        )
        self.params: Optional[Any] = None
        self._seed = seed
        self._compiled = {}
        # int8 static activation scales (site -> scale), set by
        # calibrate_int8(); None = dynamic per-row quantization
        self.int8_scales: Optional[dict] = None

    # ------------------------------------------------------------- construct
    @classmethod
    def from_dataset(
        cls,
        model: GNNModel,
        graphs,
        batch_size: int = 1,
        headroom: float = 1.0,
        **kw,
    ) -> "Program":
        """Size the padding bucket from dataset statistics — the reference's
        flow of compute_max_nodes_and_edges -> Project(max_nodes=...)
        (demos/demo.py:53-58, utils.py:9-16) as one call.

        The bucket fits the ``batch_size`` largest graphs packed together
        (times ``headroom``), so any batch drawn from ``graphs`` fits.
        """
        ns = sorted((g.x.shape[0] for g in graphs), reverse=True)
        es = sorted((g.edge_index.shape[1] for g in graphs), reverse=True)
        k = min(batch_size, len(ns))
        max_nodes = int((sum(ns[:k]) + 1) * headroom) + 8
        max_edges = int(max(sum(es[:k]), 1) * headroom) + 8
        blk = int(kw.get("block_size", 0) or 0)
        if blk:
            # block layout: budget covers worst-case bin-pack waste
            # (~half a block per graph boundary) and aligns to the block
            waste = blk / max(blk - (max_nodes / max(k, 1)) / 2.0, 1.0)
            max_nodes = int(-(-int(max_nodes * waste + 1) // blk) * blk)
        return cls(
            model,
            max_nodes=max_nodes,
            max_edges=max_edges,
            max_graphs=batch_size + 1,
            **kw,
        )

    # ------------------------------------------------------------------ init
    def init_params(self, example_batch: Optional[GraphBatch] = None):
        if example_batch is None:
            example_batch = self._dummy_batch()
        self.params = self.model.init(
            jax.random.PRNGKey(self._seed), example_batch
        )
        return self.params

    def set_params(self, params):
        self.params = params

    def _dummy_batch(self) -> GraphBatch:
        from gnnbuilder_tpu.data.datasets import FakeDataset

        gs = FakeDataset(
            num_graphs=1,
            avg_num_nodes=4,
            node_dim=self.model.graph_input_feature_dim,
            edge_dim=self.model.graph_input_edge_dim or 1,
        )
        return self.batch(gs)

    # --------------------------------------------------------------- batching
    def batch(self, graphs: Sequence) -> GraphBatch:
        return build_graph_batch(
            graphs,
            node_budget=self.bucket.max_nodes,
            edge_budget=self.bucket.max_edges,
            graph_budget=self.bucket.max_graphs,
            block_size=self.block_size or None,
        )

    # ---------------------------------------------------------------- forward
    def _forward_fn(self):
        model = self.model
        prec = self.precision
        scales = self.int8_scales

        @jax.jit
        def fwd(params, batch: GraphBatch):
            if prec.name == "bf16":
                params = prec.cast_params(params)
                batch = batch.with_node_feat(
                    batch.node_feat.astype(jnp.bfloat16)
                )
            from gnnbuilder_tpu.ops.dispatch import inference_mode

            with prec.activate(), inference_mode():
                if scales:
                    from gnnbuilder_tpu.ops.quant import calibration

                    with calibration(scales=scales):
                        out = model.apply(params, batch)
                else:
                    out = model.apply(params, batch)
            return out.astype(jnp.float32)

        return fwd

    def calibrate_int8(self, batches: Sequence[GraphBatch]) -> dict:
        """Record static int8 activation scales from representative batches
        (ops/quant.calibration): one eager pass per batch collecting each
        quantized site's max |activation|, then bake ``scale = max/127``
        into every subsequent compile/export.  The serving-path analog of
        the reference choosing ap_fixed integer widths from dataset ranges
        (code_gen.py:117-119); removes the per-row abs-max reduction from
        the quantized matmuls."""
        if self.precision.name != "int8":
            raise ValueError("calibrate_int8 requires precision='int8'")
        from gnnbuilder_tpu.ops.quant import calibration, scales_from_record

        if self.params is None:
            self.init_params(batches[0])
        record: dict = {}
        with self.precision.activate(), calibration(record=record):
            for b in batches:
                self.model.apply(self.params, b)
        self.int8_scales = scales_from_record(record)
        self._compiled.clear()  # recompile with static scales
        return self.int8_scales

    def compile(self, example_batch: Optional[GraphBatch] = None):
        """AOT-compile the forward executable for this bucket (the
        gen_hw_model + csynth analog, minus the hours)."""
        if self.params is None:
            self.init_params(example_batch)
        if example_batch is None:
            example_batch = self._dummy_batch()
        key = ("fwd",)
        if key not in self._compiled:
            fwd = self._forward_fn()
            self._compiled[key] = fwd
            fwd(self.params, example_batch)  # trigger compile
        return self._compiled[key]

    def forward(self, batch: GraphBatch):
        fwd = self.compile(batch)
        return fwd(self.params, batch)

    # ----------------------------------------------------------------- export
    def export(self, path: str, example_batch: Optional[GraphBatch] = None):
        """Serialize the compiled forward as a StableHLO artifact
        (jax.export) — the deployable analog of the reference's generated
        project (gen_hw_model -> .xo/.xclbin, code_gen.py:201-213,457-489):
        a self-contained program another process/runtime can load and run
        without this framework or the model definition."""
        from jax import export as jexport

        if self.params is None:
            self.init_params(example_batch)
        if example_batch is None:
            example_batch = self._dummy_batch()
        fwd = self._forward_fn()
        args = (self.params, example_batch)
        specs = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
            if hasattr(a, "shape")
            else a,
            args,
        )
        exp = jexport.export(jax.jit(fwd))(*specs)
        with open(path, "wb") as f:
            f.write(exp.serialize())
        return path

    @staticmethod
    def load_exported(path: str):
        """Load a serialized program; returns fn(params, batch) -> output."""
        from jax import export as jexport

        with open(path, "rb") as f:
            exp = jexport.deserialize(f.read())
        return exp.call

    def export_bundle(self, dirpath: str,
                      example_batch: Optional[GraphBatch] = None) -> str:
        """Self-contained deployable directory: the StableHLO artifact plus
        the trained parameters — everything a serving process needs
        (serve.GNNServer.from_bundle), no model definition required.  The
        full analog of the reference's shipped .xclbin + parameter binaries
        (code_gen.py:457-489 + :239-246)."""
        import os as _os
        import pickle as _pickle

        _os.makedirs(dirpath, exist_ok=True)
        self.export(_os.path.join(dirpath, "model.stablehlo"), example_batch)
        flat, treedef = jax.tree_util.tree_flatten(self.params)
        np.savez(
            _os.path.join(dirpath, "params.npz"),
            **{f"p{i}": np.asarray(x) for i, x in enumerate(flat)},
        )
        with open(_os.path.join(dirpath, "params.treedef"), "wb") as f:
            _pickle.dump(treedef, f)
        return dirpath

    @staticmethod
    def load_bundle(dirpath: str):
        """(call, params) from an export_bundle directory."""
        import os as _os
        import pickle as _pickle

        call = Program.load_exported(
            _os.path.join(dirpath, "model.stablehlo")
        )
        with open(_os.path.join(dirpath, "params.treedef"), "rb") as f:
            treedef = _pickle.load(f)
        z = np.load(_os.path.join(dirpath, "params.npz"))
        flat = [jnp.asarray(z[f"p{i}"]) for i in range(len(z.files))]
        return call, jax.tree_util.tree_unflatten(treedef, flat)

    # ---------------------------------------------------------------- verify
    def gen_testbench_data(self, graphs, out_dir: str, max_graphs=None):
        """Serialize params + per-graph goldens in the reference's binary
        testbench format (code_gen.py:227-305); see verify/golden.py."""
        from gnnbuilder_tpu.verify import golden

        return golden.gen_testbench_data(
            self, graphs, out_dir, max_graphs=max_graphs
        )

    def run_parity_check(self, graphs, golden_dir: str) -> dict:
        """MAE vs serialized goldens — the build_and_run_testbench analog
        (code_gen.py:339-395)."""
        from gnnbuilder_tpu.verify import golden

        return golden.parity_check(self, graphs, golden_dir)

    # ------------------------------------------------------------- diagnostics
    def cost_analysis(self, example_batch: Optional[GraphBatch] = None) -> dict:
        """Compiled-HLO cost analysis: FLOPs and bytes accessed — the analog
        of the csynth resource/latency report (utils.py:118-173)."""
        if self.params is None:
            self.init_params(example_batch)
        if example_batch is None:
            example_batch = self._dummy_batch()
        # analyze the SAME program forward() runs: precision context active
        # (int8/bf16 change both the compute path and the kernel dispatch)
        lowered = self._forward_fn().lower(self.params, example_batch)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0] if cost else {}
        out = dict(cost or {})
        # peak-memory accounting — the BRAM-utilization analog of the
        # csynth report (reference utils.py:150-173): argument + output +
        # temp + generated-code sizes of the compiled executable
        try:
            mem = compiled.memory_analysis()
            for k in (
                "argument_size_in_bytes",
                "output_size_in_bytes",
                "temp_size_in_bytes",
                "generated_code_size_in_bytes",
            ):
                v = getattr(mem, k, None)
                if v is not None:
                    out[k] = float(v)
            out["peak_hbm_bytes"] = (
                out.get("argument_size_in_bytes", 0.0)
                + out.get("output_size_in_bytes", 0.0)
                + out.get("temp_size_in_bytes", 0.0)
            )
        except Exception:
            pass
        return out

    def _chained_fn(self):
        """Forward step whose input depends on the previous call's output:
        independent repeated calls through the relay overlap (or elide)
        entirely and can report impossible >peak numbers; chaining forces
        true serialization, so the marginal is the real per-call time."""
        model = self.model
        prec = self.precision
        scales = self.int8_scales

        @jax.jit
        def step(params, batch: GraphBatch, carry):
            # the 1e-30-scaled carry keeps a REAL data dependence without
            # perturbing numerics (0 * carry would constant-fold away)
            batch = batch.with_node_feat(
                batch.node_feat + carry.astype(batch.node_feat.dtype) * 1e-30
            )
            if prec.name == "bf16":
                params = prec.cast_params(params)
                batch = batch.with_node_feat(
                    batch.node_feat.astype(jnp.bfloat16)
                )
            from gnnbuilder_tpu.ops.dispatch import inference_mode

            with prec.activate(), inference_mode():
                if scales:
                    from gnnbuilder_tpu.ops.quant import calibration

                    with calibration(scales=scales):
                        out = model.apply(params, batch)
                else:
                    out = model.apply(params, batch)
            return jnp.sum(out.astype(jnp.float32))

        return step

    def _inner_chain_fn(self, k: int):
        """``k`` forwards chained INSIDE one executable (lax.scan body =
        one forward; the scalar carry feeds each iteration, so the device
        serializes them).  One outer call then pays the per-call host-issue
        floor (~0.1 ms through the axon relay, results_tpu/
        dispatch_floor.json) exactly once for k forwards — timing two k
        values and taking the slope cancels it entirely.  scan compiles the
        body once, so cost is ~one forward compile regardless of k."""
        model = self.model
        prec = self.precision
        scales = self.int8_scales

        @jax.jit
        def chain(params, batch: GraphBatch, carry):
            if prec.name == "bf16":
                params = prec.cast_params(params)

            def body(c, _):
                b = batch.with_node_feat(
                    (batch.node_feat + c.astype(batch.node_feat.dtype)
                     * 1e-30).astype(
                        jnp.bfloat16 if prec.name == "bf16"
                        else batch.node_feat.dtype
                    )
                )
                from gnnbuilder_tpu.ops.dispatch import inference_mode

                with prec.activate(), inference_mode():
                    if scales:
                        from gnnbuilder_tpu.ops.quant import calibration

                        with calibration(scales=scales):
                            out = model.apply(params, b)
                    else:
                        out = model.apply(params, b)
                return jnp.sum(out.astype(jnp.float32)), None

            c, _ = jax.lax.scan(body, carry, None, length=k)
            return c

        return chain

    def _inner_chain_dyn_fn(self):
        """Dynamic-length inner chain: ONE executable serves every chain
        length k (``lax.fori_loop`` with a traced trip count), so a
        two-point slope fit costs one compile instead of two — and both
        arms run literally the same code, so the per-call overhead cancels
        by construction rather than by compiler coincidence."""
        model = self.model
        prec = self.precision
        scales = self.int8_scales

        @jax.jit
        def chain(params, batch: GraphBatch, carry, k):
            if prec.name == "bf16":
                params = prec.cast_params(params)

            def body(_i, c):
                b = batch.with_node_feat(
                    (batch.node_feat + c.astype(batch.node_feat.dtype)
                     * 1e-30).astype(
                        jnp.bfloat16 if prec.name == "bf16"
                        else batch.node_feat.dtype
                    )
                )
                from gnnbuilder_tpu.ops.dispatch import inference_mode

                with prec.activate(), inference_mode():
                    if scales:
                        from gnnbuilder_tpu.ops.quant import calibration

                        with calibration(scales=scales):
                            out = model.apply(params, b)
                    else:
                        out = model.apply(params, b)
                return jnp.sum(out.astype(jnp.float32))

            return jax.lax.fori_loop(0, k, body, carry)

        return chain

    def benchmark_inner(
        self,
        batch: GraphBatch,
        k_lo: int = 1,
        k_hi: int = 5,
        iters: int = 20,
        repeats: int = 5,
        dynamic: bool = False,
    ) -> dict:
        """Per-forward DEVICE time via the inner-chain protocol
        (experiments/dispatch_floor.py): time jit(forward^k) at two chain
        lengths, slope = (t_hi - t_lo)/(k_hi - k_lo).  The per-call
        host-issue floor and the relay transfer cost appear identically in
        both arms and cancel — unlike ``benchmark``, whose per-CALL
        marginal includes the ~0.1 ms floor (fine for end-to-end latency,
        systematic bias for sub-ms kernel labels; round-3 DSE corpus
        regression, VERDICT r3 Weak #3).

        Returns latency_s (per forward), overhead_s (per outer call),
        resolved (False when the fit is degenerate: flat-in-k /
        sub-resolution — then latency_s falls back to the t_hi/k_hi upper
        bound and callers should treat the row as an upper bound)."""
        from gnnbuilder_tpu.bench.timing import marginal_time

        if self.params is None:
            self.init_params(batch)
        times = {}
        if dynamic:
            key = ("inner_dyn",)
            if key not in self._compiled:
                self._compiled[key] = self._inner_chain_dyn_fn()
            dyn_step = self._compiled[key]
        for k in (k_lo, k_hi):
            if dynamic:
                kj = jnp.int32(k)
                step = lambda p, b, c, _kj=kj: dyn_step(p, b, c, _kj)
            else:
                key = ("inner", k)
                if key not in self._compiled:
                    self._compiled[key] = self._inner_chain_fn(k)
                step = self._compiled[key]
            carry = {"c": jnp.zeros(())}

            def call():
                carry["c"] = step(self.params, batch, carry["c"])
                return carry["c"]

            call()  # compile
            dt = marginal_time(call, n_hi=iters, repeats=max(repeats, 3))
            if dt * (iters - 5) < 2e-3:
                gap = min(int(2e-3 / max(dt, 2e-5)) + 50, 400)
                dt = marginal_time(
                    call, n_lo=gap // 5, n_hi=gap, repeats=max(repeats, 3)
                )
                # relay noise can drive the median marginal estimate
                # negative, which marginal_time clamps to ~0 — a nonsense
                # "0 us" that would poison labels/spreads downstream.  At
                # the clamp, retry once at the widest gap; if still
                # degenerate, keep the clamp (resolved=False below makes
                # the caller treat the row as unusable, not as 0 us).
                if dt < 1e-8:
                    dt = marginal_time(
                        call, n_lo=80, n_hi=400, repeats=max(repeats, 3)
                    )
            times[k] = dt
        slope = (times[k_hi] - times[k_lo]) / (k_hi - k_lo)
        overhead = times[k_lo] - slope * k_lo
        # degenerate fit: flat in k (the whole chain fits under the issue
        # floor) or negative slope (noise) — report the honest upper bound
        # instead of a nonsense number (VERDICT r3 Weak #8)
        resolved = slope > 0 and times[k_hi] > 1.25 * times[k_lo]
        if not resolved:
            slope = times[k_hi] / k_hi
            overhead = 0.0
        real_graphs = int(np.asarray(batch.graph_mask).sum())
        real_edges = int(np.asarray(batch.edge_mask).sum())
        return {
            "latency_s": float(slope),
            "overhead_s": float(max(overhead, 0.0)),
            "resolved": bool(resolved),
            "times_s": {int(k): float(v) for k, v in times.items()},
            "graphs_per_s": real_graphs / slope,
            "edges_per_s": real_edges / slope,
        }

    def benchmark(
        self, batch: GraphBatch, iters: int = 25, repeats: int = 1
    ) -> dict:
        """Measured wall-clock per forward call — the analog of the C-sim
        testbench timing loop (model_tb.cpp.jinja:167-204).  Chains calls
        (output feeds the next input) and uses marginal timing
        (bench/timing.py): through the relayed TPU backend,
        block_until_ready returns at enqueue and INDEPENDENT repeated
        calls overlap or elide entirely; ``repeats`` takes the median of
        that many marginal estimates (relay noise at sub-ms calls is
        2-3x)."""
        from gnnbuilder_tpu.bench.timing import marginal_time

        if self.params is None:
            self.init_params(batch)
        key = ("chain",)
        if key not in self._compiled:
            self._compiled[key] = self._chained_fn()
        step = self._compiled[key]
        carry = {"c": jnp.zeros(())}

        def call():
            carry["c"] = step(self.params, batch, carry["c"])
            return carry["c"]

        call()  # compile
        dt = marginal_time(call, n_hi=iters, repeats=max(repeats, 3))
        # resolution guard: the marginal difference must clear the relay
        # jitter (~1-2 ms per timed window) or fast configs clamp to the
        # 1e-9 floor; widen the call-count gap until it does
        if dt * (iters - 5) < 2e-3:
            gap = int(2e-3 / max(dt, 2e-5)) + 50
            gap = min(gap, 400)
            dt = marginal_time(
                call, n_lo=gap // 5, n_hi=gap, repeats=max(repeats, 3)
            )
        real_graphs = int(np.asarray(batch.graph_mask).sum())
        real_edges = int(np.asarray(batch.edge_mask).sum())
        return {
            "latency_s": dt,
            "graphs_per_s": real_graphs / dt,
            "edges_per_s": real_edges / dt,
        }
