"""Sharded training/inference steps over a device mesh.

Full training step (forward + backward + optax update) jitted over the
("dp","tp") mesh with edge-partitioned batches and tensor-parallel weights
(parallel/sharding.py).  Two distribution strategies:

* GSPMD (default, ``halo=False``): XLA infers the boundary-feature
  collectives from shardings — correctness-first.
* Explicit halo (``halo=True``): the model is traced inside shard_map on
  the dp-partitioned node rows; every neighbor gather reads a ring-
  exchanged [halo | local | halo] window (jax.lax.ppermute over ICI) and
  pooling psums per-graph partials — the BASELINE north-star formulation
  ("all-to-all boundary exchange overlapped with local aggregation").
  Collective bytes per layer: 2 * halo * F per chip, batch-size
  independent; contrast GSPMD's full all-gathers.  Requires ELL tables
  and graph-contiguous packing (both packer guarantees).  GINE runs too:
  its edge arrays replicate across shards, so the edge-slot gathers take
  global ids directly (ops/ell.ell_gather node_rows=False).

Gradients reduce over dp automatically because every shard contributes to
the same (replicated) loss scalar — ppermute/psum transpose correctly
under jax.grad.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import PartitionSpec as P

from gnnbuilder_tpu.core.graph import GraphBatch, _round_up
from gnnbuilder_tpu.ops.dispatch import no_fused
from gnnbuilder_tpu.parallel.halo import halo_scope
from gnnbuilder_tpu.parallel.sharding import (
    batch_shardings,
    halo_batch_specs,
    model_p_factors,
    shard_params,
)
from gnnbuilder_tpu.train import masked_mse_loss

__all__ = ["make_sharded_train_step", "make_sharded_forward"]


def _shard_map():
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    return shard_map


def _halo_size(example_batch: GraphBatch, mesh, axis: str = "dp") -> int:
    maxg = example_batch.max_graph_nodes_static
    if maxg <= 0:
        raise ValueError(
            "halo=True requires max_graph_nodes_static metadata "
            "(build batches with build_graph_batch)"
        )
    if example_batch.nbr_nodes is None:
        raise ValueError("halo=True requires ELL neighbor tables")
    halo = _round_up(maxg, 8)
    n_local = example_batch.num_nodes // mesh.shape[axis]
    if halo > n_local:
        raise ValueError(
            f"halo {halo} exceeds local rows {n_local}; use fewer dp shards"
        )
    return halo


def _halo_apply(model, mesh, example_batch: GraphBatch, axis: str = "dp"):
    """model.apply traced inside shard_map with windowed neighbor gathers."""
    halo = _halo_size(example_batch, mesh, axis)
    specs = halo_batch_specs(example_batch)

    def body(params, batch):
        # fused layer kernels run PER SHARD on the halo-extended window
        # (ops/dispatch + parallel/halo.halo_wrap_layer); the remaining
        # halo-aware XLA ops (pooling psums, non-layer aggregations) trace
        # under the same scope
        with halo_scope(axis, halo):
            return model.apply(params, batch)

    sm = _shard_map()(
        body,
        mesh=mesh,
        in_specs=(P(), specs),
        out_specs=P(),
        check_vma=False,
    )
    return sm


def make_sharded_forward(
    model, mesh, example_batch: GraphBatch, halo: bool = False
):
    if halo:
        apply_fn = _halo_apply(model, mesh, example_batch)
    else:
        def apply_fn(params, batch):
            # pallas_call has no GSPMD partitioning rule; sharded traces
            # use the XLA ops (ops/dispatch.no_fused)
            with no_fused():
                return model.apply(params, batch)

    b_sh = batch_shardings(mesh, example_batch)
    return jax.jit(
        apply_fn,
        in_shardings=(None, b_sh),  # params sharding inferred from input
        out_shardings=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()
        ),
    )


def make_sharded_train_step(
    model,
    optimizer: optax.GradientTransformation,
    mesh,
    example_batch: GraphBatch,
    loss_fn: Callable = masked_mse_loss,
    donate: bool = True,
    halo: bool = False,
):
    """Returns (step, init) where step(params, opt_state, batch, target)
    runs one fully-sharded training step and init places params/opt_state
    with their mesh shardings.  ``halo=True`` opts into the explicit
    ppermute halo-exchange formulation (module docstring)."""
    b_sh = batch_shardings(mesh, example_batch)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

    if halo:
        apply_fn = _halo_apply(model, mesh, example_batch)
    else:
        def apply_fn(params, batch):
            with no_fused():
                return model.apply(params, batch)

    def loss_wrap(params, batch: GraphBatch, target):
        pred = apply_fn(params, batch)
        return loss_fn(pred, target, batch.graph_mask)

    def step(params, opt_state, batch, target):
        loss, grads = jax.value_and_grad(loss_wrap)(params, batch, target)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jstep = jax.jit(
        step,
        in_shardings=(None, None, b_sh, rep),
        donate_argnums=(0, 1) if donate else (),
    )

    def init(params):
        # per-layer p-factors decide which kernels shard over tp — the
        # reference's p_in/p_hidden/p_out knobs made load-bearing
        params = shard_params(mesh, params, model_p_factors(model))
        opt_state = optimizer.init(params)
        return params, opt_state

    return jstep, init
