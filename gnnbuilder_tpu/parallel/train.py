"""Sharded training/inference steps over a device mesh.

Full training step (forward + backward + optax update) jitted over the
("dp","tp") mesh with edge-partitioned batches and tensor-parallel weights
(parallel/sharding.py).  GSPMD inserts the boundary-feature collectives the
BASELINE.json north star calls for; gradients reduce over dp automatically
because every shard contributes to the same (replicated) loss scalar.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax

from gnnbuilder_tpu.core.graph import GraphBatch
from gnnbuilder_tpu.ops.dispatch import no_fused
from gnnbuilder_tpu.parallel.sharding import batch_shardings, shard_params
from gnnbuilder_tpu.train import masked_mse_loss

__all__ = ["make_sharded_train_step", "make_sharded_forward"]


def make_sharded_forward(model, mesh, example_batch: GraphBatch):
    b_sh = batch_shardings(mesh, example_batch)

    def fwd(params, batch):
        # pallas_call has no GSPMD partitioning rule; sharded traces use
        # the XLA ops (ops/dispatch.no_fused)
        with no_fused():
            return model.apply(params, batch)

    return jax.jit(
        fwd,
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
):
    """Returns (step, init) where step(params, opt_state, batch, target)
    runs one fully-sharded training step and init places params/opt_state
    with their mesh shardings."""
    b_sh = batch_shardings(mesh, example_batch)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

    def loss_wrap(params, batch: GraphBatch, target):
        with no_fused():
            pred = model.apply(params, batch)
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
        params = shard_params(mesh, params)
        opt_state = optimizer.init(params)
        return params, opt_state

    return jstep, init
