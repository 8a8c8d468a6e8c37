"""Training utilities: masked losses, metrics, and optax train steps.

The reference has no training loop (models train in vanilla PyTorch,
SURVEY.md section 1) — but accuracy parity on ESOL/FreeSolv/Lipo/HIV/QM9
(BASELINE.json) needs one, so the framework provides a first-class jitted
train step.  Losses mask the ghost graph (core/graph.py padding) so padding
never leaks into gradients.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from gnnbuilder_tpu.core.graph import GraphBatch

__all__ = [
    "masked_mse_loss",
    "masked_mae",
    "masked_bce_logits_loss",
    "roc_auc",
    "make_train_step",
    "TrainState",
]


def masked_mse_loss(pred, target, graph_mask):
    """Mean squared error over real graphs only. pred/target [G, T]."""
    w = graph_mask.astype(pred.dtype)[:, None]
    se = (pred - target) ** 2 * w
    return jnp.sum(se) / jnp.maximum(jnp.sum(w) * pred.shape[-1], 1.0)


def masked_mae(pred, target, graph_mask):
    w = graph_mask.astype(pred.dtype)[:, None]
    ae = jnp.abs(pred - target) * w
    return jnp.sum(ae) / jnp.maximum(jnp.sum(w) * pred.shape[-1], 1.0)


def masked_bce_logits_loss(logits, target, graph_mask):
    """Binary cross-entropy with logits over real graphs (HIV-style tasks)."""
    w = graph_mask.astype(logits.dtype)[:, None]
    per = optax.sigmoid_binary_cross_entropy(logits, target) * w
    return jnp.sum(per) / jnp.maximum(jnp.sum(w) * logits.shape[-1], 1.0)


def roc_auc(scores, labels) -> float:
    """Host-side ROC-AUC (rank statistic) for classification parity checks."""
    import numpy as np

    scores = np.asarray(scores).reshape(-1)
    labels = np.asarray(labels).reshape(-1)
    pos = scores[labels > 0.5]
    neg = scores[labels <= 0.5]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    order = np.argsort(np.concatenate([pos, neg]), kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(order) + 1)
    # average ranks for ties
    allv = np.concatenate([pos, neg])
    sortv = allv[order]
    i = 0
    while i < len(sortv):
        j = i
        while j + 1 < len(sortv) and sortv[j + 1] == sortv[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = ranks[order[i : j + 1]].mean()
        i = j + 1
    r_pos = ranks[: len(pos)].sum()
    n_p, n_n = len(pos), len(neg)
    return float((r_pos - n_p * (n_p + 1) / 2) / (n_p * n_n))


class TrainState:
    """Minimal mutable train-state holder (params + opt state)."""

    def __init__(self, params, opt_state, step: int = 0):
        self.params = params
        self.opt_state = opt_state
        self.step = step


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable = masked_mse_loss,
    donate: bool = True,
):
    """Build a jitted (params, opt_state, batch, target) -> updated step.

    Donated params/opt_state keep weights resident on-device between steps —
    the TPU analog of the reference's on-chip parameter cache behind
    ``copy_parameters_flag`` (model.cpp.jinja:724-730).
    """

    def loss_wrap(params, batch: GraphBatch, target):
        pred = model.apply(params, batch)
        return loss_fn(pred, target, batch.graph_mask)

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, batch: GraphBatch, target):
        loss, grads = jax.value_and_grad(loss_wrap)(params, batch, target)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def stack_targets(graphs, num_graphs_padded: int, target_dim: int = 1):
    """Pack per-graph targets into a padded [G, T] array (ghost rows zero)."""
    import numpy as np

    out = np.zeros((num_graphs_padded, target_dim), dtype=np.float32)
    for i, g in enumerate(graphs):
        if g.y is not None:
            out[i] = np.asarray(g.y, dtype=np.float32).reshape(-1)[:target_dim]
    return jnp.asarray(out)


# ----------------------------------------------------------------- checkpoint
def save_checkpoint(path: str, params, opt_state=None, step: int = 0) -> str:
    """Persist params (+ optimizer state) with orbax — the checkpoint/resume
    subsystem the reference lacks entirely (SURVEY.md §5: its only persisted
    artifacts are serialized parameter binaries and DSE pickles)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params, "step": step}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, like=None):
    """Restore a checkpoint; ``like`` (same-structure pytree of arrays)
    enables exact dtype/shape restoration."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, like)
    return ckptr.restore(path)
