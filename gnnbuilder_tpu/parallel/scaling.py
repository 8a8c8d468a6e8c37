"""Scaling-efficiency measurement over a device mesh.

BASELINE.json's distribution target: >=80% scaling efficiency at 2 hosts
with edge-partitioned batches.  This harness measures throughput of the
sharded training step (or forward) at increasing dp widths over whatever
devices exist — virtual CPU devices for mechanics/CI (the float-C-sim
analog, SURVEY.md §4), real chips for truth — and reports efficiency
relative to linear scaling from the smallest width.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["measure_scaling"]


def measure_scaling(
    model,
    graphs,
    batch_size: int = 32,
    dp_widths: Optional[Sequence[int]] = None,
    tp: int = 1,
    iters: int = 10,
    seed: int = 0,
) -> list[dict]:
    """Throughput of the sharded train step at each dp width.

    Returns rows {dp, latency_s, graphs_per_s, efficiency}; efficiency is
    measured against linear scaling from the first width.
    """
    import jax
    import optax

    from gnnbuilder_tpu.bench.timing import marginal_time
    from gnnbuilder_tpu.core.graph import build_graph_batch
    from gnnbuilder_tpu.parallel.mesh import make_mesh
    from gnnbuilder_tpu.parallel.sharding import shard_batch
    from gnnbuilder_tpu.parallel.train import make_sharded_train_step
    from gnnbuilder_tpu.train import stack_targets

    n_dev = len(jax.devices())
    if dp_widths is None:
        dp_widths = [w for w in (1, 2, 4, 8, 16) if w * tp <= n_dev]

    chunk = graphs[:batch_size]
    # node/edge rows must split evenly across every dp width tested
    mult = int(np.lcm.reduce([w * 8 for w in dp_widths]))
    batch = build_graph_batch(chunk, node_multiple=mult, edge_multiple=mult)
    target = stack_targets(chunk, batch.num_graphs)

    rows = []
    base = None
    for dp in dp_widths:
        mesh = make_mesh(dp=dp, tp=tp)
        sbatch = shard_batch(mesh, batch)
        starget = jax.device_put(
            target,
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        )
        # donate=False: the step is re-invoked with the same buffers while
        # timing, which donated buffers would invalidate
        step, init = make_sharded_train_step(
            model, optax.adam(1e-3), mesh, sbatch, donate=False
        )
        params = model.init(jax.random.PRNGKey(seed), batch)
        params, opt_state = init(params)

        def timed(p, o, b, t):
            _, _, loss = step(p, o, b, t)
            return loss

        dt = marginal_time(
            timed,
            params,
            opt_state,
            sbatch,
            starget,
            n_lo=max(2, iters // 3),
            n_hi=iters,
            warmup=2,
            repeats=1,
        )
        tput = batch_size / dt
        if base is None:
            base = tput / dp
        rows.append(
            dict(
                dp=dp,
                latency_s=dt,
                graphs_per_s=tput,
                efficiency=tput / (base * dp),
            )
        )
    return rows
