"""Program.benchmark_inner — the inner-chain per-op protocol.

The protocol (experiments/dispatch_floor.py; DSE label migration, round 4)
times k forwards inside ONE executable at two chain lengths and fits the
slope, cancelling the ~0.1 ms per-call host-issue floor of the relayed
chip.  Round 4b made the chain length dynamic (fori_loop with a traced
trip count): one compile serves both slope arms.  These tests pin

* the dynamic chain's numerics against the static lax.scan chain,
* the result-dict contract (positive latency, resolved flag),
* the degenerate-fit contract: when timing noise makes the fit
  unresolvable, the row is flagged resolved=False (callers like
  dse.measure stamp it inner_upper_bound and the retest/refresh scripts
  skip it) rather than silently reporting a fictitious number.
"""

import numpy as np
import pytest

import gnnbuilder_tpu as gnnb


@pytest.fixture(scope="module")
def prog_batch():
    import jax

    from gnnbuilder_tpu.bench.canonical import (
        canonical_batches,
        canonical_model,
    )

    graphs, batches = canonical_batches(
        "qm9", n_graphs=16, batch_size=8, node_multiple=8
    )
    model = canonical_model(
        "gcn", "qm9", graphs=graphs, gnn_hidden_dim=16, gnn_num_layers=2,
        gnn_output_dim=8, mlp_hidden_dim=8, mlp_hidden_layers=1,
    )
    b = batches[0]
    p = gnnb.Program(
        model, max_nodes=b.num_nodes, max_edges=b.num_edges,
        max_graphs=b.num_graphs,
    )
    p.init_params(b)
    _ = jax
    return p, b


def test_dynamic_chain_matches_static(prog_batch):
    """The fori_loop chain with traced k computes the same carry as the
    lax.scan chain compiled for that k."""
    import jax.numpy as jnp

    p, b = prog_batch
    dyn = p._inner_chain_dyn_fn()
    for k in (1, 3, 5):
        static = p._inner_chain_fn(k)
        c_dyn = dyn(p.params, b, jnp.zeros(()), jnp.int32(k))
        c_sta = static(p.params, b, jnp.zeros(()))
        np.testing.assert_allclose(
            np.asarray(c_dyn), np.asarray(c_sta), rtol=1e-6
        )


def test_benchmark_inner_contract(prog_batch):
    p, b = prog_batch
    r = p.benchmark_inner(b, iters=8, repeats=3)
    assert r["latency_s"] > 0
    assert r["overhead_s"] >= 0
    assert isinstance(r["resolved"], bool)
    assert set(r["times_s"]) == {1, 5}
    assert r["graphs_per_s"] > 0 and r["edges_per_s"] > 0


def test_degenerate_fit_is_flagged_not_zeroed(prog_batch, monkeypatch):
    """Relay noise can drive the median marginal estimate negative, which
    marginal_time clamps to ~1e-9.  benchmark_inner must flag the fit
    unresolved (the dse.measure caller then stamps inner_upper_bound and
    refresh/retest scripts drop the row) — never report it as a resolved
    sub-nanosecond latency."""
    from gnnbuilder_tpu.bench import timing

    p, b = prog_batch
    monkeypatch.setattr(timing, "marginal_time", lambda *a, **k: 1e-9)
    r = p.benchmark_inner(b, iters=8, repeats=3)
    assert r["resolved"] is False
