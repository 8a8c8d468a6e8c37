"""Segment-op unit tests vs torch scatter golden — the analog of the
reference's incremental-aggregator tests (test.cpp:459-678)."""

import numpy as np
import torch

from gnnbuilder_tpu.ops import segment
from gnnbuilder_tpu.verify import torch_ref as tr

EPS = 1e-5  # float32 elementwise bar; reference used 1e-3 (test.cpp:1146)


def _fixture(seed=0, e=64, n=16, f=8):
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((e, f)).astype(np.float32)
    seg = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    # make some segments empty deliberately
    seg[seg == 3] = 4
    seg = np.sort(seg)
    return data, seg, n


def test_segment_sum_mean_max_min_std_match_torch():
    data, seg, n = _fixture()
    td = torch.tensor(data)
    ts = torch.tensor(seg.astype(np.int64))

    golden = {
        "sum": tr._scatter_sum(td, ts, n).numpy(),
        "mean": tr._scatter_mean(td, ts, n).numpy(),
        "max": tr._scatter_max(td, ts, n).numpy(),
        "min": tr._scatter_min(td, ts, n).numpy(),
        "std": tr._scatter_std(td, ts, n).numpy(),
    }

    got = {
        "sum": segment.segment_sum(data, seg, n),
        "mean": segment.segment_mean(data, seg, n),
        "max": segment.segment_max(data, seg, n),
        "min": segment.segment_min(data, seg, n),
        "std": segment.segment_std(data, seg, n),
    }
    for k in golden:
        np.testing.assert_allclose(
            np.asarray(got[k]), golden[k], atol=EPS, rtol=1e-5, err_msg=k
        )


def test_segment_multi_matches_individual():
    data, seg, n = _fixture(seed=1)
    multi = segment.segment_multi(
        data, seg, n, ("max", "min", "mean", "std", "sum")
    )
    np.testing.assert_allclose(
        np.asarray(multi["sum"]), np.asarray(segment.segment_sum(data, seg, n))
    )
    np.testing.assert_allclose(
        np.asarray(multi["std"]),
        np.asarray(segment.segment_std(data, seg, n)),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(multi["max"]), np.asarray(segment.segment_max(data, seg, n))
    )


def test_empty_segments_are_zero():
    data, seg, n = _fixture(seed=2)
    for fn in (
        segment.segment_mean,
        segment.segment_max,
        segment.segment_min,
    ):
        out = np.asarray(fn(data, seg, n))
        assert np.all(out[3] == 0.0), fn.__name__


def test_segment_softmax_sums_to_one():
    data, seg, n = _fixture(seed=3, f=1)
    logits = data[:, 0]
    sm = np.asarray(segment.segment_softmax(logits, seg, n))
    sums = np.zeros(n)
    np.add.at(sums, seg, sm)
    present = np.unique(seg)
    np.testing.assert_allclose(sums[present], 1.0, atol=1e-6)


def test_contiguous_segment_max_matches_segment_max():
    """The gather-window max (round 4: XLA's scatter-max measured 219 us
    on chip, block_insitu.json) must agree with jax.ops.segment_max on
    every REAL graph under both packings; ghost rows are masked
    downstream and may differ."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gnnbuilder_tpu.core.graph import build_graph_batch
    from gnnbuilder_tpu.data.datasets import FakeDataset
    from gnnbuilder_tpu.ops import segment

    graphs = FakeDataset(num_graphs=9, avg_num_nodes=11, node_dim=8, seed=2)
    for blk in (0, 128):
        b = build_graph_batch(graphs, block_size=blk or None)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(b.num_nodes, 8))
        ).astype(jnp.float32)
        ref = segment.segment_max(
            x, b.node_graph, b.num_graphs,
            count=b.n_node.astype(x.dtype)[:, None],
        )
        got = segment.contiguous_segment_max(
            x, b.graph_starts, b.n_node, b.max_graph_nodes_static
        )
        real = np.asarray(b.graph_mask, bool)
        np.testing.assert_allclose(
            np.asarray(got)[real], np.asarray(ref)[real], rtol=1e-6
        )
        # gradients route to the same argmax rows
        f_ref = lambda v: (segment.segment_max(
            v, b.node_graph, b.num_graphs,
            count=b.n_node.astype(v.dtype)[:, None]) * real[:, None]).sum()
        f_got = lambda v: (segment.contiguous_segment_max(
            v, b.graph_starts, b.n_node, b.max_graph_nodes_static
        ) * real[:, None]).sum()
        np.testing.assert_allclose(
            np.asarray(jax.grad(f_got)(x)), np.asarray(jax.grad(f_ref)(x)),
            rtol=1e-6,
        )
