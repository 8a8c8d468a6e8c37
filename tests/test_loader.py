"""GraphLoader: shared-bucket invariant, background prefetch, shuffling,
training integration."""

import numpy as np

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.data.datasets import FakeDataset
from gnnbuilder_tpu.data.loader import GraphLoader


def test_loader_shared_bucket_and_masks():
    graphs = FakeDataset(num_graphs=20, avg_num_nodes=12, node_dim=8, seed=1)
    loader = GraphLoader(graphs, batch_size=8, prefetch=2)
    shapes = set()
    total_real = 0
    for batch, target in loader.epoch():
        shapes.add((batch.num_nodes, batch.num_edges, batch.num_graphs))
        assert target.shape == (batch.num_graphs, 1)
        total_real += int(np.asarray(batch.graph_mask).sum())
    assert len(shapes) == 1, "all batches must share one bucket"
    assert total_real == 16  # drop_last with 20 graphs at bs=8
    assert len(loader) == 2


def test_loader_shuffle_changes_order_between_epochs():
    graphs = FakeDataset(num_graphs=12, avg_num_nodes=10, node_dim=8, seed=2)
    loader = GraphLoader(graphs, batch_size=4, shuffle=True, prefetch=0)
    e1 = [np.asarray(b.node_feat).sum() for b, _ in loader.epoch()]
    e2 = [np.asarray(b.node_feat).sum() for b, _ in loader.epoch()]
    assert e1 != e2


def test_loader_trains():
    import jax
    import optax

    from gnnbuilder_tpu.train import make_train_step

    graphs = FakeDataset(num_graphs=16, avg_num_nodes=10, node_dim=8, seed=3)
    loader = GraphLoader(graphs, batch_size=8, shuffle=True)
    model = gnnb.GNNModel(
        graph_input_feature_dim=8, gnn_hidden_dim=8, gnn_num_layers=2,
        gnn_output_dim=8, gnn_conv="gcn", pooling_aggrs=("mean",),
        mlp_out_dim=1,
    )
    b0, _ = next(iter(loader.epoch()))
    params = model.init(jax.random.PRNGKey(0), b0)
    tx = optax.adam(1e-2)
    step = make_train_step(model, tx, donate=False)
    opt_state = tx.init(params)
    losses = []
    for _ in range(5):
        for batch, target in loader.epoch():
            params, opt_state, loss = step(params, opt_state, batch, target)
            losses.append(float(loss))
    # synthetic targets: epoch-average loss should trend down
    assert np.mean(losses[-2:]) < np.mean(losses[:2]), losses


def test_epoch_abandoned_early_does_not_leak_producer():
    """Breaking out of epoch() must cancel the producer thread (round-1
    advisor finding: blocking q.put leaked the thread per abandoned epoch)."""
    import threading
    import time

    graphs = FakeDataset(num_graphs=64, avg_num_nodes=10, node_dim=8, seed=4)
    loader = GraphLoader(graphs, batch_size=4, prefetch=1)
    before = threading.active_count()
    for i, (batch, tgt) in enumerate(loader.epoch()):
        if i == 1:
            break  # abandon mid-epoch with the queue full
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_loader_block_packed_batches():
    """block_size routes the loader through the bin-packed layout with a
    worst-case shared bucket (every batch validates, same jit signature)."""
    import jax

    from gnnbuilder_tpu.core.validate import validate_batch
    from gnnbuilder_tpu.data.datasets import load_dataset
    from gnnbuilder_tpu.data.loader import GraphLoader

    graphs = load_dataset("qm9", n=100, seed=2)
    ld = GraphLoader(graphs, batch_size=32, shuffle=True, block_size=128)
    shapes = set()
    n = 0
    for b, y in ld.epoch():
        validate_batch(b)
        assert b.block_size_static == 128
        assert b.block_adj is not None
        shapes.add((b.num_nodes, b.num_edges, b.num_graphs))
        n += 1
    assert n == len(ld)
    assert len(shapes) == 1  # one bucket -> one executable
