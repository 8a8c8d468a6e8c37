"""Dataset loading: flat .npz round trip (scripts/export_pyg_datasets.py
format), synthetic fallback, and model-spec validation errors."""

import os

import numpy as np
import pytest

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.data.datasets import DATASET_SPECS, load_dataset


def test_flat_npz_roundtrip(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    xs, eis, ys, nn, ne = [], [], [], [], []
    for i in range(4):
        n, e = 5 + i, 2 * (5 + i)
        xs.append(rng.standard_normal((n, 9)).astype(np.float32))
        eis.append(rng.integers(0, n, (2, e)).astype(np.int64))
        ys.append([float(i)])
        nn.append(n)
        ne.append(e)
    np.savez(
        tmp_path / "esol.npz",
        x=np.concatenate(xs, 0), ei=np.concatenate(eis, 1),
        y=np.asarray(ys, np.float32),
        n_node=np.asarray(nn), n_edge=np.asarray(ne),
    )
    monkeypatch.setenv("GNNB_DATA_ROOT", str(tmp_path))
    gs = load_dataset("esol", n=None)
    assert len(gs) == 4
    np.testing.assert_allclose(gs[2].x, xs[2])
    np.testing.assert_array_equal(gs[2].edge_index, eis[2])
    # n truncation
    assert len(load_dataset("esol", n=2)) == 2


def test_synthetic_fallback_matches_spec():
    gs = load_dataset("qm9", n=32)
    spec = DATASET_SPECS["qm9"]
    assert all(g.x.shape[1] == spec.node_dim for g in gs)
    assert len(gs) == 32


def test_unknown_dataset_and_conv_raise():
    with pytest.raises(ValueError, match="unknown dataset"):
        load_dataset("nope")
    with pytest.raises(ValueError, match="conv"):
        gnnb.GNNModel(
            graph_input_feature_dim=4, gnn_hidden_dim=4, gnn_num_layers=1,
            gnn_output_dim=4, gnn_conv="nope",
        )
    with pytest.raises(ValueError):
        gnnb.GNNModel(
            graph_input_feature_dim=4, gnn_hidden_dim=4, gnn_num_layers=1,
            gnn_output_dim=4, gnn_conv="gcn", pooling_aggrs=("bogus",),
        )
