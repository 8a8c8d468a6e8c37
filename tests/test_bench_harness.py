"""Benchmark harness: grid runner + reference-format results files
(the experiments/build_*_benchmarks.py analog)."""

import json
import os

from gnnbuilder_tpu.bench import harness


def test_grid_writes_reference_format(tmp_path):
    rows = harness.run_grid(
        convs=("gcn",),
        datasets=("esol",),
        backends=("tpu", "torch_cpu"),
        results_dir=str(tmp_path),
        verbose=False,
        n_graphs=8,
    )
    assert len(rows) == 2
    # reference flat-file format: one value per metric_backend_conv_dataset
    f = tmp_path / "latency_s_tpu_gcn_esol.txt"
    assert f.exists()
    v = float(f.read_text().strip())
    assert v > 0
    data = json.loads((tmp_path / "results.json").read_text())
    assert {r["backend"] for r in data} == {"tpu", "torch_cpu"}
    tpu = [r for r in data if r["backend"] == "tpu"][0]
    assert tpu["graphs_per_s"] > 0 and tpu["best_batch_size"] in (1, 256)
