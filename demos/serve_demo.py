"""Serving demo: export a compiled artifact, stream requests, report
p50/p99.

The deployable-artifact flow the reference drives with Vitis
(demos/demo.py:121-132 -> .xclbin), TPU-native: train briefly, export a
StableHLO artifact, reload it WITHOUT the model definition, and serve a
Poisson-ish request stream through the micro-batching frontend
(gnnbuilder_tpu/serve.py).

    python demos/serve_demo.py [--requests 400] [--dataset esol]

Runs on whatever backend is default (real TPU under axon; CPU works too).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--requests", type=int, default=400)
    ap.add_argument("--dataset", default="esol")
    ap.add_argument("--batch", type=int, default=32, help="max micro-batch")
    ap.add_argument("--rate", type=float, default=2000.0,
                    help="offered load, requests/s")
    ap.add_argument("--precision", default="f32",
                    choices=["f32", "bf16", "int8"])
    args = ap.parse_args()

    import jax

    import gnnbuilder_tpu as gnnb
    from gnnbuilder_tpu.data.datasets import load_dataset
    from gnnbuilder_tpu.serve import GNNServer

    print(f"backend: {jax.default_backend()}")
    graphs = load_dataset(args.dataset, n=max(args.requests, 200))
    model = gnnb.GNNModel(
        graph_input_feature_dim=graphs[0].x.shape[1],
        gnn_hidden_dim=64, gnn_num_layers=3, gnn_output_dim=32,
        gnn_conv="gcn", pooling_aggrs=("add", "mean", "max"),
        mlp_hidden_dim=64, mlp_hidden_layers=2, mlp_out_dim=1,
    )
    prog = gnnb.Program.from_dataset(
        model, graphs, batch_size=args.batch, precision=args.precision
    )
    example = prog.batch(graphs[: args.batch])
    prog.init_params(example)
    if args.precision == "int8":
        print("calibrating static int8 activation scales...")
        prog.calibrate_int8([example])

    path = os.path.join(os.path.dirname(__file__), "_serve_artifact.bin")
    t0 = time.perf_counter()
    prog.export(path, example)
    print(f"exported artifact: {os.path.getsize(path)/1e6:.1f} MB "
          f"in {time.perf_counter()-t0:.1f}s -> {path}")

    # reload cold, as a deployment would (no model definition needed)
    server = GNNServer.from_artifact(
        path, prog.params, max_batch=args.batch, max_wait_ms=2.0
    )
    # warm the executable through the server before timing
    server.predict(graphs[:2])

    print(f"streaming {args.requests} requests at ~{args.rate:.0f}/s ...")
    rng = np.random.default_rng(0)
    futs = []
    t0 = time.perf_counter()
    for i in range(args.requests):
        futs.append(server.submit(graphs[i % len(graphs)]))
        time.sleep(float(rng.exponential(1.0 / args.rate)))
    for f in futs:
        f.result(timeout=120.0)
    wall = time.perf_counter() - t0

    s = server.stats()
    print(
        f"served {s['served']} requests in {wall:.2f}s "
        f"({s['served']/wall:.0f}/s sustained), "
        f"{s['batches']} device batches (avg {s['avg_batch']:.1f} graphs)"
    )
    print(
        f"request latency: p50 {s['p50_ms']:.2f} ms, "
        f"p90 {s['p90_ms']:.2f} ms, p99 {s['p99_ms']:.2f} ms"
    )
    server.close()
    os.unlink(path)


if __name__ == "__main__":
    main()
