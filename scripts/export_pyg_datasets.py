"""Export MoleculeNet/QM9 datasets from torch_geometric to the .npz format
this framework reads (data/datasets._load_npz via GNNB_DATA_ROOT).

Run this on a machine WITH torch_geometric and network access (this repo's
environment has neither — datasets synthesize statistics-matched graphs
otherwise):

    python scripts/export_pyg_datasets.py --root /data/gnnb --out /data/npz
    GNNB_DATA_ROOT=/data/npz python bench.py

Format per dataset (one .npz): ragged arrays flattened with index vectors —
  x        [sum_n, F] float32      node features
  ei       [2, sum_e] int64        edge lists (graph-local ids)
  y        [G, T] float32          targets
  n_node   [G] int64               nodes per graph
  n_edge   [G] int64               edges per graph
  edge_attr(optional) [sum_e, Fe] float32
"""

from __future__ import annotations

import argparse
import os

import numpy as np

PYG_NAMES = {
    "esol": ("MoleculeNet", "ESOL"),
    "freesolv": ("MoleculeNet", "FreeSolv"),
    "lipo": ("MoleculeNet", "Lipo"),
    "hiv": ("MoleculeNet", "HIV"),
    "qm9": ("QM9", None),
}


def export(name: str, root: str, out_dir: str) -> str:
    import torch_geometric.datasets as D

    loader, sub = PYG_NAMES[name]
    if loader == "MoleculeNet":
        ds = D.MoleculeNet(root, name=sub)
    else:
        ds = D.QM9(root)

    xs, eis, eattrs, ys, n_node, n_edge = [], [], [], [], [], []
    has_ea = ds[0].edge_attr is not None
    for d in ds:
        xs.append(d.x.numpy().astype(np.float32))
        eis.append(d.edge_index.numpy().astype(np.int64))
        if has_ea:
            eattrs.append(d.edge_attr.numpy().astype(np.float32))
        ys.append(d.y.numpy().astype(np.float32).reshape(-1))
        n_node.append(d.num_nodes)
        n_edge.append(d.edge_index.shape[1])

    t = min(len(y) for y in ys)
    payload = dict(
        x=np.concatenate(xs, 0),
        ei=np.concatenate(eis, 1),
        y=np.stack([y[:t] for y in ys]),
        n_node=np.asarray(n_node, np.int64),
        n_edge=np.asarray(n_edge, np.int64),
    )
    if has_ea:
        payload["edge_attr"] = np.concatenate(eattrs, 0)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.npz")
    np.savez_compressed(path, **payload)
    print(f"{name}: {len(n_node)} graphs -> {path}")
    return path


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True, help="PyG download root")
    ap.add_argument("--out", required=True, help="output .npz directory")
    ap.add_argument("--datasets", default=",".join(PYG_NAMES))
    args = ap.parse_args()
    for name in args.datasets.split(","):
        export(name, args.root, args.out)


if __name__ == "__main__":
    main()
