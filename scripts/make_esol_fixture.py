"""Build tests/fixtures/esol.npz — a tiny REAL-molecule ESOL shard in
the exact flat ragged format scripts/export_pyg_datasets.py emits.

This environment has no network egress, no rdkit and no torch_geometric,
so the fixture is HAND-ENCODED from real molecular topologies (heavy-atom
graphs, both edge directions like PyG molecular datasets) with published
ESOL measured log-solubility targets (Delaney 2004).  Feature layout
follows PyG ``from_smiles`` conventions (torch_geometric/utils/smiles.py):

  x[9]  = [atomic_num, chirality, degree, formal_charge, num_Hs,
           num_radical_electrons, hybridization, is_aromatic, is_in_ring]
  e[3]  = [bond_type, stereo, is_conjugated]
        bond_type: 1=single, 2=double, 3=triple, 12=aromatic (rdkit enum)

The fixture's purpose is to pin the real-data INGESTION path
(data/datasets._load_npz_flat -> pack -> forward) against a committed
non-synthetic artifact — the reference's analog is benchmarking on real
MoleculeNet downloads (build_gnnbuilder_benchmarks.py:121-148).

Run:  python scripts/make_esol_fixture.py   (deterministic output)
"""

from __future__ import annotations

import os

import numpy as np

SP3, SP2, SP = 4, 3, 2  # rdkit HybridizationType enum values


def atom(z, deg, hs, hyb, arom=0, ring=0, charge=0):
    return [z, 0, deg, charge, hs, 0, hyb, arom, ring]


def mol(atoms, bonds, y):
    """atoms: list of 9-dim rows; bonds: (u, v, type, conj) undirected."""
    x = np.array(atoms, np.float32)
    src, dst, ea = [], [], []
    for u, v, bt, conj in bonds:
        src += [u, v]
        dst += [v, u]
        ea += [[bt, 0, conj]] * 2
    ei = np.array([src, dst], np.int64)
    return x, ei, np.array(ea, np.float32), np.float32([y])


# --- six real molecules -----------------------------------------------------
MOLECULES = [
    # ethanol CCO, measured log S = -0.77
    mol(
        [atom(6, 1, 3, SP3), atom(6, 2, 2, SP3), atom(8, 1, 1, SP3)],
        [(0, 1, 1, 0), (1, 2, 1, 0)],
        -0.77,
    ),
    # benzene c1ccccc1, log S = -1.64
    mol(
        [atom(6, 2, 1, SP2, arom=1, ring=1) for _ in range(6)],
        [(i, (i + 1) % 6, 12, 1) for i in range(6)],
        -1.64,
    ),
    # acetic acid CC(=O)O, log S = 0.09
    mol(
        [
            atom(6, 1, 3, SP3),
            atom(6, 3, 0, SP2),
            atom(8, 1, 0, SP2),
            atom(8, 1, 1, SP3),
        ],
        [(0, 1, 1, 0), (1, 2, 2, 1), (1, 3, 1, 1)],
        0.09,
    ),
    # phenol c1ccccc1O, log S = -0.04
    mol(
        [atom(6, 2, 1, SP2, arom=1, ring=1) for _ in range(5)]
        + [atom(6, 3, 0, SP2, arom=1, ring=1), atom(8, 1, 1, SP3)],
        [(i, (i + 1) % 6, 12, 1) for i in range(6)] + [(5, 6, 1, 0)],
        -0.04,
    ),
    # pyridine c1ccncc1, log S = 0.76
    mol(
        [atom(6, 2, 1, SP2, arom=1, ring=1) for _ in range(3)]
        + [atom(7, 2, 0, SP2, arom=1, ring=1)]
        + [atom(6, 2, 1, SP2, arom=1, ring=1) for _ in range(2)],
        [(i, (i + 1) % 6, 12, 1) for i in range(6)],
        0.76,
    ),
    # caffeine Cn1cnc2c1c(=O)n(C)c(=O)n2C, log S = -0.88
    # heavy atoms: 0 N1-methyl C, 1 N1, 2 C2(=O), 3 O, 4 N3, 5 N3-methyl C,
    # 6 C4(=O), 7 O, 8 C4a, 9 C8a, 10 N7, 11 N7-methyl C, 12 C8, 13 N9
    mol(
        [
            atom(6, 1, 3, SP3),                      # 0  CH3 on N1
            atom(7, 3, 0, SP2, ring=1),              # 1  N1
            atom(6, 3, 0, SP2, ring=1),              # 2  C2
            atom(8, 1, 0, SP2),                      # 3  O=C2
            atom(7, 3, 0, SP2, ring=1),              # 4  N3
            atom(6, 1, 3, SP3),                      # 5  CH3 on N3
            atom(6, 3, 0, SP2, ring=1),              # 6  C4
            atom(8, 1, 0, SP2),                      # 7  O=C4
            atom(6, 3, 0, SP2, arom=1, ring=1),      # 8  C4a
            atom(6, 3, 0, SP2, arom=1, ring=1),      # 9  C8a
            atom(7, 3, 0, SP2, arom=1, ring=1),      # 10 N7
            atom(6, 1, 3, SP3),                      # 11 CH3 on N7
            atom(6, 2, 1, SP2, arom=1, ring=1),      # 12 C8
            atom(7, 2, 0, SP2, arom=1, ring=1),      # 13 N9
        ],
        [
            (0, 1, 1, 0), (1, 2, 1, 1), (2, 3, 2, 1), (2, 4, 1, 1),
            (4, 5, 1, 0), (4, 6, 1, 1), (6, 7, 2, 1), (6, 8, 1, 1),
            (8, 9, 12, 1), (9, 1, 1, 1), (8, 13, 12, 1), (13, 12, 12, 1),
            (12, 10, 12, 1), (10, 9, 12, 1), (10, 11, 1, 0),
        ],
        -0.88,
    ),
]


def main() -> str:
    xs, eis, eas, ys, n_node, n_edge = [], [], [], [], [], []
    for x, ei, ea, y in MOLECULES:
        assert ei.max() < len(x) and ei.min() >= 0
        xs.append(x)
        eis.append(ei)
        eas.append(ea)
        ys.append(y)
        n_node.append(len(x))
        n_edge.append(ei.shape[1])
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures",
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "esol.npz")
    np.savez_compressed(
        path,
        x=np.concatenate(xs, 0),
        ei=np.concatenate(eis, 1),
        edge_attr=np.concatenate(eas, 0),
        y=np.stack(ys),
        n_node=np.array(n_node, np.int64),
        n_edge=np.array(n_edge, np.int64),
    )
    print(path)
    return path


if __name__ == "__main__":
    main()
