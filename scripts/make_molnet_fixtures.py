"""Build tiny REAL-molecule fixtures for freesolv / lipo / hiv / qm9 in
the exact flat ragged .npz format scripts/export_pyg_datasets.py emits —
the remaining four datasets joining the ESOL fixture
(scripts/make_esol_fixture.py), so real-data ingestion parity is not
ESOL-only (VERDICT r3 item 9).

No egress / rdkit / PyG in this environment, so molecules are HAND-
ENCODED real topologies:

* freesolv — heavy-atom graphs (PyG 9-dim atom / 3-dim bond features,
  like ESOL) with published experimental hydration free energies
  (kcal/mol, FreeSolv database values).
* lipo     — same encoding; targets are published octanol-water
  lipophilicity (logP) measurements standing in for the dataset's
  logD7.4 column (ingestion fixture, not a chemistry benchmark).
* hiv      — same encoding; binary activity labels: zidovudine (AZT, an
  approved anti-HIV nucleoside analog) = 1, common inactive small
  molecules = 0.
* qm9      — PyG QM9 conventions: EXPLICIT hydrogens, 11-dim atom
  features [one-hot H/C/N/O/F, Z, aromatic, sp, sp2, sp3, num_Hs] and
  4-dim one-hot bond type; targets are gas-phase dipole moments (Debye).

Run:  python scripts/make_molnet_fixtures.py   (deterministic output)
"""

from __future__ import annotations

import os

import numpy as np

SP3, SP2, SP = 4, 3, 2  # rdkit HybridizationType enum values

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)


# --- the ESOL-style 9/3 encoding (molecule-net datasets) --------------------


def atom(z, deg, hs, hyb, arom=0, ring=0, charge=0):
    return [z, 0, deg, charge, hs, 0, hyb, arom, ring]


def mol(atoms, bonds, y):
    """atoms: 9-dim rows; bonds: (u, v, type, conj); both edge directions."""
    x = np.array(atoms, np.float32)
    src, dst, ea = [], [], []
    for u, v, bt, conj in bonds:
        src += [u, v]
        dst += [v, u]
        ea += [[bt, 0, conj]] * 2
    ei = (np.array([src, dst], np.int64) if src
          else np.zeros((2, 0), np.int64))
    ea = (np.array(ea, np.float32) if ea
          else np.zeros((0, 3), np.float32))
    return x, ei, ea, np.float32([y])


def ring6(kind=6):
    return [atom(kind, 2, 1, SP2, arom=1, ring=1) for _ in range(6)]


def ring6_bonds():
    return [(i, (i + 1) % 6, 12, 1) for i in range(6)]


METHANOL = (
    [atom(6, 1, 3, SP3), atom(8, 1, 1, SP3)],
    [(0, 1, 1, 0)],
)
ETHANOL = (
    [atom(6, 1, 3, SP3), atom(6, 2, 2, SP3), atom(8, 1, 1, SP3)],
    [(0, 1, 1, 0), (1, 2, 1, 0)],
)
METHANE = ([atom(6, 0, 4, SP3)], [])
BENZENE = (ring6(), ring6_bonds())
PHENOL = (
    [atom(6, 2, 1, SP2, arom=1, ring=1) for _ in range(5)]
    + [atom(6, 3, 0, SP2, arom=1, ring=1), atom(8, 1, 1, SP3)],
    ring6_bonds() + [(5, 6, 1, 0)],
)
TOLUENE = (
    [atom(6, 2, 1, SP2, arom=1, ring=1) for _ in range(5)]
    + [atom(6, 3, 0, SP2, arom=1, ring=1), atom(6, 1, 3, SP3)],
    ring6_bonds() + [(5, 6, 1, 0)],
)
PYRIDINE = (
    [atom(6, 2, 1, SP2, arom=1, ring=1) for _ in range(3)]
    + [atom(7, 2, 0, SP2, arom=1, ring=1)]
    + [atom(6, 2, 1, SP2, arom=1, ring=1) for _ in range(2)],
    ring6_bonds(),
)
CAFFEINE = (
    [
        atom(6, 1, 3, SP3), atom(7, 3, 0, SP2, ring=1),
        atom(6, 3, 0, SP2, ring=1), atom(8, 1, 0, SP2),
        atom(7, 3, 0, SP2, ring=1), atom(6, 1, 3, SP3),
        atom(6, 3, 0, SP2, ring=1), atom(8, 1, 0, SP2),
        atom(6, 3, 0, SP2, arom=1, ring=1),
        atom(6, 3, 0, SP2, arom=1, ring=1),
        atom(7, 3, 0, SP2, arom=1, ring=1), atom(6, 1, 3, SP3),
        atom(6, 2, 1, SP2, arom=1, ring=1),
        atom(7, 2, 0, SP2, arom=1, ring=1),
    ],
    [
        (0, 1, 1, 0), (1, 2, 1, 1), (2, 3, 2, 1), (2, 4, 1, 1),
        (4, 5, 1, 0), (4, 6, 1, 1), (6, 7, 2, 1), (6, 8, 1, 1),
        (8, 9, 12, 1), (9, 1, 1, 1), (8, 13, 12, 1), (13, 12, 12, 1),
        (12, 10, 12, 1), (10, 9, 12, 1), (10, 11, 1, 0),
    ],
)
# zidovudine (AZT): thymine + 2'-deoxyribose + 3'-azide, heavy atoms
AZT = (
    [
        atom(7, 3, 0, SP2, ring=1),   # 0  N1
        atom(6, 3, 0, SP2, ring=1),   # 1  C2
        atom(8, 1, 0, SP2),           # 2  O2
        atom(7, 2, 1, SP2, ring=1),   # 3  N3 (H)
        atom(6, 3, 0, SP2, ring=1),   # 4  C4
        atom(8, 1, 0, SP2),           # 5  O4
        atom(6, 3, 0, SP2, ring=1),   # 6  C5
        atom(6, 1, 3, SP3),           # 7  C7 (5-methyl)
        atom(6, 2, 1, SP2, ring=1),   # 8  C6
        atom(6, 3, 1, SP3, ring=1),   # 9  C1'
        atom(8, 2, 0, SP3, ring=1),   # 10 O4'
        atom(6, 2, 2, SP3, ring=1),   # 11 C2'
        atom(6, 3, 1, SP3, ring=1),   # 12 C3'
        atom(6, 3, 1, SP3, ring=1),   # 13 C4'
        atom(6, 2, 2, SP3),           # 14 C5'
        atom(8, 1, 1, SP3),           # 15 O5' (OH)
        atom(7, 2, 0, SP),            # 16 N-alpha (azide)
        atom(7, 2, 0, SP, charge=1),  # 17 N-beta
        atom(7, 1, 0, SP, charge=-1),  # 18 N-gamma
    ],
    [
        (0, 1, 1, 1), (1, 2, 2, 1), (1, 3, 1, 1), (3, 4, 1, 1),
        (4, 5, 2, 1), (4, 6, 1, 1), (6, 7, 1, 0), (6, 8, 2, 1),
        (8, 0, 1, 1), (0, 9, 1, 0), (9, 10, 1, 0), (10, 13, 1, 0),
        (9, 11, 1, 0), (11, 12, 1, 0), (12, 13, 1, 0), (13, 14, 1, 0),
        (14, 15, 1, 0), (12, 16, 1, 0), (16, 17, 2, 0), (17, 18, 2, 0),
    ],
)

# published experimental hydration free energies (kcal/mol, FreeSolv)
FREESOLV = [
    mol(*METHANOL, y=-5.11),
    mol(*ETHANOL, y=-5.00),
    mol(*METHANE, y=2.00),
    mol(*BENZENE, y=-0.87),
    mol(*PHENOL, y=-6.62),
    mol(*TOLUENE, y=-0.89),
]

# published lipophilicity (logP) measurements
LIPO = [
    mol(*BENZENE, y=2.13),
    mol(*TOLUENE, y=2.73),
    mol(*PHENOL, y=1.46),
    mol(*PYRIDINE, y=0.65),
    mol(*CAFFEINE, y=-0.07),
    mol(*ETHANOL, y=-0.31),
]

# AIDS antiviral screen labels: AZT active, common small molecules not
HIV = [
    mol(*AZT, y=1.0),
    mol(*BENZENE, y=0.0),
    mol(*PHENOL, y=0.0),
    mol(*PYRIDINE, y=0.0),
    mol(*CAFFEINE, y=0.0),
    mol(*ETHANOL, y=0.0),
]


# --- QM9 encoding: explicit hydrogens, 11-dim atoms, 4-dim bonds ------------

_Z_COL = {1: 0, 6: 1, 7: 2, 8: 3, 9: 4}


def qatom(z, hyb=0, nh=0):
    row = [0.0] * 11
    row[_Z_COL[z]] = 1.0
    row[5] = float(z)
    row[6] = 0.0  # aromatic
    if hyb == SP:
        row[7] = 1.0
    elif hyb == SP2:
        row[8] = 1.0
    elif hyb == SP3:
        row[9] = 1.0
    row[10] = float(nh)
    return row


def qmol(atoms, bonds, y):
    """atoms: 11-dim rows; bonds: (u, v, order 1/2/3); both directions."""
    x = np.array(atoms, np.float32)
    src, dst, ea = [], [], []
    onehot = {1: [1, 0, 0, 0], 2: [0, 1, 0, 0], 3: [0, 0, 1, 0]}
    for u, v, bt in bonds:
        src += [u, v]
        dst += [v, u]
        ea += [onehot[bt]] * 2
    ei = (np.array([src, dst], np.int64) if src
          else np.zeros((2, 0), np.int64))
    ea = (np.array(ea, np.float32) if ea
          else np.zeros((0, 4), np.float32))
    return x, ei, ea, np.float32([y])


H = lambda: qatom(1)

# targets: gas-phase dipole moments (Debye)
QM9 = [
    # methane CH4, mu = 0
    qmol([qatom(6, SP3, 4)] + [H() for _ in range(4)],
         [(0, i, 1) for i in range(1, 5)], 0.0),
    # water H2O, mu = 1.85
    qmol([qatom(8, SP3, 2), H(), H()], [(0, 1, 1), (0, 2, 1)], 1.85),
    # ammonia NH3, mu = 1.47
    qmol([qatom(7, SP3, 3), H(), H(), H()],
         [(0, i, 1) for i in range(1, 4)], 1.47),
    # methanol CH3OH, mu = 1.70
    qmol(
        [qatom(6, SP3, 3), qatom(8, SP3, 1)]
        + [H() for _ in range(4)],
        [(0, 1, 1), (0, 2, 1), (0, 3, 1), (0, 4, 1), (1, 5, 1)],
        1.70,
    ),
    # acetonitrile CH3CN, mu = 3.92
    qmol(
        [qatom(6, SP3, 3), qatom(6, SP, 0), qatom(7, SP, 0)]
        + [H() for _ in range(3)],
        [(0, 1, 1), (1, 2, 3), (0, 3, 1), (0, 4, 1), (0, 5, 1)],
        3.92,
    ),
    # ethanol C2H5OH, mu = 1.69
    qmol(
        [qatom(6, SP3, 3), qatom(6, SP3, 2), qatom(8, SP3, 1)]
        + [H() for _ in range(6)],
        [(0, 1, 1), (1, 2, 1), (0, 3, 1), (0, 4, 1), (0, 5, 1),
         (1, 6, 1), (1, 7, 1), (2, 8, 1)],
        1.69,
    ),
]


def write(name, molecules):
    xs, eis, eas, ys, n_node, n_edge = [], [], [], [], [], []
    for x, ei, ea, y in molecules:
        if ei.size:
            assert ei.max() < len(x) and ei.min() >= 0
        xs.append(x)
        eis.append(ei)
        eas.append(ea)
        ys.append(y)
        n_node.append(len(x))
        n_edge.append(ei.shape[1])
    path = os.path.join(OUT_DIR, f"{name}.npz")
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


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    write("freesolv", FREESOLV)
    write("lipo", LIPO)
    write("hiv", HIV)
    write("qm9", QM9)


if __name__ == "__main__":
    main()
