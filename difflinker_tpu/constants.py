"""Chemical vocabularies, bond tables and dataset constants.

TPU-native rewrite of the reference tables (see /root/reference/src/const.py:14-218).
These are *data*, not code: atom vocabularies, covalent-bond length tables (pm) and
linker-size statistics must match the reference exactly for metric parity. Everything
here is framework-agnostic numpy / plain python — no torch, no rdkit.
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Atom vocabularies (reference: src/const.py:14-36)
# ---------------------------------------------------------------------------

# ZINC vocabulary (8 heavy-atom types)
ATOM2IDX = {'C': 0, 'O': 1, 'N': 2, 'F': 3, 'S': 4, 'Cl': 5, 'Br': 6, 'I': 7}
IDX2ATOM = {v: k for k, v in ATOM2IDX.items()}
CHARGES = {'C': 6, 'O': 8, 'N': 7, 'F': 9, 'S': 16, 'Cl': 17, 'Br': 35, 'I': 53}
NUMBER_OF_ATOM_TYPES = len(ATOM2IDX)

# GEOM / MOAD vocabulary (adds phosphorus)
GEOM_ATOM2IDX = {'C': 0, 'O': 1, 'N': 2, 'F': 3, 'S': 4, 'Cl': 5, 'Br': 6, 'I': 7, 'P': 8}
GEOM_IDX2ATOM = {v: k for k, v in GEOM_ATOM2IDX.items()}
GEOM_CHARGES = {'C': 6, 'O': 8, 'N': 7, 'F': 9, 'S': 16, 'Cl': 17, 'Br': 35, 'I': 53, 'P': 15}
GEOM_NUMBER_OF_ATOM_TYPES = len(GEOM_ATOM2IDX)


def vocab_for(is_geom: bool):
    """Return (atom2idx, idx2atom, charges) for the dataset family."""
    if is_geom:
        return GEOM_ATOM2IDX, GEOM_IDX2ATOM, GEOM_CHARGES
    return ATOM2IDX, IDX2ATOM, CHARGES


# ---------------------------------------------------------------------------
# Batch dictionary keys (reference: src/const.py:39-47)
# ---------------------------------------------------------------------------

DATA_LIST_ATTRS = {'uuid', 'name', 'fragments_smi', 'linker_smi', 'num_atoms'}
DATA_ATTRS_TO_PAD = {
    'positions', 'one_hot', 'charges', 'anchors',
    'fragment_mask', 'linker_mask', 'pocket_mask', 'fragment_only_mask',
}
DATA_ATTRS_TO_ADD_LAST_DIM = {
    'charges', 'anchors', 'fragment_mask', 'linker_mask', 'pocket_mask', 'fragment_only_mask',
}

# ---------------------------------------------------------------------------
# Linker-size training histogram (ZINC; reference: src/const.py:50-61)
# ---------------------------------------------------------------------------

LINKER_SIZE_DIST = {
    3: 113928, 4: 85540, 5: 77671, 6: 70946, 7: 30408,
    8: 12712, 9: 5177, 10: 1214, 11: 158, 12: 7,
}

# ---------------------------------------------------------------------------
# Covalent bond length tables in picometres (reference: src/const.py:68-139;
# original sources: wiredchemist.com & chemistry-reference.com tables).
# ---------------------------------------------------------------------------

BONDS_1 = {
    'H': {'H': 74, 'C': 109, 'N': 101, 'O': 96, 'F': 92, 'B': 119, 'Si': 148,
          'P': 144, 'As': 152, 'S': 134, 'Cl': 127, 'Br': 141, 'I': 161},
    'C': {'H': 109, 'C': 154, 'N': 147, 'O': 143, 'F': 135, 'Si': 185, 'P': 184,
          'S': 182, 'Cl': 177, 'Br': 194, 'I': 214},
    'N': {'H': 101, 'C': 147, 'N': 145, 'O': 140, 'F': 136, 'Cl': 175, 'Br': 214,
          'S': 168, 'I': 222, 'P': 177},
    'O': {'H': 96, 'C': 143, 'N': 140, 'O': 148, 'F': 142, 'Br': 172, 'S': 151,
          'P': 163, 'Si': 163, 'Cl': 164, 'I': 194},
    'F': {'H': 92, 'C': 135, 'N': 136, 'O': 142, 'F': 142, 'S': 158, 'Si': 160,
          'Cl': 166, 'Br': 178, 'P': 156, 'I': 187},
    'B': {'H': 119, 'Cl': 175},
    'Si': {'Si': 233, 'H': 148, 'C': 185, 'O': 163, 'S': 200, 'F': 160,
           'Cl': 202, 'Br': 215, 'I': 243},
    'Cl': {'Cl': 199, 'H': 127, 'C': 177, 'N': 175, 'O': 164, 'P': 203, 'S': 207,
           'B': 175, 'Si': 202, 'F': 166, 'Br': 214},
    'S': {'H': 134, 'C': 182, 'N': 168, 'O': 151, 'S': 204, 'F': 158, 'Cl': 207,
          'Br': 225, 'Si': 200, 'P': 210, 'I': 234},
    'Br': {'Br': 228, 'H': 141, 'C': 194, 'O': 172, 'N': 214, 'Si': 215, 'S': 225,
           'F': 178, 'Cl': 214, 'P': 222},
    'P': {'P': 221, 'H': 144, 'C': 184, 'O': 163, 'Cl': 203, 'S': 210, 'F': 156,
          'N': 177, 'Br': 222},
    'I': {'H': 161, 'C': 214, 'Si': 243, 'N': 222, 'O': 194, 'S': 234, 'F': 187,
          'I': 266},
    'As': {'H': 152},
}

BONDS_2 = {
    'C': {'C': 134, 'N': 129, 'O': 120, 'S': 160},
    'N': {'C': 129, 'N': 125, 'O': 121},
    'O': {'C': 120, 'N': 121, 'O': 121, 'P': 150},
    'P': {'O': 150, 'S': 186},
    'S': {'P': 186},
}

BONDS_3 = {
    'C': {'C': 120, 'N': 116, 'O': 113},
    'N': {'C': 116, 'N': 110},
    'O': {'C': 113},
}

# Distance margins (pm) added to single/double/triple bond thresholds
# (reference: src/const.py:175).
MARGINS_EDM = (10, 5, 2)

ALLOWED_BONDS = {
    'H': 1, 'C': 4, 'N': 3, 'O': 2, 'F': 1, 'B': 3, 'Al': 3, 'Si': 4,
    'P': (3, 5), 'S': 4, 'Cl': 1, 'As': 3, 'Br': 1, 'I': 1,
    'Hg': (1, 2), 'Bi': (3, 5),
}

# ---------------------------------------------------------------------------
# Dense bond-order threshold tensors for vectorised bond perception.
#
# The reference decides bond order with nested python dict lookups per atom pair
# (src/molecule_builder.py:78-102). Here we pre-bake the same tables into dense
# (n_types, n_types) arrays over the GEOM vocabulary so bond perception over a
# whole molecule is a single vectorised comparison (chem/bonds.py).
# ---------------------------------------------------------------------------


def _dense_threshold_table(bond_dict, margin, idx2atom):
    n = len(idx2atom)
    table = np.full((n, n), -1.0, dtype=np.float32)
    for i in range(n):
        for j in range(n):
            a, b = idx2atom[i], idx2atom[j]
            # Reference sorts the pair by type index before lookup
            # (src/molecule_builder.py:66), so the table is symmetrised the same way.
            lo, hi = (a, b) if i <= j else (b, a)
            if lo in bond_dict and hi in bond_dict[lo]:
                table[i, j] = bond_dict[lo][hi] + margin
    return table


# Thresholds in picometres; -1 means "no such bond exists for this pair".
BOND1_THRESHOLD = _dense_threshold_table(BONDS_1, MARGINS_EDM[0], GEOM_IDX2ATOM)
BOND2_THRESHOLD = _dense_threshold_table(BONDS_2, MARGINS_EDM[1], GEOM_IDX2ATOM)
BOND3_THRESHOLD = _dense_threshold_table(BONDS_3, MARGINS_EDM[2], GEOM_IDX2ATOM)

# Max valence per GEOM vocab index (min allowed when a tuple; used by the
# pure-python validity checker in chem/molgraph.py).
MAX_VALENCE = np.array(
    [ALLOWED_BONDS[GEOM_IDX2ATOM[i]] if isinstance(ALLOWED_BONDS[GEOM_IDX2ATOM[i]], int)
     else max(ALLOWED_BONDS[GEOM_IDX2ATOM[i]])
     for i in range(GEOM_NUMBER_OF_ATOM_TYPES)],
    dtype=np.int32,
)

# ---------------------------------------------------------------------------
# Linker-size classifier label spaces (reference: src/const.py:181-218)
# ---------------------------------------------------------------------------

ZINC_TRAIN_LINKER_ID2SIZE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 12]
ZINC_TRAIN_LINKER_SIZE2ID = {s: i for i, s in enumerate(ZINC_TRAIN_LINKER_ID2SIZE)}
ZINC_TRAIN_LINKER_SIZE_WEIGHTS = [
    3.47347831e-01, 4.63079100e-01, 5.12370917e-01, 5.62392614e-01,
    1.30294388e+00, 3.24247801e+00, 8.12391184e+00, 3.45634358e+01,
    2.72428571e+02, 6.26585714e+03,
]

GEOM_TRAIN_LINKER_ID2SIZE = [
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 36, 38, 41,
]
GEOM_TRAIN_LINKER_SIZE2ID = {s: i for i, s in enumerate(GEOM_TRAIN_LINKER_ID2SIZE)}
GEOM_TRAIN_LINKER_SIZE_WEIGHTS = [
    1.07790681e+00, 4.54693604e-01, 3.62575713e-01, 3.75199484e-01,
    3.67812588e-01, 3.92388528e-01, 3.83421054e-01, 4.26924670e-01,
    4.92768040e-01, 4.99761944e-01, 4.92342726e-01, 5.71456905e-01,
    7.30631393e-01, 8.45412928e-01, 9.97252243e-01, 1.25423985e+00,
    1.57316129e+00, 2.19902962e+00, 3.22640431e+00, 4.25481066e+00,
    6.34749573e+00, 9.00676236e+00, 1.43084017e+01, 2.25763173e+01,
    3.36867096e+01, 9.50713805e+01, 2.08693274e+02, 2.51659537e+02,
    7.77856749e+02, 8.55642424e+03, 8.55642424e+03, 4.27821212e+03,
    4.27821212e+03,
]

# Size buckets for fixed-shape padded batches (TPU design choice — the reference
# re-collates to exact sizes per batch; we pad to the nearest bucket instead so
# every (bucket, batch) pair compiles exactly once).
DEFAULT_SIZE_BUCKETS = (16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024)
