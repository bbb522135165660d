"""Framework-native molecular graph with an optional RDKit bridge.

The reference represents generated molecules as RDKit RWMols
(src/molecule_builder.py:28-41) and every metric goes through RDKit. RDKit is
not guaranteed in TPU serving images, so the native representation here is a
plain (types, positions, bond-matrix) triple with pure-python implementations
of the metric primitives (validity ≈ valence check, connectivity, canonical
identity via Weisfeiler-Lehman hashing). When RDKit is importable, `to_rdkit`
produces a real Mol and the metric stack upgrades to exact reference semantics
automatically (chem/metrics.py).
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List

import numpy as np

from difflinker_tpu import constants
from difflinker_tpu.chem.bonds import bond_order_matrix, connected_components

try:
    from rdkit import Chem  # noqa: F401
    # hasattr guard: tolerate partial installs/stubs that only expose enums
    HAS_RDKIT = hasattr(Chem, 'MolFromSmiles')
except ImportError:
    HAS_RDKIT = False


@dataclass
class MolGraph:
    atom_types: np.ndarray   # (N,) GEOM-vocab indices
    positions: np.ndarray    # (N, 3) Angstrom
    bonds: np.ndarray        # (N, N) int8 bond orders

    @property
    def n_atoms(self) -> int:
        return len(self.atom_types)

    @property
    def symbols(self) -> List[str]:
        return [constants.GEOM_IDX2ATOM[int(t)] for t in self.atom_types]

    # -- structural predicates (native fallbacks for RDKit checks) -----------

    def is_connected(self) -> bool:
        """Single connected component (reference is_connected via GetMolFrags,
        src/metrics.py:20-27)."""
        if self.n_atoms == 0:
            return False
        labels = connected_components(self.bonds)
        return bool((labels == labels[0]).all())

    def is_valid(self) -> bool:
        """Valence sanity: no atom exceeds its max allowed bond-order sum
        (ALLOWED_BONDS, src/const.py:156-173). A cheaper stand-in for RDKit
        SanitizeMol when RDKit is unavailable; exact sanitize runs via
        to_rdkit() when it is. MOL-V2000 aromatic bonds (order 4, as authored
        in e.g. the published JNK case-study SDF) count 1.5 valence units
        each — benzene carbon: 2x1.5 + 1 = 4."""
        if self.n_atoms == 0:
            return False
        b = np.where(self.bonds == 4, 1.5, self.bonds.astype(np.float64))
        valence = b.sum(1)
        return bool((valence <= constants.MAX_VALENCE[self.atom_types]).all()
                    and (valence > 0).all() if self.n_atoms > 1 else True)

    def largest_component(self) -> 'MolGraph':
        labels = connected_components(self.bonds)
        if len(labels) == 0:
            return self
        counts = np.bincount(labels)
        keep = np.where(labels == counts.argmax())[0]
        return self.subgraph(keep)

    def subgraph(self, idx: np.ndarray) -> 'MolGraph':
        idx = np.asarray(idx)
        return MolGraph(self.atom_types[idx], self.positions[idx],
                        self.bonds[np.ix_(idx, idx)])

    # -- canonical identity ----------------------------------------------------

    def canonical_key(self) -> str:
        """Canonical identity string. RDKit canonical SMILES when available;
        otherwise a Weisfeiler-Lehman graph hash over (element, bond-order)
        labels — a graph-isomorphism-grade identity suitable for
        uniqueness/novelty counting."""
        if HAS_RDKIT:
            mol = self.to_rdkit()
            try:
                Chem.SanitizeMol(mol)
            except Exception:
                pass
            return Chem.MolToSmiles(mol)
        return self.wl_hash()

    def wl_hash(self, iterations: int = 4) -> str:
        n = self.n_atoms
        if n == 0:
            return 'empty'
        labels = [f'{int(t)}' for t in self.atom_types]
        rows, cols = np.nonzero(self.bonds)
        neigh = [[] for _ in range(n)]
        for i, j in zip(rows, cols):
            neigh[i].append((int(self.bonds[i, j]), int(j)))
        for _ in range(iterations):
            new = []
            for i in range(n):
                ext = sorted(f'{o}:{labels[j]}' for o, j in neigh[i])
                new.append(hashlib.sha1(
                    (labels[i] + '|' + ','.join(ext)).encode()).hexdigest()[:16])
            labels = new
        return hashlib.sha1(','.join(sorted(labels)).encode()).hexdigest()

    # -- RDKit bridge -----------------------------------------------------------

    def to_rdkit(self):
        """Build an RWMol + conformer exactly as the reference does
        (src/molecule_builder.py:28-41: directed lower-triangle bonds)."""
        from rdkit import Chem as _Chem
        from rdkit.Chem import Conformer
        from rdkit.Geometry import Point3D
        bond_types = {1: _Chem.BondType.SINGLE, 2: _Chem.BondType.DOUBLE,
                      3: _Chem.BondType.TRIPLE, 4: _Chem.BondType.AROMATIC}
        mol = _Chem.RWMol()
        for s in self.symbols:
            mol.AddAtom(_Chem.Atom(s))
        ii, jj = np.nonzero(np.tril(self.bonds))
        for i, j in zip(ii.tolist(), jj.tolist()):
            mol.AddBond(i, j, bond_types[int(self.bonds[i, j])])
        conf = Conformer(self.n_atoms)
        for i, (x, y, z) in enumerate(np.asarray(self.positions, np.float64)):
            conf.SetAtomPosition(i, Point3D(x, y, z))
        mol.AddConformer(conf)
        return mol


# ---------------------------------------------------------------------------
# Builders (reference build_molecules, src/molecule_builder.py:16-25)
# ---------------------------------------------------------------------------

def build_molecule(positions: np.ndarray, atom_types: np.ndarray,
                   is_geom: bool = True, repair: bool = True) -> MolGraph:
    # is_geom only alters the vocab in the reference; GEOM is a superset of
    # ZINC with identical indices, so the dense tables cover both.
    # repair=True runs the over-valence downgrade pass (chem/bonds.py::
    # repair_valences) that stands in for openbabel's conjugation-aware
    # perception in the published metric protocol; repair=False is the raw
    # reference table (src/molecule_builder.py:44-102) for parity tests.
    del is_geom
    bonds = bond_order_matrix(positions, atom_types)
    if repair:
        from difflinker_tpu.chem.bonds import repair_valences
        bonds = repair_valences(bonds, positions, atom_types)
    return MolGraph(np.asarray(atom_types, np.int64),
                    np.asarray(positions, np.float32),
                    bonds)


def build_molecules(one_hot, positions, node_mask, is_geom: bool = True
                    ) -> List[MolGraph]:
    """Batch version over padded arrays: one_hot (B, N, nf), positions
    (B, N, 3), node_mask (B, N, 1) or (B, N)."""
    one_hot = np.asarray(one_hot)
    positions = np.asarray(positions)
    node_mask = np.asarray(node_mask)
    if node_mask.ndim == 3:
        node_mask = node_mask[..., 0]
    out = []
    for b in range(one_hot.shape[0]):
        keep = node_mask[b] > 0
        types = one_hot[b][keep].argmax(-1)
        out.append(build_molecule(positions[b][keep], types, is_geom))
    return out


def with_authored_fragment_bonds(generated: MolGraph,
                                 fragments: MolGraph) -> MolGraph:
    """Overwrite the fragment-fragment bond block of a generated molecule
    with the bonds authored in the input fragment SDF.

    Linker generation holds fragment atoms bit-exactly fixed (the first
    `fragments.n_atoms` rows of the sample layout), so their chemistry is
    *given*, not something bond perception needs to rediscover — and published
    crystal-derived inputs contain bonds pure geometry cannot recover (the JNK
    case study authors an N-C bond at 1.70 Å, past every distance table; its
    rings are authored aromatic). Only bonds involving generated linker atoms
    stay geometric. This mirrors the reference protocol, where openbabel's
    connectivity perception (reformat_data_obabel.py:23) tolerates such bonds
    via covalent-radius rules.
    """
    n = fragments.n_atoms
    if generated.n_atoms < n:
        raise ValueError(f'generated molecule has {generated.n_atoms} atoms, '
                         f'fewer than the {n} fragment atoms')
    bonds = np.array(generated.bonds, copy=True)
    bonds[:n, :n] = fragments.bonds
    return MolGraph(generated.atom_types, generated.positions, bonds)


def chem_env_provenance() -> dict:
    """Which chemistry backends this environment runs — stamped into every
    metrics artifact (VERDICT r2 #9: published-protocol validity flows
    through obabel + RDKit, reformat_data_obabel.py:23, README.md:232-234;
    outputs must say which stack produced them)."""
    from difflinker_tpu.io.xyz import obabel_available
    return {
        'rdkit': bool(HAS_RDKIT),
        'obabel': bool(obabel_available()),
        'smiles_backend': 'rdkit' if HAS_RDKIT else 'native-wl-hash',
        'bond_perception': 'obabel' if obabel_available()
                           else 'native-geometric',
    }
