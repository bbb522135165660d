"""Minimal PDB parsing + protein-pocket extraction.

The reference uses BioPython for this (generate_with_protein.py:85-147);
BioPython is not in TPU serving images, and the needed subset — ATOM/HETATM
records with residue ids, atom names, elements and coordinates — is a
fixed-column format, so it is parsed natively here. Pocket definition matches
the reference exactly: all atoms of residues having ANY atom within 6 A of the
fragment atoms; backbone mode keeps only {N, CA, C, O}.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from difflinker_tpu import constants

BACKBONE_ATOMS = {'N', 'CA', 'C', 'O'}


@dataclass
class PdbAtom:
    name: str
    element: str
    coord: np.ndarray
    res_id: int
    chain: str
    is_hetatm: bool


def parse_pdb(path: str, include_hetatm: bool = False) -> List[PdbAtom]:
    """Fixed-column PDB reader (columns per the PDB v3.3 spec)."""
    atoms = []
    with open(path) as f:
        for line in f:
            rec = line[:6].strip()
            if rec not in ('ATOM', 'HETATM'):
                continue
            if rec == 'HETATM' and not include_hetatm:
                continue
            name = line[12:16].strip()
            res_id = int(line[22:26])
            chain = line[21]
            x = float(line[30:38])
            y = float(line[38:46])
            z = float(line[46:54])
            element = line[76:78].strip()
            if not element:
                # fall back to the atom-name convention (first alpha char)
                element = ''.join(c for c in name if c.isalpha())[:1]
            # vocabulary keys are title-case ('Cl', 'Br'); PDB files vary
            element = element.capitalize() if len(element) == 2 else element.upper()
            atoms.append(PdbAtom(name, element,
                                 np.asarray([x, y, z], np.float32),
                                 res_id, chain, rec == 'HETATM'))
    return atoms


def extract_pocket(fragment_coords: np.ndarray, pdb_path: str,
                   backbone_atoms_only: bool = False, cutoff: float = 6.0
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Contact-residue pocket (generate_with_protein.py:85-147).

    Returns (positions (M, 3), one_hot (M, 9), charges (M,)) over the GEOM
    vocabulary; unknown elements are dropped, matching the reference. HETATM
    records are included — BioPython's get_residues() (which the reference
    iterates) yields hetero residues too.
    """
    atoms = parse_pdb(pdb_path, include_hetatm=True)
    if not atoms:
        raise ValueError(f'no ATOM records in {pdb_path}')
    coords = np.stack([a.coord for a in atoms])
    # residue identity must include the chain: numbering restarts per chain
    res_keys = np.asarray([hash((a.chain, a.res_id)) for a in atoms])

    d = np.linalg.norm(coords[:, None, :]
                       - np.asarray(fragment_coords)[None, :, :], axis=-1)
    contact = set(res_keys[np.where(d.min(1) <= cutoff)[0]].tolist())

    pos, one_hot, charges = [], [], []
    a2i = constants.GEOM_ATOM2IDX
    for a, key in zip(atoms, res_keys):
        if key not in contact:
            continue
        if backbone_atoms_only and a.name not in BACKBONE_ATOMS:
            continue
        if a.element not in a2i:
            continue
        pos.append(a.coord)
        row = np.zeros(len(a2i), np.float32)
        row[a2i[a.element]] = 1
        one_hot.append(row)
        charges.append(constants.GEOM_CHARGES[a.element])
    if not pos:
        raise ValueError('empty pocket: no contact residues with known '
                         'elements within cutoff')
    return (np.stack(pos).astype(np.float32), np.stack(one_hot),
            np.asarray(charges, np.float32))


def read_pocket_pdb(pdb_path: str, backbone_atoms_only: bool = False):
    """User-supplied pre-cut pocket file (generate_with_pocket.py:85-114):
    every parsed atom (incl. HETATM) is pocket."""
    atoms = parse_pdb(pdb_path, include_hetatm=True)
    a2i = constants.GEOM_ATOM2IDX
    pos, one_hot, charges = [], [], []
    for a in atoms:
        if backbone_atoms_only and a.name not in BACKBONE_ATOMS:
            continue
        if a.element not in a2i:
            continue
        pos.append(a.coord)
        row = np.zeros(len(a2i), np.float32)
        row[a2i[a.element]] = 1
        one_hot.append(row)
        charges.append(constants.GEOM_CHARGES[a.element])
    if not pos:
        raise ValueError(f'no usable pocket atoms in {pdb_path}')
    return (np.stack(pos).astype(np.float32), np.stack(one_hot),
            np.asarray(charges, np.float32))
