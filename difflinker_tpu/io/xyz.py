"""XYZ / SDF molecular file IO (pure python, torch-free).

save_xyz_file matches the reference writer byte-for-byte
(src/visualizer.py:14-31): count line, blank comment line, `SYM x y z` rows
with 9 decimals. The SDF (MOL V2000) writer removes the hard OpenBabel
dependency of the reference eval pipeline (reformat_data_obabel.py:23): bond
perception comes from chem/bonds.py, which obabel was only used to do.
"""
from __future__ import annotations

import os
import shutil
import subprocess
from typing import List, Optional, Sequence

import numpy as np

from difflinker_tpu import constants
from difflinker_tpu.chem.molgraph import MolGraph, build_molecule


def save_xyz_file(path: str, one_hot, positions, node_mask,
                  names: Sequence[str], is_geom: bool, suffix: str = '') -> List[str]:
    """Write one `{name}_{suffix}.xyz` per batch element; returns paths."""
    idx2atom = constants.GEOM_IDX2ATOM if is_geom else constants.IDX2ATOM
    one_hot = np.asarray(one_hot)
    positions = np.asarray(positions)
    node_mask = np.asarray(node_mask)
    if node_mask.ndim == 3:
        node_mask = node_mask[..., 0]
    os.makedirs(path, exist_ok=True)

    out_paths = []
    for b in range(one_hot.shape[0]):
        keep = np.where(node_mask[b] > 0)[0]
        atoms = one_hot[b].argmax(-1)
        fname = os.path.join(path, f'{names[b]}_{suffix}.xyz')
        with open(fname, 'w') as f:
            f.write('%d\n\n' % len(keep))
            for i in keep:
                f.write('%s %.9f %.9f %.9f\n' % (
                    idx2atom[int(atoms[i])], positions[b, i, 0],
                    positions[b, i, 1], positions[b, i, 2]))
        out_paths.append(fname)
    return out_paths


def load_xyz(path: str):
    """Read one xyz file → (positions (N, 3) float32, symbols list)."""
    with open(path, encoding='utf8') as f:
        n = int(f.readline())
        f.readline()
        symbols, pos = [], []
        for _ in range(n):
            parts = f.readline().split()
            symbols.append(parts[0])
            pos.append([float(v) for v in parts[1:4]])
    return np.asarray(pos, np.float32), symbols


def load_molecule_xyz(path: str, is_geom: bool):
    """Reference-compatible reader (src/visualizer.py:43-59): returns
    (positions, one_hot, charges-zeros)."""
    atom2idx = constants.GEOM_ATOM2IDX if is_geom else constants.ATOM2IDX
    pos, symbols = load_xyz(path)
    one_hot = np.zeros((len(symbols), len(atom2idx)), np.float32)
    for i, s in enumerate(symbols):
        one_hot[i, atom2idx[s]] = 1
    return pos, one_hot, np.zeros((len(symbols), 1), np.float32)


def load_xyz_files(path: str, suffix: str = '') -> List[str]:
    files = [f for f in os.listdir(path) if f.endswith(f'_{suffix}.xyz')]
    files = sorted(files,
                   key=lambda f: -int(f.replace(f'_{suffix}.xyz', '').split('_')[-1]))
    return [os.path.join(path, f) for f in files]


# ---------------------------------------------------------------------------
# SDF (MOL V2000) writing
# ---------------------------------------------------------------------------

def molgraph_to_molblock(mol: MolGraph, title: str = '') -> str:
    n_atoms = mol.n_atoms
    ii, jj = np.nonzero(np.triu(mol.bonds))
    lines = [title, '  difflinker_tpu', '']
    lines.append('%3d%3d  0  0  0  0  0  0  0  0999 V2000'
                 % (n_atoms, len(ii)))
    for (x, y, z), sym in zip(np.asarray(mol.positions, float), mol.symbols):
        lines.append('%10.4f%10.4f%10.4f %-3s 0  0  0  0  0  0  0  0  0  0  0  0'
                     % (x, y, z, sym))
    for i, j in zip(ii.tolist(), jj.tolist()):
        lines.append('%3d%3d%3d  0' % (i + 1, j + 1, int(mol.bonds[i, j])))
    lines.append('M  END')
    return '\n'.join(lines) + '\n'


def write_sdf(mols: Sequence[MolGraph], path: str,
              titles: Optional[Sequence[str]] = None) -> None:
    with open(path, 'w') as f:
        for k, m in enumerate(mols):
            title = titles[k] if titles else f'mol_{k}'
            f.write(molgraph_to_molblock(m, title))
            f.write('$$$$\n')


# ---------------------------------------------------------------------------
# xyz → sdf conversion (reference: obabel subprocess, generate.py:177-180)
# ---------------------------------------------------------------------------

def obabel_available() -> bool:
    return shutil.which('obabel') is not None


def xyz_to_sdf(xyz_path: str, sdf_path: str, prefer_obabel: bool = True) -> str:
    """Convert with OpenBabel when installed (exact reference protocol,
    README.md:232-234); otherwise perceive bonds geometrically (same tables
    the reference uses for in-training metrics) and write MOL V2000 directly.

    Returns 'obabel' or 'native' indicating which path ran.
    """
    if prefer_obabel and obabel_available():
        subprocess.run(f'obabel {xyz_path} -O {sdf_path} 2> /dev/null',
                       shell=True, check=False)
        if os.path.exists(sdf_path) and os.path.getsize(sdf_path) > 0:
            return 'obabel'
    pos, symbols = load_xyz(xyz_path)
    types = np.asarray([constants.GEOM_ATOM2IDX[s] for s in symbols])
    mol = build_molecule(pos, types)
    write_sdf([mol], sdf_path,
              titles=[os.path.splitext(os.path.basename(xyz_path))[0]])
    return 'native'
