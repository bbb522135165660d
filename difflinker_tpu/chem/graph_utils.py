"""Graph utilities shared by the offline metrics (networkx bridge).

Port of the pieces of src/delinker_utils/frag_utils.py the evaluation stack
uses: rdkit→networkx topology (:403-413) used for isomorphism-gated RMSD, and
dummy-atom removal for DeLinker-format SMILES (:21-22).
"""
from __future__ import annotations

import networkx as nx


def topology_from_rdkit(mol) -> 'nx.Graph':
    """Element-and-bond labelled graph for isomorphism matching."""
    g = nx.Graph()
    for atom in mol.GetAtoms():
        g.add_node(atom.GetIdx())
        g.nodes[atom.GetIdx()]['specie'] = atom.GetSymbol()
    for bond in mol.GetBonds():
        g.add_edge(bond.GetBeginAtomIdx(), bond.GetEndAtomIdx())
    return g


def topology_from_molgraph(mol) -> 'nx.Graph':
    """Same for native MolGraphs."""
    import numpy as np
    g = nx.Graph()
    for i, s in enumerate(mol.symbols):
        g.add_node(i, specie=s)
    ii, jj = np.nonzero(np.triu(mol.bonds))
    g.add_edges_from(zip(ii.tolist(), jj.tolist()))
    return g


def get_linker_smiles(full_mol, clean_frag, with_exit_vectors: bool = False,
                      starting_point_smi: str = None) -> str:
    """Extract the linker SMILES from a full molecule given the clean
    (exit-stripped) fragments.

    Covers the DeLinker-protocol extraction (frag_utils.get_linker :173-271 /
    get_linker_v2 :274-359) with one algorithm: for every fragment
    substructure match whose complement (a) has exactly the expected linker
    size, (b) is a single connected piece, and (c) touches the fragments
    through exactly two bonds, delete the fragment atoms and return the
    remainder — optionally cutting the attachment bonds first so the linker
    keeps `[*]` exit vectors (the v1 behaviour with `starting_point` deletion).
    Returns '' when no unambiguous linker exists (matching the reference's
    empty-string failure convention).
    """
    from rdkit import Chem
    from rdkit.Chem import AllChem

    matches = list(full_mol.GetSubstructMatches(clean_frag))
    if not matches:
        return ''
    linker_len = full_mol.GetNumHeavyAtoms() - clean_frag.GetNumHeavyAtoms()
    if linker_len == 0:
        return ''

    candidates = []
    for match in matches:
        all_atoms = set(range(full_mol.GetNumHeavyAtoms()))
        linker_atoms = sorted(all_atoms - set(match))
        # attachment bonds between fragment atoms and linker atoms
        cut_bonds, joined = [], set()
        for frag_idx in match:
            for nb in full_mol.GetAtomWithIdx(frag_idx).GetNeighbors():
                if nb.GetIdx() in set(linker_atoms):
                    cut_bonds.append(full_mol.GetBondBetweenAtoms(
                        frag_idx, nb.GetIdx()).GetIdx())
                    joined.add(frag_idx)
        if len(joined) != 2 or len(cut_bonds) != 2:
            continue
        # complement must be one connected linker of the expected size
        rw = Chem.RWMol(full_mol)
        for idx in sorted(match, reverse=True):
            rw.RemoveAtom(idx)
        linker = rw.GetMol()
        if linker.GetNumHeavyAtoms() != linker_len:
            continue
        if len(Chem.rdmolops.GetMolFrags(linker)) != 1:
            continue
        if with_exit_vectors and starting_point_smi:
            pieces = Chem.FragmentOnBonds(Chem.Mol(full_mol), cut_bonds)
            qp = Chem.AdjustQueryParameters()
            qp.makeDummiesQueries = True
            out = Chem.Mol(pieces)
            for f in starting_point_smi.split('.'):
                qfrag = Chem.AdjustQueryProperties(Chem.MolFromSmiles(f), qp)
                out = AllChem.DeleteSubstructs(out, qfrag, onlyFrags=True)
            try:
                Chem.Kekulize(out, clearAromaticFlags=True)
            except Exception:
                pass
            candidates.append(Chem.MolToSmiles(out))
        else:
            candidates.append(Chem.MolToSmiles(linker))
    if not candidates:
        return ''
    return candidates[0]


def remove_dummy_atoms(smi: str) -> str:
    """Replace `*` exit vectors with H and strip (frag_utils.py:21-22)."""
    from rdkit import Chem
    from rdkit.Chem import AllChem
    mol = Chem.MolFromSmiles(smi)
    out = AllChem.ReplaceSubstructs(mol, Chem.MolFromSmiles('*'),
                                    Chem.MolFromSmiles('[H]'), True)[0]
    return Chem.MolToSmiles(Chem.RemoveHs(out))
