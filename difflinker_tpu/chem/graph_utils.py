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


def remove_dummy_atoms(smi: str) -> str:
    """Replace `*` exit vectors with H and strip (frag_utils.py:21-22)."""
    from rdkit import Chem
    from rdkit.Chem import AllChem
    mol = Chem.MolFromSmiles(smi)
    out = AllChem.ReplaceSubstructs(mol, Chem.MolFromSmiles('*'),
                                    Chem.MolFromSmiles('[H]'), True)[0]
    return Chem.MolToSmiles(Chem.RemoveHs(out))
