"""RDKit-free fragment/linker preparation for the ZINC data-prep pipeline.

The reference pairs each conformer with its DeLinker (linker, fragments)
SMILES by substructure matching and coordinate transfer
(/root/reference/data/zinc/prepare_dataset.py:107-169). This module is the
native tier: SMILES parsed with chem/smiles.py, conformers read as MolGraph
(chem/io_rdkit._read_sdf_native), matching via element-labeled VF2 subgraph
isomorphism (networkx), with the reference's disambiguation semantics —
matches across fragments must be pairwise non-intersecting
(prepare_dataset.py:125-141) and the linker must sit in the middle (every
fragment anchor bonded to a linker atom, prepare_dataset.py:144-169; we
additionally require the leftover atoms to BE the linker graph, which
subsumes the reference's per-bond checks on these inputs).

Downstream (data/datasets.preprocess_sdf_tables) consumes only the SDF
coordinates/types/order and the anchor indices — the table's SMILES columns
are identifiers — so this path feeds cli.train exactly like the RDKit one.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from difflinker_tpu.chem.molgraph import MolGraph
from difflinker_tpu.chem.smiles import SmilesGraph, parse_smiles


class MatchError(ValueError):
    pass


def split_components(g: SmilesGraph) -> List[SmilesGraph]:
    return [g.subgraph(np.where(g.components == c)[0])
            for c in range(int(g.components.max()) + 1)]


def strip_exit(frag: SmilesGraph) -> Tuple[SmilesGraph, int]:
    """Remove the single '*' exit atom; return (stripped graph, anchor index
    in the stripped ordering) — the exit's unique heavy neighbour
    (reference update_fragment, prepare_dataset.py:44-68)."""
    dummy = np.where(frag.is_dummy)[0]
    if len(dummy) != 1:
        raise MatchError(f'fragment must have exactly one * exit, '
                         f'found {len(dummy)}')
    d = int(dummy[0])
    nbrs = np.where(frag.bonds[d] > 0)[0]
    if len(nbrs) != 1:
        raise MatchError('exit atom must have exactly one neighbour')
    keep = [i for i in range(frag.n_atoms) if i != d]
    anchor = keep.index(int(nbrs[0]))
    return frag.subgraph(keep), anchor


def strip_linker_exits(linker: SmilesGraph) -> SmilesGraph:
    dummies = np.where(linker.is_dummy)[0]
    keep = [i for i in range(linker.n_atoms) if i not in set(dummies.tolist())]
    return linker.subgraph(keep)


def _nx_graph(symbols, bonds):
    import networkx as nx
    g = nx.Graph()
    for i, s in enumerate(symbols):
        g.add_node(i, sym=s)
    ii, jj = np.nonzero(np.triu(np.asarray(bonds), 1))
    g.add_edges_from(zip(ii.tolist(), jj.tolist()))
    return g


def subgraph_matches(query: SmilesGraph, mol: MolGraph) -> List[Tuple[int, ...]]:
    """All induced-subgraph matches of the query in the molecule, as tuples
    mapping query atom i -> mol atom match[i]. Element-labeled, bond-order
    agnostic (SDF conformers may be kekulized where the SMILES is aromatic;
    adjacency + elements is what coordinate transfer needs)."""
    from networkx.algorithms.isomorphism import GraphMatcher
    G = _nx_graph(mol.symbols, mol.bonds)
    Q = _nx_graph(query.symbols, query.bonds)
    gm = GraphMatcher(G, Q, node_match=lambda a, b: a['sym'] == b['sym'])
    out = set()
    for mapping in gm.subgraph_isomorphisms_iter():  # mol-node -> query-node
        inv = {q: m for m, q in mapping.items()}
        out.add(tuple(inv[i] for i in range(query.n_atoms)))
    return sorted(out)


def _is_isomorphic(a_symbols, a_bonds, b_symbols, b_bonds) -> bool:
    import networkx as nx
    return nx.is_isomorphic(
        _nx_graph(a_symbols, a_bonds), _nx_graph(b_symbols, b_bonds),
        node_match=lambda x, y: x['sym'] == y['sym'])


def prepare_fragments_and_linker_native(
        frags_smi: str, linker_smi: str, mol: MolGraph
) -> Tuple[MolGraph, MolGraph, List[int]]:
    """Native twin of fragmentation.prepare_fragments_and_linker +
    combine_fragments + get_anchors_idx: returns (combined fragments with
    mol coordinates, linker with mol coordinates, anchor indices into the
    combined fragment ordering)."""
    import itertools

    frag_graphs = split_components(parse_smiles(frags_smi))
    stripped, anchors_local = [], []
    for fg in frag_graphs:
        s, a = strip_exit(fg)
        stripped.append(s)
        anchors_local.append(a)
    linker = strip_linker_exits(parse_smiles(linker_smi))

    per_frag = [subgraph_matches(s, mol) for s in stripped]
    for k, m in enumerate(per_frag):
        if not m:
            raise MatchError(f'fragment {k} has no match in the conformer')

    n = mol.n_atoms
    mol_bonds = np.asarray(mol.bonds) > 0
    chosen = None
    for combo in itertools.product(*per_frag):
        used = [a for match in combo for a in match]
        if len(set(used)) != len(used):
            continue  # intersecting matches (prepare_dataset.py:125-141)
        rest = sorted(set(range(n)) - set(used))
        if len(rest) != linker.n_atoms:
            continue
        rest_syms = [mol.symbols[i] for i in rest]
        if not _is_isomorphic(rest_syms,
                              np.asarray(mol.bonds)[np.ix_(rest, rest)],
                              linker.symbols, linker.bonds):
            continue
        # linker in the middle: every fragment anchor bonds to a linker atom
        rest_set = set(rest)
        anchors_mol = [match[a] for match, a in zip(combo, anchors_local)]
        if all(any(mol_bonds[a, j] for j in rest_set) for a in anchors_mol):
            chosen = (combo, rest, anchors_mol)
            break
    if chosen is None:
        raise MatchError('no non-intersecting match with the linker in the '
                         'middle')
    combo, rest, anchors_mol = chosen

    order = [a for match in combo for a in match]
    types = np.asarray(mol.atom_types)
    pos = np.asarray(mol.positions)
    bonds = np.asarray(mol.bonds)
    combined = MolGraph(types[order], pos[order],
                        bonds[np.ix_(order, order)])
    linker_out = MolGraph(types[rest], pos[rest], bonds[np.ix_(rest, rest)])
    anchors_idx = [order.index(a) for a in anchors_mol]
    return combined, linker_out, anchors_idx


def process_sdf_native(sdf_path: str, table, progress: bool = True,
                       join_col: str = 'molecule'):
    """Native twin of dataprep.zinc.process_sdf: same outputs
    (molecules, fragments, linkers, table rows) with MolGraph molecules.
    Table SMILES columns keep the INPUT strings (identifiers downstream;
    no canonicalization without RDKit)."""
    import pandas as pd
    from difflinker_tpu.chem.io_rdkit import read_sdf_named_native

    molecules, fragments, linkers, rows = [], [], [], []
    uuid = 0
    for mol_name, mol in read_sdf_named_native(sdf_path):
        sel = table[table[join_col] == mol_name][
            ['molecule', 'linker', 'fragments']].values
        for mol_smi, linker_smi, frags_smi in sel:
            try:
                combined, linker, anchors_idx = \
                    prepare_fragments_and_linker_native(frags_smi, linker_smi,
                                                        mol)
            except (MatchError, ValueError) as e:
                print(f'{mol_name} | {linker_smi} | {frags_smi} : {e}')
                continue
            molecules.append(mol)
            fragments.append(combined)
            linkers.append(linker)
            row = {'uuid': uuid, 'molecule': mol_smi,
                   'fragments': frags_smi, 'linker': linker_smi,
                   'energy': 0}
            if join_col != 'molecule':
                row[join_col] = mol_name
            if len(anchors_idx) == 2:
                row['anchor_1'], row['anchor_2'] = anchors_idx[:2]
            else:
                row['anchors'] = '-'.join(map(str, anchors_idx))
            rows.append(row)
            uuid += 1
    return molecules, fragments, linkers, pd.DataFrame(rows)
