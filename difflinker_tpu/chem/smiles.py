"""Native SMILES parser (no RDKit): enough of the grammar to turn the
DeLinker-protocol fragment/linker SMILES into labeled graphs for subgraph
matching against SDF conformers.

The reference's data prep is RDKit-bound end to end
(/root/reference/data/zinc/prepare_dataset.py:44-169 parses the triples with
Chem.MolFromSmiles and matches them with GetSubstructMatches). This parser is
the rdkit-free tier that lets `cli.prepare_data zinc` (dataprep/zinc.py) run
in images without RDKit: it produces element-labeled heavy-atom graphs —
exactly the information substructure matching needs — not a full
cheminformatics toolkit (no stereo, no implicit-H accounting, no
canonicalization; those never reach the matching step).

Supported grammar: organic-subset atoms (B C N O P S F Cl Br I), aromatic
lowercase (b c n o p s), bracket atoms ([*], [*:1], [nH], [N+], [O-],
[13C], [C@@H] — isotope/chirality/H-count/charge/map parsed and, except for
charge and symbol, ignored), bonds - = # : / \\, branches, ring closures
(digits and %nn), and dot-separated components.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import numpy as np

_ORGANIC = ('Cl', 'Br', 'B', 'C', 'N', 'O', 'P', 'S', 'F', 'I')
_AROMATIC = ('b', 'c', 'n', 'o', 'p', 's')
# the DeLinker-protocol domain (heavy-atom drug-like vocab + H for bracket
# forms); anything else is a parse error, not a silent pseudo-element
_KNOWN = {'H', 'B', 'C', 'N', 'O', 'F', 'P', 'S', 'Cl', 'Br', 'I', 'Si',
          'Se', 'As', '*'}
AROMATIC_ORDER = 4  # MOL-V2000 aromatic bond code (chem/molgraph convention)


@dataclass
class SmilesGraph:
    """Heavy-atom labeled graph parsed from SMILES."""
    symbols: List[str]                  # element symbols; '*' for dummies
    bonds: np.ndarray                   # (n, n) int8 orders; 4 = aromatic
    aromatic: np.ndarray                # (n,) bool atom flags
    charges: np.ndarray                 # (n,) int formal charges
    components: np.ndarray = field(default=None)  # (n,) dot-component ids

    @property
    def n_atoms(self) -> int:
        return len(self.symbols)

    @property
    def is_dummy(self) -> np.ndarray:
        return np.asarray([s == '*' for s in self.symbols])

    def subgraph(self, idx) -> 'SmilesGraph':
        idx = np.asarray(idx)
        return SmilesGraph([self.symbols[i] for i in idx],
                           self.bonds[np.ix_(idx, idx)],
                           self.aromatic[idx], self.charges[idx],
                           self.components[idx])


class SmilesError(ValueError):
    pass


def _parse_bracket(body: str):
    """Atom from a bracket body (between '[' and ']'):
    isotope? symbol chiral? Hcount? charge? map?  -> (symbol, charge)."""
    i = 0
    while i < len(body) and body[i].isdigit():
        i += 1  # isotope ignored
    if i >= len(body):
        raise SmilesError(f'empty bracket atom: [{body}]')
    if body[i] == '*':
        sym, aromatic = '*', False
        i += 1
    elif body[i:i + 2].isalpha() and body[i:i + 2] in ('Cl', 'Br'):
        sym, aromatic = body[i:i + 2], False
        i += 2
    elif body[i].isalpha():
        two = body[i:i + 2]
        # two-letter element iff second char lowercase AND not an aromatic
        # single-letter followed by H-count/chirality markers (se/as exist
        # but never in this protocol)
        if (len(two) == 2 and two[1].islower() and two[1] not in 'hbcnops'
                and two.istitle()):
            sym, aromatic = two, False
            i += 2
        else:
            sym = body[i].upper()
            aromatic = body[i].islower()
            i += 1
    else:
        raise SmilesError(f'bad bracket atom: [{body}]')
    if sym not in _KNOWN:
        raise SmilesError(f'unknown element {sym!r} in [{body}]')
    # skip chirality
    while i < len(body) and body[i] == '@':
        i += 1
    # skip explicit H count
    if i < len(body) and body[i] == 'H':
        i += 1
        while i < len(body) and body[i].isdigit():
            i += 1
    # charge
    charge = 0
    if i < len(body) and body[i] in '+-':
        sign = 1 if body[i] == '+' else -1
        i += 1
        if i < len(body) and body[i].isdigit():
            charge = sign * int(body[i])
            i += 1
        else:
            charge = sign
            while i < len(body) and body[i] in '+-':
                charge += sign
                i += 1
    # atom-map
    if i < len(body) and body[i] == ':':
        i += 1
        while i < len(body) and body[i].isdigit():
            i += 1
    if i != len(body):
        raise SmilesError(f'trailing bracket content: [{body}]')
    return sym, aromatic, charge


# no '$' (quadruple): its order-4 code would collide with the MOL-V2000
# aromatic convention (AROMATIC_ORDER = 4) and the protocol never emits it —
# it falls through to the unsupported-char error instead of silently aliasing
_BOND_ORDER = {'-': 1, '=': 2, '#': 3, ':': AROMATIC_ORDER,
               '/': 1, '\\': 1}


def parse_smiles(smi: str) -> SmilesGraph:
    """Parse a SMILES string into a SmilesGraph (heavy atoms only; see
    module docstring for the supported grammar)."""
    smi = smi.strip()
    symbols: List[str] = []
    aromatic: List[bool] = []
    charges: List[int] = []
    comp: List[int] = []
    edges = []  # (i, j, order-or-None); None = default (decided by aromatics)
    stack: List[int] = []
    prev = -1
    pending = None  # explicit bond symbol awaiting the next atom
    rings = {}      # ring-closure digit -> (atom, pending order)
    component = 0

    def add_atom(sym, arom, charge):
        nonlocal prev, pending
        idx = len(symbols)
        symbols.append(sym)
        aromatic.append(arom)
        charges.append(charge)
        comp.append(component)
        if prev >= 0:
            edges.append((prev, idx, pending))
        pending = None
        prev = idx
        return idx

    i = 0
    n = len(smi)
    while i < n:
        ch = smi[i]
        if ch == '[':
            end = smi.find(']', i)
            if end < 0:
                raise SmilesError(f'unclosed bracket in {smi!r}')
            sym, arom, charge = _parse_bracket(smi[i + 1:end])
            add_atom(sym, arom, charge)
            i = end + 1
        elif ch == '*':
            add_atom('*', False, 0)
            i += 1
        elif smi[i:i + 2] in ('Cl', 'Br'):
            add_atom(smi[i:i + 2], False, 0)
            i += 2
        elif ch in 'BCNOPSFI':
            add_atom(ch, False, 0)
            i += 1
        elif ch in _AROMATIC:
            add_atom(ch.upper(), True, 0)
            i += 1
        elif ch in _BOND_ORDER:
            pending = _BOND_ORDER[ch]
            i += 1
        elif ch == '(':
            if prev < 0:
                raise SmilesError(f'branch before any atom in {smi!r}')
            stack.append(prev)
            i += 1
        elif ch == ')':
            if not stack:
                raise SmilesError(f'unbalanced ) in {smi!r}')
            prev = stack.pop()
            i += 1
        elif ch.isdigit() or ch == '%':
            if prev < 0:
                raise SmilesError(f'ring closure before any atom in {smi!r}')
            if ch == '%':
                num, i = smi[i + 1:i + 3], i + 3
            else:
                num, i = ch, i + 1
            if num in rings:
                j, order = rings.pop(num)
                edges.append((j, prev, order if order is not None
                              else pending))
            else:
                rings[num] = (prev, pending)
            pending = None
        elif ch == '.':
            prev = -1
            pending = None
            component += 1
            i += 1
        elif ch == 'H':
            i += 1  # bare H (rare outside brackets): no heavy atom
        else:
            raise SmilesError(f'unsupported SMILES char {ch!r} in {smi!r}')
    if rings:
        raise SmilesError(f'unclosed ring bond(s) {sorted(rings)} in {smi!r}')
    if stack:
        raise SmilesError(f'unbalanced ( in {smi!r}')

    m = len(symbols)
    bonds = np.zeros((m, m), np.int8)
    for a, b, order in edges:
        if order is None:
            order = (AROMATIC_ORDER if aromatic[a] and aromatic[b] else 1)
        bonds[a, b] = bonds[b, a] = order
    return SmilesGraph(symbols, bonds, np.asarray(aromatic, bool),
                       np.asarray(charges, np.int64),
                       np.asarray(comp, np.int64))
