"""SC_RDKit 3D shape + pharmacophore similarity score.

Reference: src/delinker_utils/calc_SC_RDKit.py:20-40 —
score = 0.5 · FeatureMapScore + 0.5 · (1 − ShapeProtrudeDist). RDKit-only;
feature factory built lazily so importing this module never requires RDKit.
"""
from __future__ import annotations

_FDEF = None
_PARAMS = None

KEEP_FAMILIES = ('Donor', 'Acceptor', 'NegIonizable', 'PosIonizable',
                 'ZnBinder', 'Aromatic', 'Hydrophobe', 'LumpedHydrophobe')


def _factory():
    global _FDEF, _PARAMS
    if _FDEF is None:
        import os
        from rdkit import RDConfig
        from rdkit.Chem import AllChem
        from rdkit.Chem.FeatMaps import FeatMaps
        _FDEF = AllChem.BuildFeatureFactory(
            os.path.join(RDConfig.RDDataDir, 'BaseFeatures.fdef'))
        _PARAMS = {k: FeatMaps.FeatMapParams()
                   for k in _FDEF.GetFeatureFamilies()}
    return _FDEF, _PARAMS


def feature_map_score(query_mol, ref_mol) -> float:
    from rdkit.Chem.FeatMaps import FeatMaps
    fdef, params = _factory()
    feat_lists = []
    for m in (query_mol, ref_mol):
        feats = fdef.GetFeaturesForMol(m)
        feat_lists.append([f for f in feats if f.GetFamily() in KEEP_FAMILIES])
    fm = FeatMaps.FeatMap(feats=feat_lists[0], weights=[1] * len(feat_lists[0]),
                          params=params)
    fm.scoreMode = FeatMaps.FeatMapScoreMode.Best
    return fm.ScoreFeats(feat_lists[1]) / min(fm.GetNumFeatures(),
                                              len(feat_lists[1]))


def sc_rdkit_score(query_mol, ref_mol) -> float:
    from rdkit.Chem import rdShapeHelpers
    fm = feature_map_score(query_mol, ref_mol)
    protrude = rdShapeHelpers.ShapeProtrudeDist(query_mol, ref_mol,
                                                allowReordering=False)
    return 0.5 * fm + 0.5 * (1.0 - protrude)


def sc_rdkit_score_safe(query_mol, ref_mol) -> float:
    """Reference wraps the score with a -0.5 fallback (src/delinker.py:201-206)."""
    try:
        return sc_rdkit_score(query_mol, ref_mol)
    except Exception:
        return -0.5
