"""Chemistry stack (bond perception, molecular graphs, metrics, DeLinker
battery). RDKit/OpenBabel optional — see docs/ARCHITECTURE.md §6."""


def disable_rdkit_logging():
    """Silence RDKit's per-molecule warnings (src/utils.py:252-260);
    no-op when RDKit is absent."""
    try:
        import rdkit.RDLogger as rkl
        import rdkit.rdBase as rkrb
        rkl.logger().setLevel(rkl.ERROR)
        rkrb.DisableLog('rdApp.error')
    except ImportError:
        pass
