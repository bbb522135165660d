"""Import-time stubs for reference dependencies absent in this image
(rdkit, pytorch_lightning, wandb) so that `src.lightning.DDPM` — the
reference training module — can be imported and EXECUTED for lockstep
training parity tests.

Only import-time surface is stubbed: the DDPM training path itself
(src/lightning.py:148-209) touches none of the stubbed libraries; they are
imported at module scope for the sampling/eval code paths we don't run.

Coexists with the minimal per-module rdkit stubs in test_data.py /
test_chem.py regardless of pytest collection order: install() reuses an
existing 'rdkit' stub module (patching in a __path__ so submodule imports
resolve through our finder) and the finder only serves names that aren't
already in sys.modules.
"""
import importlib.abc
import importlib.machinery
import sys
import types


class _Anything:
    """Truthy do-everything placeholder: attribute access, calls and fspath
    all resolve to itself (module-level code like
    `os.path.join(RDConfig.RDDataDir, ...)` in src/delinker_utils must not
    crash at import)."""

    def __getattr__(self, name):
        return self

    def __call__(self, *a, **k):
        return self

    def __fspath__(self):
        return '_stub_'

    def __str__(self):
        return '_stub_'

    def __iter__(self):
        return iter(())


_ANY = _Anything()


class _AnyModule(types.ModuleType):
    __path__ = []

    def __getattr__(self, name):
        if name.startswith('__') and name.endswith('__'):
            raise AttributeError(name)
        return _ANY


class _StubLoader(importlib.abc.Loader):
    def create_module(self, spec):
        return _AnyModule(spec.name)

    def exec_module(self, module):
        pass


class _StubFinder(importlib.abc.MetaPathFinder):
    def __init__(self, prefixes):
        self.prefixes = prefixes

    def find_spec(self, fullname, path=None, target=None):
        if any(fullname == p or fullname.startswith(p + '.')
               for p in self.prefixes):
            return importlib.machinery.ModuleSpec(
                fullname, _StubLoader(), is_package=True)
        return None


_installed = False


def install():
    """Idempotent: make rdkit/wandb/pytorch_lightning importable as stubs."""
    global _installed
    if _installed:
        return
    _installed = True

    sys.meta_path.insert(0, _StubFinder(('rdkit', 'wandb')))

    # an earlier test module may have planted a plain ModuleType 'rdkit'
    # stub (test_data.py/test_chem.py); give it a __path__ so `rdkit.six`
    # style submodule imports route through our finder instead of raising
    # "'rdkit' is not a package"
    for name in ('rdkit', 'rdkit.Chem', 'wandb'):
        mod = sys.modules.get(name)
        if mod is not None and not hasattr(mod, '__path__'):
            mod.__path__ = []

    import rdkit.Chem
    if not isinstance(getattr(rdkit.Chem, 'rdchem', None), types.SimpleNamespace):
        rdkit.Chem.rdchem = types.SimpleNamespace(
            BondType=types.SimpleNamespace(SINGLE=1, DOUBLE=2, TRIPLE=3,
                                           AROMATIC=4))

    if 'pytorch_lightning' not in sys.modules:
        import torch

        pl = types.ModuleType('pytorch_lightning')

        class LightningModule(torch.nn.Module):
            """Just enough Lightning surface for DDPM.__init__/training_step."""

            def save_hyperparameters(self):
                pass

            def log(self, *a, **k):
                pass

            global_step = 0

        pl.LightningModule = LightningModule
        sys.modules['pytorch_lightning'] = pl
