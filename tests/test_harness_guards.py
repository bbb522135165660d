"""Unit tests for the repo-root harness pieces: bench.py's regression guard
and the BASELINE.json north-star comparison schema
(scripts/compare_with_reference.py)."""
import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_regression_guard():
    bench = _load(os.path.join(ROOT, 'bench.py'), 'bench_mod')
    prev = {'value': 100.0,
            'pocket': {'value': 2.0},
            'respaced_T50': {'value': 900.0},
            'train': {'zinc': {'value': 7000.0}, 'pocket': {'value': 180.0}}}
    # >10% drop on the headline flags; improvements and small dips do not
    regs = bench._regressions({'value': 80.0, 'pocket': {'value': 3.0},
                               'train': {}}, prev)
    assert [r['entry'] for r in regs] == ['headline']
    assert regs[0]['drop_pct'] == 20.0
    assert bench._regressions({'value': 95.0, 'pocket': {'value': 2.0},
                               'respaced_T50': {'value': 1000.0},
                               'train': prev['train']}, prev) == []
    # entries absent from either side are skipped, not crashed on
    assert bench._regressions({'value': 99.0}, {'value': 100.0}) == []
    # the newest recorded BENCH_r{N}.json parses
    recorded = bench._previous_bench()
    assert recorded is None or 'value' in recorded


def test_baseline_comparison_schema():
    cmp_mod = _load(os.path.join(ROOT, 'scripts',
                                 'compare_with_reference.py'), 'cmp_mod')
    ours = {'validity': 92.5, 'uniqueness': 51.0, 'rmsd': 0.42,
            'novelty': 30.0, 'energies': 5.0}
    ref = {'validity': 93.0, 'uniqueness': 51.5, 'rmsd': 0.40,
           'extra_only_in_ref': 1.0}
    rec = cmp_mod.baseline_comparison('zinc.ckpt', ours, ref)
    assert rec['schema'] == 'baseline-comparison-v1'
    assert rec['deltas']['validity'] == -0.5
    assert rec['pass'] == {'validity': True, 'uniqueness': True,
                           'rmsd': True}
    assert rec['all_pass']
    # out-of-tolerance validity fails the record
    rec2 = cmp_mod.baseline_comparison(
        'zinc.ckpt', dict(ours, validity=91.0), ref)
    assert not rec2['pass']['validity'] and not rec2['all_pass']
    # no shared toleranced metrics -> cannot claim a pass
    rec3 = cmp_mod.baseline_comparison('x.ckpt', {'energies': 1.0},
                                       {'other': 2.0})
    assert not rec3['all_pass']
