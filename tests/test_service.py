"""Serving subsystem: dynamic request batching over warm compiled chains
(sample/service.py + cli/serve.py).

The critical property is row-exact routing: co-batched requests must get
back exactly their own rows. Fragments are frozen through the chain and
recenter_output restores the input frame, so each request's fragment
coordinates must round-trip — with every request carrying distinct
coordinates, that pins the routing bit-for-bit.
"""
import io
import json
import os
import time

import numpy as np
import jax
import pytest

from difflinker_tpu.config import (DataConfig, DiffusionConfig,
                                   ExperimentConfig, ModelConfig, TrainConfig)
from difflinker_tpu.diffusion.edm import make_edm
from difflinker_tpu.sample.service import SamplingService


def _cfg(timesteps=5):
    return ExperimentConfig(
        model=ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=16,
                          n_layers=1, inv_sublayers=1, norm_constant=1e-6),
        diffusion=DiffusionConfig(timesteps=timesteps),
        data=DataConfig(),
        train=TrainConfig(lr=1e-3))


def _params(cfg, seed=0):
    return make_edm(cfg.model, cfg.diffusion).init_params(
        jax.random.PRNGKey(seed))


def _raw_sample(n_atoms, seed, name='frag'):
    rng = np.random.default_rng(seed)
    pos = rng.standard_normal((n_atoms, 3)).astype(np.float32) * 2
    one_hot = np.eye(8, dtype=np.float32)[rng.integers(0, 8, n_atoms)]
    anchors = np.zeros(n_atoms, np.float32)
    anchors[[0, n_atoms - 1]] = 1
    return {
        'uuid': seed, 'name': f'{name}{seed}',
        'positions': pos, 'one_hot': one_hot,
        'charges': np.ones(n_atoms, np.float32) * 6,
        'anchors': anchors,
        'fragment_mask': np.ones(n_atoms, np.float32),
        'linker_mask': np.zeros(n_atoms, np.float32),
        'num_atoms': n_atoms,
    }


def test_service_cobatches_and_routes_rows_exactly():
    cfg = _cfg()
    with SamplingService(cfg, _params(cfg), batch_size=8, max_wait_s=0.5,
                         node_buckets=(16,)) as svc:
        reqs = [(_raw_sample(5, 1), 2, 4), (_raw_sample(6, 2), 3, 5),
                (_raw_sample(4, 3), 1, 3)]
        futs = [svc.submit(s, n_samples=n, size_spec=size)
                for s, n, size in reqs]
        outs = [f.result(timeout=300) for f in futs]

    # all three requests fit one bucket and arrived inside the window —
    # exactly ONE chain call served them, through ONE compiled program
    assert svc.stats['batches'] == 1, svc.stats
    assert svc.stats['requests'] == 3 and svc.stats['rows'] == 6
    assert len(svc._samplers[(16, (None, None, None))]._compiled) == 1

    for (sample, n, size), out in zip(reqs, outs):
        assert out['positions'].shape[0] == n
        assert not out['nan_flag'].any()
        np.testing.assert_array_equal(out['linker_sizes'],
                                      np.full(n, size, np.int32))
        # requested linker size honoured row-wise
        np.testing.assert_array_equal(
            out['linker_mask'][..., 0].sum(-1), np.full(n, size, np.float32))
        # row-exact routing: frozen fragment coords round-trip per request
        nf = sample['num_atoms']
        for i in range(n):
            np.testing.assert_allclose(out['positions'][i, :nf],
                                       sample['positions'], atol=1e-4)


def test_service_overflow_and_second_bucket():
    cfg = _cfg()
    with SamplingService(cfg, _params(cfg), batch_size=4, max_wait_s=0.3,
                         node_buckets=(12, 16)) as svc:
        small = svc.submit(_raw_sample(5, 7), n_samples=1, size_spec=4)
        big = svc.submit(_raw_sample(20, 8), n_samples=1, size_spec=6)
        out_small = small.result(timeout=300)
        out_big = big.result(timeout=300)
    assert not out_small['nan_flag'].any()
    assert not out_big['nan_flag'].any()
    # 5+4=9 → the 12 bucket; 20+6=26 > 16 → the overflow sampler
    assert out_small['positions'].shape[1] == 12
    assert out_big['positions'].shape[1] >= 26
    assert svc.stats['batches'] == 2


def test_service_update_params_keeps_compiled_chains():
    cfg = _cfg()
    svc = SamplingService(cfg, _params(cfg, 0), batch_size=4, max_wait_s=0.05,
                          node_buckets=(16,))
    try:
        s = _raw_sample(5, 11)
        out0 = svc.generate(s, n_samples=2, size_spec=4)
        n_compiled = len(svc._samplers[(16, (None, None, None))]._compiled)
        assert svc.update_params(_params(cfg, 1)).result(timeout=60)
        out1 = svc.generate(s, n_samples=2, size_spec=4)
        # same compiled program, different weights → different linkers
        assert len(svc._samplers[(16, (None, None, None))]._compiled) == n_compiled
        nf = s['num_atoms']
        assert np.abs(out0['positions'][:, nf:nf + 4]
                      - out1['positions'][:, nf:nf + 4]).max() > 1e-4
    finally:
        svc.close()


def test_service_never_overshoots_the_compiled_batch_shape():
    """A wave stops BEFORE exceeding batch_size (the deferred request seeds
    the next wave), so every chain call runs at the one compiled shape; a
    single request bigger than batch_size is refused up front."""
    cfg = _cfg()
    with SamplingService(cfg, _params(cfg), batch_size=4, max_wait_s=0.5,
                         node_buckets=(16,)) as svc:
        with pytest.raises(ValueError, match='batch_size'):
            svc.submit(_raw_sample(5, 0), n_samples=5)
        futs = [svc.submit(_raw_sample(5, s), n_samples=3, size_spec=4)
                for s in (21, 22)]
        outs = [f.result(timeout=300) for f in futs]
    assert all(not o['nan_flag'].any() for o in outs)
    assert svc.stats['batches'] == 2       # 3+3 rows can't share one 4-row call
    assert len(svc._samplers[(16, (None, None, None))]._compiled) == 1  # ...but share ONE program


def test_service_rejects_after_close_and_bad_requests():
    cfg = _cfg()
    svc = SamplingService(cfg, _params(cfg), batch_size=4,
                          node_buckets=(16,))
    with pytest.raises(KeyError):
        svc.submit({'positions': np.zeros((3, 3), np.float32)})
    svc.close()
    with pytest.raises(RuntimeError):
        svc.submit(_raw_sample(5, 0))
    with pytest.raises(RuntimeError):
        # must raise, not return a Future that hangs on a dead worker
        svc.update_params(_params(cfg))


def test_serve_cli_end_to_end(tmp_path, monkeypatch):
    """Drive cli.serve's real main: two JSON-line requests through stdin,
    two result lines out, sdf files written."""
    from difflinker_tpu.cli import serve as serve_cli
    from difflinker_tpu.io.xyz import save_xyz_file

    cfg = _cfg()
    params = _params(cfg)
    monkeypatch.setattr(serve_cli, 'load_model',
                        lambda args: (cfg, params))

    one_hot = np.zeros((1, 5, 8), np.float32)
    one_hot[0, :, 0] = 1  # all carbon
    pos = np.asarray([[[0.0, 0, 0], [1.5, 0, 0], [0, 1.5, 0],
                       [3.0, 0, 0], [0, 3.0, 0]]], np.float32)
    mask = np.ones((1, 5), np.float32)
    (xyz_path,) = save_xyz_file(str(tmp_path), one_hot, pos, mask,
                                names=['frag'], is_geom=False)

    lines = [
        json.dumps({'fragments': xyz_path, 'n_samples': 2, 'linker_size': '3',
                    'out': str(tmp_path / 'out_a')}),
        json.dumps({'fragments': xyz_path, 'n_samples': 1, 'linker_size': '4',
                    'anchors': '1,5', 'out': str(tmp_path / 'out_b')}),
    ]
    monkeypatch.setattr('sys.stdin', io.StringIO('\n'.join(lines) + '\n'))
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = serve_cli.main(['--run', 'unused', '--batch-size', '4',
                             '--buckets', '16', '--max-wait-ms', '200',
                             '--out', str(tmp_path / 'default')])
    assert rc == 0
    results = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    assert len(results) == 2
    assert all('error' not in r for r in results), results
    assert results[0]['linker_sizes'] == [3, 3]
    assert results[1]['linker_sizes'] == [4]
    assert len(results[0]['files']) == 2 and len(results[1]['files']) == 1
    for r in results:
        for f in r['files']:
            assert os.path.exists(f) and os.path.getsize(f) > 0


def _pocket_cfg(in_node_nf=8, timesteps=5):
    from difflinker_tpu.config import (DatasetFamily, GraphType, PocketMode)
    return ExperimentConfig(
        model=ModelConfig(in_node_nf=in_node_nf, context_node_nf=3,
                          hidden_nf=16, n_layers=1, inv_sublayers=1,
                          norm_constant=1e-6, graph_type=GraphType.A4),
        diffusion=DiffusionConfig(timesteps=timesteps),
        data=DataConfig(family=DatasetFamily.MOAD,
                        pocket_mode=PocketMode.FULL),
        train=TrainConfig(lr=1e-3))


def _raw_pocket_sample(n_frag, n_pocket, seed, nf=8):
    rng = np.random.default_rng(seed)
    n = n_frag + n_pocket
    pos = rng.standard_normal((n, 3)).astype(np.float32) * 2
    one_hot = np.eye(nf, dtype=np.float32)[rng.integers(0, nf, n)]
    anchors = np.zeros(n, np.float32)
    anchors[[0, n_frag - 1]] = 1
    seg = np.zeros(n, np.float32)
    seg[:n_frag] = 1
    return {
        'uuid': seed, 'name': f'pk{seed}',
        'positions': pos, 'one_hot': one_hot,
        'charges': np.ones(n, np.float32) * 6, 'anchors': anchors,
        'fragment_only_mask': seg, 'pocket_mask': 1 - seg,
        'fragment_mask': np.ones(n, np.float32),
        'linker_mask': np.zeros(n, np.float32), 'num_atoms': n,
    }


def test_service_pocket_requests_cobatch_and_route():
    """Pocket-conditioned serving: MOAD-convention sample dicts ride the
    same batching path; frozen rows (fragments AND pocket) round-trip
    per request and the result carries the pocket mask for stripping."""
    cfg = _pocket_cfg()
    with SamplingService(cfg, _params(cfg), batch_size=8, max_wait_s=0.5,
                         node_buckets=(24,)) as svc:
        reqs = [(_raw_pocket_sample(4, 6, 31), 2, 3),
                (_raw_pocket_sample(5, 7, 32), 1, 4)]
        futs = [svc.submit(s, n_samples=n, size_spec=size)
                for s, n, size in reqs]
        outs = [f.result(timeout=300) for f in futs]
    assert svc.stats['batches'] == 1
    for (sample, n, size), out in zip(reqs, outs):
        assert out['positions'].shape[0] == n
        assert not out['nan_flag'].any()
        n_in = sample['num_atoms']
        assert out['pocket_mask'][..., 0].sum(-1).tolist() == [
            float(sample['pocket_mask'].sum())] * n
        np.testing.assert_array_equal(
            out['linker_mask'][..., 0].sum(-1), np.full(n, size, np.float32))
        for i in range(n):
            np.testing.assert_allclose(out['positions'][i, :n_in],
                                       sample['positions'], atol=1e-4)


def test_service_rejects_vocab_mismatch():
    cfg = _cfg()  # in_node_nf=8
    with SamplingService(cfg, _params(cfg), batch_size=4,
                         node_buckets=(16,)) as svc:
        bad = _raw_sample(5, 0)
        bad['one_hot'] = np.eye(9, dtype=np.float32)[
            np.zeros(5, np.int64)]
        with pytest.raises(ValueError, match='vocab mismatch'):
            svc.submit(bad)


def test_serve_cli_pocket_request(tmp_path, monkeypatch):
    """cli.serve end-to-end on a pocket model: the request carries a pre-cut
    pocket PDB; the written output is in the protein frame with the pocket
    rows stripped (generate_with_protein conventions)."""
    from difflinker_tpu.cli import serve as serve_cli
    from difflinker_tpu.io.xyz import load_xyz, save_xyz_file

    cfg = _pocket_cfg(in_node_nf=9)  # the GEOM vocab the parse path uses
    params = _params(cfg)
    monkeypatch.setattr(serve_cli, 'load_model', lambda args: (cfg, params))

    one_hot = np.zeros((1, 5, 9), np.float32)
    one_hot[0, :, 0] = 1  # all carbon
    pos = np.asarray([[[10.0, 0, 0], [11.5, 0, 0], [10.0, 1.5, 0],
                       [13.0, 0, 0], [10.0, 3.0, 0]]], np.float32)
    mask = np.ones((1, 5), np.float32)
    (xyz_path,) = save_xyz_file(str(tmp_path), one_hot, pos, mask,
                                names=['pkfrag'], is_geom=True)
    pdb_path = tmp_path / 'pocket.pdb'
    pdb_path.write_text(
        'ATOM      1   N  POC A   1      14.000   0.000   0.000'
        '  1.00  0.00           N\n'
        'ATOM      2   O  POC A   1      10.000   4.500   0.000'
        '  1.00  0.00           O\nEND\n')

    line = json.dumps({'fragments': xyz_path, 'pocket': str(pdb_path),
                       'n_samples': 1, 'linker_size': '3', 'anchors': '1,5',
                       'out': str(tmp_path / 'out')})
    monkeypatch.setattr('sys.stdin', io.StringIO(line + '\n'))
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = serve_cli.main(['--run', 'unused', '--batch-size', '4',
                             '--buckets', '16', '--max-wait-ms', '50'])
    assert rc == 0
    (result,) = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    assert 'error' not in result, result
    assert result['linker_sizes'] == [3]
    (sdf,) = result['files']
    out_xyz = sdf[:-4] + '.xyz'
    got_pos, symbols = load_xyz(out_xyz)
    # 5 fragment + 3 linker atoms; the 2 pocket atoms are stripped
    assert len(symbols) == 8
    # protein frame restored: fragment rows match the input file exactly
    np.testing.assert_allclose(got_pos[:5], pos[0], atol=1e-3)


def test_service_per_request_steps_and_sampler_variants():
    """VERDICT r4 item 6: per-request steps/sampler overrides. Same-variant
    requests co-batch; distinct variants run as separate chain calls on their
    own lazily compiled programs; no-op overrides normalize onto the default
    variant; latency percentiles are recorded."""
    cfg = _cfg(timesteps=8)
    with SamplingService(cfg, _params(cfg), batch_size=8, max_wait_s=0.5,
                         node_buckets=(16,)) as svc:
        default = svc.submit(_raw_sample(5, 1), n_samples=1, size_spec=4)
        # == defaults -> must reuse the default variant's program
        noop = svc.submit(_raw_sample(6, 2), n_samples=1, size_spec=4,
                          steps=8, sampler='ancestral')
        fast = svc.submit(_raw_sample(5, 3), n_samples=2, size_spec=4,
                          steps=4)
        ddim = svc.submit(_raw_sample(5, 4), n_samples=1, size_spec=4,
                          steps=4, sampler='ddim')
        # low-temperature lane: its own variant program (round 5)
        cold = svc.submit(_raw_sample(6, 5), n_samples=1, size_spec=4,
                          steps=4, noise_scale=0.7)
        noop_ns = svc.submit(_raw_sample(5, 6), n_samples=1, size_spec=4,
                             noise_scale=1.0)  # == default -> default lane
        outs = [f.result(timeout=300)
                for f in (default, noop, fast, ddim, cold, noop_ns)]

    for out in outs:
        assert not out['nan_flag'].any()
    # default+noop+noop_ns co-batch into one call; fast / ddim / cold each
    # their own
    assert svc.stats['batches'] == 4, svc.stats
    keys = set(svc._samplers)
    assert (16, (4, None, None)) in keys
    assert (16, (4, 'ddim', None)) in keys
    assert (16, (4, None, 0.7)) in keys
    # the fast variant respaces on the trained grid (exact subsequence)
    fast_cfg = svc._samplers[(16, (4, None, None))].cfg.diffusion
    assert fast_cfg.timesteps == 4 and fast_cfg.schedule_timesteps == 8
    ddim_cfg = svc._samplers[(16, (4, 'ddim', None))].cfg.diffusion
    assert ddim_cfg.sampler == 'ddim'
    cold_cfg = svc._samplers[(16, (4, None, 0.7))].cfg.diffusion
    assert cold_cfg.noise_scale == 0.7 and cold_cfg.sampler == 'ancestral'
    lat = svc.latency_percentiles()
    assert lat['count'] == 6 and lat['p95_s'] >= lat['p50_s'] > 0

    # validation errors surface in the caller
    with SamplingService(cfg, _params(cfg), batch_size=4,
                         node_buckets=(16,)) as svc2:
        with pytest.raises(ValueError, match='steps'):
            svc2.submit(_raw_sample(5, 5), steps=0)
        with pytest.raises(ValueError, match='sampler'):
            svc2.submit(_raw_sample(5, 5), sampler='euler')
        with pytest.raises(ValueError, match='noise_scale'):
            svc2.submit(_raw_sample(5, 5), noise_scale=-0.5)
        with pytest.raises(ValueError, match='ddim'):
            svc2.submit(_raw_sample(5, 5), sampler='ddim', noise_scale=0.7)


def test_service_variant_sampler_sees_param_swaps():
    """A lazily built variant created AFTER update_params must use the
    swapped weights, and an existing variant must be updated in place."""
    cfg = _cfg(timesteps=8)
    p0, p1 = _params(cfg, 0), _params(cfg, 1)
    with SamplingService(cfg, p0, batch_size=4, max_wait_s=0.05,
                         node_buckets=(16,)) as svc:
        svc.submit(_raw_sample(5, 1), size_spec=4, steps=4).result(timeout=300)
        svc.update_params(p1).result(timeout=300)
        # existing variant updated in place
        leaf0 = jax.tree.leaves(svc._samplers[(16, (4, None, None))].params)[0]
        leaf1 = jax.tree.leaves(p1)[0]
        np.testing.assert_array_equal(np.asarray(leaf0), np.asarray(leaf1))
        # new variant built after the swap uses the swapped weights
        svc.submit(_raw_sample(5, 2), size_spec=4, steps=2).result(timeout=300)
        leaf2 = jax.tree.leaves(svc._samplers[(16, (2, None, None))].params)[0]
        np.testing.assert_array_equal(np.asarray(leaf2), np.asarray(leaf1))


def test_service_variant_cache_is_bounded_lru():
    """Lazily built variant samplers are capped (max_variant_samplers): the
    least recently used beyond the cap is dropped (and rebuilds on its next
    request); the eagerly built default lanes are never evicted."""
    cfg = _cfg(timesteps=8)
    with SamplingService(cfg, _params(cfg), batch_size=4, max_wait_s=0.05,
                         node_buckets=(16,)) as svc:
        svc.max_variant_samplers = 2
        for steps in (2, 3):
            svc.submit(_raw_sample(5, steps), size_spec=4,
                       steps=steps).result(timeout=300)
        # touch steps=2 so steps=3 is the LRU entry
        svc.submit(_raw_sample(5, 9), size_spec=4, steps=2).result(timeout=300)
        svc.submit(_raw_sample(5, 4), size_spec=4, steps=4).result(timeout=300)
        keys = set(svc._samplers)
        assert (16, (2, None, None)) in keys      # recently used: kept
        assert (16, (4, None, None)) in keys      # newest: kept
        assert (16, (3, None, None)) not in keys  # LRU: evicted
        # default lanes are not part of the variant LRU
        assert (16, (None, None, None)) in keys
        assert (0, (None, None, None)) in keys
        # an evicted variant transparently rebuilds on its next request
        out = svc.submit(_raw_sample(5, 5), size_spec=4,
                         steps=3).result(timeout=300)
        assert not out['nan_flag'].any()
        assert (16, (3, None, None)) in set(svc._samplers)
