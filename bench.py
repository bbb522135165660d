#!/usr/bin/env python
"""Headline benchmark: linker-sampling throughput at T=500 on one chip, with
analytic FLOPs/MFU accounting (ops/flops.py) and the pocket-model line.

Prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...,
     "tflops": ..., "mfu": ..., "pocket": {...}, "sweep": [...]}

Baseline: the PyTorch reference (igashov/DiffLinker) measured on this host
(torch CPU, single core, B=128, N=32, T=500 extrapolated from per-step time):
0.0197 linkers/s. No GPU exists in this container and the repo publishes no
numbers (BASELINE.md), so same-host-measured is the only honest denominator.

Implementation note: both lines run the dense XLA path — two generations of
fused Pallas kernels, a gather-based sparse path, and the block-sparse
tile-pair layout were all benchmarked against it and dense XLA wins at
these shapes (docs/ARCHITECTURE.md §5 has the full tables; exact-coverage
tile merely ties dense). The K-neighbor sparse path (ModelConfig.neighbor_k)
remains the opt-in for very large pockets (N >= 512).
"""
import dataclasses
import glob
import json
import os
import re
import sys
import time

import numpy as np

# measured via scripts/measure_reference_baseline.py on this host (1 CPU core)
REFERENCE_LINKERS_PER_SEC = 0.0197

T = 500


def _chain_throughput(edm, params, args_list, batch, runs=3):
    import jax

    fn = jax.jit(lambda p, k: edm.sample_chain(p, k, *args_list))
    out = fn(params, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    times = []
    for i in range(runs):
        t0 = time.perf_counter()
        out = fn(params, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return batch / dt, dt


def _zinc_inputs(B, N, n_frag=14):
    import jax.numpy as jnp
    from difflinker_tpu.ops.geometry import fc_edge_mask

    rng = np.random.default_rng(0)
    node_mask = np.ones((B, N, 1), np.float32)
    frag = np.zeros((B, N, 1), np.float32)
    frag[:, :n_frag] = 1
    link = node_mask - frag
    x = rng.standard_normal((B, N, 3)).astype(np.float32) * 2
    h = np.eye(8, dtype=np.float32)[rng.integers(0, 8, (B, N))]
    anchors = np.zeros((B, N, 1), np.float32)
    anchors[:, [2, n_frag - 1]] = 1
    ctx = np.concatenate([anchors, frag], -1)
    em = fc_edge_mask(jnp.asarray(node_mask))
    return [jnp.asarray(a) for a in (x, h, node_mask, frag, link)] + \
        [em, jnp.asarray(ctx)]


def _pocket_inputs(B, N, n_lig=40, n_pocket=160):
    import jax.numpy as jnp
    from difflinker_tpu.data.spatial import morton_codes

    rng = np.random.default_rng(1)
    node_mask = np.zeros((B, N, 1), np.float32)
    node_mask[:, :n_lig + n_pocket] = 1
    n_frag = n_lig // 2
    frag_only = np.zeros((B, N, 1), np.float32)
    frag_only[:, :n_frag] = 1
    pocket = np.zeros((B, N, 1), np.float32)
    pocket[:, n_lig:n_lig + n_pocket] = 1
    link = (node_mask - frag_only - pocket) * node_mask
    frag = frag_only + pocket  # MOAD convention: fragment = frag ∪ pocket
    x = (rng.standard_normal((B, N, 3)).astype(np.float32) * 6) * node_mask
    # pocket rows Morton-ordered, as the data layer provides
    # (LinkerDataset.spatially_sorted) — the tile layout's coverage depends
    # on row locality; real PDB pockets arrive residue-ordered anyway.
    for b in range(B):
        rows = np.arange(n_lig, n_lig + n_pocket)
        x[b, rows] = x[b, rows[np.argsort(morton_codes(x[b, rows]))]]
    h = np.eye(9, dtype=np.float32)[rng.integers(0, 9, (B, N))] * node_mask
    anchors = np.zeros((B, N, 1), np.float32)
    anchors[:, [0, n_frag - 1]] = 1
    ctx = np.concatenate([anchors, frag_only, pocket], -1) * node_mask
    return [jnp.asarray(a) for a in (x, h, node_mask, frag, link)] + \
        [None, jnp.asarray(ctx)]


def _train_setup(mcfg, B, N, make_batch):
    """(trainer, init state, synthetic batch) for a ModelConfig at shape
    (B, N). One cfg-assembly recipe shared by `_train_throughput` below and
    scripts/bench_train_breakdown.py — keeps the published MFU numbers
    comparable between the two."""
    import jax
    from difflinker_tpu.config import (DataConfig, DiffusionConfig,
                                       ExperimentConfig, PocketMode,
                                       TrainConfig)
    from difflinker_tpu.train.trainer import Trainer

    has_pocket = mcfg.context_node_nf == 3
    cfg = ExperimentConfig(
        model=mcfg, diffusion=DiffusionConfig(timesteps=T),
        data=DataConfig(pocket_mode=PocketMode.FULL if has_pocket
                        else PocketMode.NONE),
        train=TrainConfig())
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    return trainer, state, make_batch(B, N)


def _scan_clock(fn, args_, k_steps, runs=3):
    """min-of-`runs` seconds per iteration for a jitted fn that runs
    `k_steps` iterations inside ONE lax.scan program. Per-call host dispatch
    of a multi-hundred-leaf arg pytree costs tens of ms on this 1-core host
    and would otherwise dominate the ~10-20 ms device step (the round-2
    12.8%-MFU figure carried exactly that artifact — CLAUDE.md: benchmark
    inside a single jit/lax.scan)."""
    import jax

    out = fn(*args_)  # compile + warm
    jax.block_until_ready(out)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(*args_)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times) / k_steps


def _train_throughput(mcfg, B, N, make_batch, runs=3, k_steps=16):
    """Full jitted train step (loss + grads + AdamW) timings on one chip."""
    import jax
    import jax.numpy as jnp

    trainer, state, batch = _train_setup(mcfg, B, N, make_batch)

    @jax.jit
    def many(state, keys):
        def body(s, k):
            s2, m = trainer.train_step(s, batch, k, jnp.inf)
            return s2, m['loss']
        return jax.lax.scan(body, state, keys)

    keys = jax.random.split(jax.random.PRNGKey(1), k_steps)
    dt = _scan_clock(many, (state, keys), k_steps, runs)
    return B / dt, dt


def _zinc_train_batch(B, N, n_frag=14):
    import jax.numpy as jnp
    from difflinker_tpu.ops.geometry import fc_edge_mask
    x, h, node_mask, frag, link, em, ctx = _zinc_inputs(B, N, n_frag)
    anchors = jnp.zeros_like(frag).at[:, [2, n_frag - 1]].set(1.0)
    return {'positions': x, 'one_hot': h, 'atom_mask': node_mask,
            'fragment_mask': frag, 'linker_mask': link, 'anchors': anchors,
            'edge_mask': em}


def _pocket_train_batch(B, N, n_lig=40, n_pocket=160):
    import jax.numpy as jnp
    x, h, node_mask, frag, link, _, ctx = _pocket_inputs(B, N, n_lig,
                                                         n_pocket)
    frag_only = ctx[..., 1:2]
    pocket = ctx[..., 2:3]
    anchors = ctx[..., 0:1]
    return {'positions': x, 'one_hot': h, 'atom_mask': node_mask,
            'fragment_mask': frag, 'linker_mask': link, 'anchors': anchors,
            'fragment_only_mask': frag_only, 'pocket_mask': pocket}


def _previous_bench():
    """Parsed result dict of the newest BENCH_r{N}.json the driver recorded,
    or None — the regression guard's comparison point."""
    best_n, best = -1, None
    here = os.path.dirname(os.path.abspath(__file__))
    for p in glob.glob(os.path.join(here, 'BENCH_r*.json')):
        m = re.search(r'BENCH_r(\d+)\.json$', p)
        if not m:
            continue
        try:
            with open(p) as f:
                rec = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        parsed = rec.get('parsed')
        if parsed and int(m.group(1)) > best_n:
            best_n, best = int(m.group(1)), parsed
    return best


def _regressions(result, prev, threshold=0.10):
    """Entries whose throughput dropped > threshold vs the previous round."""
    pairs = [
        ('headline', result.get('value'), prev.get('value')),
        ('pocket', result.get('pocket', {}).get('value'),
         prev.get('pocket', {}).get('value')),
        ('respaced_T50', result.get('respaced_T50', {}).get('value'),
         prev.get('respaced_T50', {}).get('value')),
        ('pocket_n512_sparse',
         result.get('pocket_n512_sparse', {}).get('value'),
         prev.get('pocket_n512_sparse', {}).get('value')),
        ('pocket_n512_dense',
         result.get('pocket_n512_dense', {}).get('value'),
         prev.get('pocket_n512_dense', {}).get('value')),
        ('distilled_T8', result.get('distilled_T8', {}).get('value'),
         prev.get('distilled_T8', {}).get('value')),
        ('lowtemp_T25', result.get('lowtemp_T25', {}).get('value'),
         prev.get('lowtemp_T25', {}).get('value')),
        ('wide_h512', result.get('wide_h512', {}).get('value'),
         prev.get('wide_h512', {}).get('value')),
        ('train.zinc', result.get('train', {}).get('zinc', {}).get('value'),
         prev.get('train', {}).get('zinc', {}).get('value')),
        ('train.pocket',
         result.get('train', {}).get('pocket', {}).get('value'),
         prev.get('train', {}).get('pocket', {}).get('value')),
    ]
    out = []
    for name, now, before in pairs:
        if now is None or before is None or before <= 0:
            continue
        if now < (1.0 - threshold) * before:
            out.append({'entry': name, 'now': now, 'prev': before,
                        'drop_pct': round(100 * (1 - now / before), 1)})
    return out


def main():
    import jax

    from difflinker_tpu.config import (DiffusionConfig, GraphType,
                                       ModelConfig, resolve_remat)
    from difflinker_tpu.diffusion.edm import make_edm
    from difflinker_tpu.ops import flops as flops_lib

    kind = jax.devices()[0].device_kind
    peak16 = flops_lib.peak_flops(kind, 'bfloat16')

    # -- headline: ZINC flagship, bf16-mixed --------------------------------
    B, N = 256, 32
    zcfg = ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=128,
                       n_layers=8, inv_sublayers=2, norm_constant=1e-6,
                       dtype='bfloat16')
    edm = make_edm(zcfg, DiffusionConfig(timesteps=T))
    params = edm.init_params(jax.random.PRNGKey(0))
    linkers_per_sec, dt = _chain_throughput(edm, params, _zinc_inputs(B, N), B)
    fl = flops_lib.chain_flops(B, N, T, zcfg)
    tflops = fl / dt / 1e12
    mfu = fl / dt / peak16 if peak16 else float('nan')

    # -- pocket line: 4A distance graphs, bf16-mixed ------------------------
    # Dense is the fastest EXACT layout at this shape (measured 2026-08-16,
    # scripts/bench_kernels.py: dense 30.8 ms/fwd vs exact-coverage tile
    # 31.1 ms and sparse-K 58.9 ms; the K-neighbor layout overtakes at
    # N >= 512 and the tile layout is an opt-in speed/fidelity dial —
    # docs/ARCHITECTURE.md §5).
    Bp, Np = 32, 256
    p_inputs = _pocket_inputs(Bp, Np)
    pcfg = ModelConfig(in_node_nf=9, context_node_nf=3, hidden_nf=128,
                       n_layers=6, inv_sublayers=2, norm_constant=1e-6,
                       graph_type=GraphType.A4, dtype='bfloat16')
    pedm = make_edm(pcfg, DiffusionConfig(timesteps=T))
    pparams = pedm.init_params(jax.random.PRNGKey(0))
    p_impl = 'xla-dense'
    p_lps, p_dt = _chain_throughput(pedm, pparams, p_inputs, Bp, runs=2)
    p_fl = flops_lib.chain_flops(Bp, Np, T, pcfg)

    # -- sparse-K large-pocket line: N=512 (the regime where the K-neighbor
    # layout beats dense — ARCHITECTURE.md §5 item 3 measured 1.5×/3.2× at
    # N=512/1024; this standing entry keeps that path regression-guarded)
    Bs, Ns = 8, 512
    s_inputs = _pocket_inputs(Bs, Ns, n_lig=40, n_pocket=440)
    s_cfg = ModelConfig(in_node_nf=9, context_node_nf=3, hidden_nf=128,
                        n_layers=6, inv_sublayers=2, norm_constant=1e-6,
                        graph_type=GraphType.A4, dtype='bfloat16',
                        neighbor_k=32)
    sedm = make_edm(s_cfg, DiffusionConfig(timesteps=T))
    sparams = sedm.init_params(jax.random.PRNGKey(0))
    s_lps, s_dt = _chain_throughput(sedm, sparams, s_inputs, Bs, runs=2)
    s_fl = flops_lib.chain_flops(Bs, Ns, T, s_cfg)

    # -- dense N=512 counterpart (VERDICT r4 item 5): the sparse path's
    # claimed advantage at this shape was a one-off round-2 measurement;
    # this standing entry keeps the COMPARISON continuously verified, not
    # just the sparse path's absolute number.
    d_cfg = ModelConfig(in_node_nf=9, context_node_nf=3, hidden_nf=128,
                        n_layers=6, inv_sublayers=2, norm_constant=1e-6,
                        graph_type=GraphType.A4, dtype='bfloat16')
    dedm = make_edm(d_cfg, DiffusionConfig(timesteps=T))
    d_lps, d_dt = _chain_throughput(dedm, sparams, s_inputs, Bs, runs=2)
    d_fl = flops_lib.chain_flops(Bs, Ns, T, d_cfg)

    # -- respaced line: same ZINC model sampled at T=50 ----------------------
    # Ancestral subsequence respacing (--steps). Quality is measured flat
    # down to T=50 on a trained model (BASELINE.md "Respaced sampling",
    # scripts/bench_respacing.py): 91.8%/67.2% valid/V+C vs 92.6%/69.9% at
    # T=500. Cost is exactly O(T), so this is the effective per-chip
    # throughput a user gets by passing --steps 50.
    edm50 = make_edm(zcfg, DiffusionConfig(timesteps=50))
    r_lps, r_dt = _chain_throughput(edm50, params, _zinc_inputs(B, N), B)
    r_fl = flops_lib.chain_flops(B, N, 50, zcfg)

    # -- recommended low-T operating point: --steps 25 --noise-scale 0.7 ----
    # Low-temperature sampling holds quality where plain respacing degrades
    # (BASELINE.md round 5, docs/lowtemp_zinc_07.json: 84.0% V+C at T=25
    # noise 0.7 vs 86.3% at T=500 noise 1.0) — a ~20x quality-held
    # throughput multiplier over the T=500 headline.
    edm25 = make_edm(zcfg, DiffusionConfig(timesteps=25, noise_scale=0.7))
    lt_lps, lt_dt = _chain_throughput(edm25, params, _zinc_inputs(B, N), B)
    lt_fl = flops_lib.chain_flops(B, N, 25, zcfg)

    # -- distilled fast lane: progressive-distillation student at T=8 -------
    # (VERDICT r4 item 1; artifact produced by scripts/demo_distill.py,
    # quality table in docs/distill_results.json). Gated on the artifact so
    # the bench runs in fresh checkouts; the student is the wide 6x256 demo
    # model, so this line measures the SERVING operating point, not the
    # 8x128 reference-parity shape above.
    distilled = None
    d_npz = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         'examples', 'params',
                         'zinc_h256_t512_distill_T8.npz')
    if os.path.exists(d_npz):
        from difflinker_tpu.demo import load_demo_model
        dcfg_full, dparams, dmeta = load_demo_model(d_npz)
        dmc = dataclasses.replace(dcfg_full.model, dtype='bfloat16')
        dedm2 = make_edm(dmc, dcfg_full.diffusion)
        dl_lps, dl_dt = _chain_throughput(dedm2, dparams, _zinc_inputs(B, N),
                                          B)
        dl_fl = flops_lib.chain_flops(B, N, dcfg_full.diffusion.timesteps,
                                      dmc)
        distilled = {
            'metric': f'distilled student chain (T='
                      f'{dcfg_full.diffusion.timesteps} ddim on the trained '
                      f'T={dcfg_full.diffusion.schedule_timesteps} grid, '
                      f'B={B}, N={N}, 6x256 EGNN bf16)',
            'value': round(dl_lps, 2),
            'unit': 'linkers/sec/chip',
            'vs_baseline': round(dl_lps / REFERENCE_LINKERS_PER_SEC, 1),
            'mfu': round(dl_fl / dl_dt / peak16, 4) if peak16 else None,
            'quality': 'docs/distill_results.json',
        }

    # -- TPU-width flagship: H=512 demo model (artifact-gated) --------------
    # Width is the measured TPU recommendation (ARCHITECTURE.md §5: MFU
    # climbs 10% -> 41% from H=128 to H=512 because the MXU tiles fill).
    # This line pins the sampling MFU of the trained 6x512 flagship
    # (quality: docs/demo_learning_h512.json + docs/respacing_h512.json);
    # the 8x128 headline above stays the reference-parity shape.
    wide512 = None
    w_npz = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         'examples', 'params', 'zinc_h512.npz')
    if os.path.exists(w_npz):
        from difflinker_tpu.demo import load_demo_model
        wcfg_full, wparams, _ = load_demo_model(w_npz)
        wmc = dataclasses.replace(wcfg_full.model, dtype='bfloat16')
        wedm = make_edm(wmc, DiffusionConfig(timesteps=T))
        w_lps, w_dt = _chain_throughput(wedm, wparams, _zinc_inputs(B, N), B)
        w_fl = flops_lib.chain_flops(B, N, T, wmc)
        wide512 = {
            'metric': f'wide flagship chain (T={T}, B={B}, N={N}, '
                      f'{wmc.n_layers}x{wmc.hidden_nf} EGNN bf16) — the '
                      'TPU-width recommendation',
            'value': round(w_lps, 2),
            'unit': 'linkers/sec/chip',
            'vs_baseline': round(w_lps / REFERENCE_LINKERS_PER_SEC, 1),
            'tflops': round(w_fl / w_dt / 1e12, 2),
            'mfu': round(w_fl / w_dt / peak16, 4) if peak16 else None,
            'quality': 'docs/demo_learning_h512.json',
        }

    # -- training lines: full fused step, auto-remat policy ------------------
    # (VERDICT r3: train MFU per shape; remat='auto' drops the per-block
    # checkpoint exactly where the backward fits HBM — config.resolve_remat)
    Bt, Nt = 128, 32
    t_lps, t_dt = _train_throughput(zcfg, Bt, Nt, _zinc_train_batch)
    t_remat = resolve_remat(zcfg, (Bt, Nt))
    t_fl = flops_lib.train_step_flops(Bt, Nt, zcfg, remat=t_remat)
    pt_lps, pt_dt = _train_throughput(pcfg, Bp, Np, _pocket_train_batch,
                                      runs=2)
    pt_remat = resolve_remat(pcfg, (Bp, Np))
    pt_fl = flops_lib.train_step_flops(Bp, Np, pcfg, remat=pt_remat)

    result = {
        'metric': f'linker sampling throughput (T={T}, B={B}, N={N}, '
                  f'ZINC 8x128 EGNN bf16, {kind})',
        'value': round(linkers_per_sec, 2),
        'unit': 'linkers/sec/chip',
        'vs_baseline': round(linkers_per_sec / REFERENCE_LINKERS_PER_SEC, 1),
        'tflops': round(tflops, 2),
        'mfu': round(mfu, 4),
        'impl': 'xla-dense (beats pallas/sparse at this shape, '
                'docs/ARCHITECTURE.md §5)',
        'pocket': {
            'metric': f'pocket 4A sampling (T={T}, B={Bp}, N={Np}, '
                      '6x128 EGNN bf16)',
            'value': round(p_lps, 2),
            'unit': 'linkers/sec/chip',
            'impl': p_impl,
            'tflops': round(p_fl / p_dt / 1e12, 2),
            'mfu': round(p_fl / p_dt / peak16, 4) if peak16 else None,
        },
        'pocket_n512_sparse': {
            'metric': f'large-pocket 4A sampling, sparse-K layout (T={T}, '
                      f'B={Bs}, N={Ns}, K=32, 6x128 EGNN bf16)',
            'value': round(s_lps, 2),
            'unit': 'linkers/sec/chip',
            'impl': 'sparse-K (neighbor_lists + gather; exact when K >= max '
                    'degree — ARCHITECTURE.md §5 item 3)',
            'tflops': round(s_fl / s_dt / 1e12, 2),
            'mfu': round(s_fl / s_dt / peak16, 4) if peak16 else None,
        },
        'pocket_n512_dense': {
            'metric': f'large-pocket 4A sampling, dense layout (T={T}, '
                      f'B={Bs}, N={Ns}, 6x128 EGNN bf16) — the sparse '
                      'line\'s comparison point',
            'value': round(d_lps, 2),
            'unit': 'linkers/sec/chip',
            'impl': 'xla-dense',
            'tflops': round(d_fl / d_dt / 1e12, 2),
            'mfu': round(d_fl / d_dt / peak16, 4) if peak16 else None,
            'sparse_over_dense': round(s_lps / d_lps, 2),
        },
        **({'distilled_T8': distilled} if distilled else {}),
        **({'wide_h512': wide512} if wide512 else {}),
        'respaced_T50': {
            'metric': f'same model, --steps 50 (quality flat to T=50, '
                      'BASELINE.md respacing study)',
            'value': round(r_lps, 2),
            'unit': 'linkers/sec/chip',
            'vs_baseline': round(r_lps / REFERENCE_LINKERS_PER_SEC, 1),
            'mfu': round(r_fl / r_dt / peak16, 4) if peak16 else None,
        },
        'lowtemp_T25': {
            'metric': 'same model, --steps 25 --noise-scale 0.7 (the '
                      'measured low-T recommendation, BASELINE.md round 5; '
                      'quality docs/lowtemp_zinc_07.json)',
            'value': round(lt_lps, 2),
            'unit': 'linkers/sec/chip',
            'vs_baseline': round(lt_lps / REFERENCE_LINKERS_PER_SEC, 1),
            'mfu': round(lt_fl / lt_dt / peak16, 4) if peak16 else None,
        },
        'train': {
            'zinc': {
                'metric': f'ZINC train step (B={Bt}, N={Nt}, 8x128 bf16, '
                          f'remat={"on" if t_remat else "off(auto)"})',
                'value': round(t_lps, 1),
                'unit': 'mol/sec/chip',
                'mfu': round(t_fl / t_dt / peak16, 4) if peak16 else None,
            },
            'pocket': {
                'metric': f'pocket train step (B={Bp}, N={Np}, 6x128 bf16 '
                          f'4A, remat={"on" if pt_remat else "off(auto)"})',
                'value': round(pt_lps, 1),
                'unit': 'mol/sec/chip',
                'mfu': round(pt_fl / pt_dt / peak16, 4) if peak16 else None,
            },
        },
    }
    # Regression guard (VERDICT r3 item 5): any standing entry dropping >10%
    # vs the newest recorded BENCH_r{N}.json fails the run loudly (rc=1; the
    # driver records rc alongside the JSON).
    rc = 0
    prev = _previous_bench()
    if prev is not None:
        regs = _regressions(result, prev)
        if regs:
            result['regression_vs_prev'] = regs
            print(f'bench REGRESSION vs previous round: {regs}',
                  file=sys.stderr)
            rc = 1
    print(json.dumps(result))
    return rc


if __name__ == '__main__':
    sys.exit(main())
