"""Shared CLI plumbing: stdout tee logger, config/arg merging, run dirs."""
from __future__ import annotations

import argparse
import os
import sys
from datetime import datetime


class Logger:
    """Tee stdout to a log file (reference src/utils.py:8-23)."""

    def __init__(self, logpath: str, stream=None):
        self.terminal = stream or sys.stdout
        os.makedirs(os.path.dirname(logpath), exist_ok=True)
        self.log = open(logpath, 'a')

    def write(self, message):
        self.terminal.write(message)
        self.log.write(message)
        self.log.flush()

    def flush(self):
        self.terminal.flush()


def log(*args):
    print(f'[{datetime.now()}]', *args)


def setup_run_dirs(base_logs: str, base_ckpts: str, exp_name: str):
    start_time = datetime.now().strftime('date%d-%m_time%H-%M-%S.%f')
    run_id = f'{exp_name}_{start_time}'
    log_dir = os.path.join(base_logs, run_id)
    ckpt_dir = os.path.join(base_ckpts, run_id)
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(ckpt_dir, exist_ok=True)
    return run_id, log_dir, ckpt_dir


def add_config_arg(parser: argparse.ArgumentParser):
    parser.add_argument('--config', type=str, default=None,
                        help='YAML config (ours or reference-format)')
    return parser


def enable_compilation_cache(cache_dir: str = None):
    """Persistent XLA compilation cache for the CLI surface.

    The T=500 sampling chain compiles once per (batch, bucket) shape at
    20-40 s each on a TPU; caching compiled programs on disk makes repeat
    CLI invocations (the reference's sample.py resume loop, generate.py
    one-shot runs) start in seconds. Opt-out with
    DIFFLINKER_COMPILE_CACHE=off; override the directory by setting it to a
    path. No-op if the backend or jax version rejects the cache.
    """
    env = os.environ.get('DIFFLINKER_COMPILE_CACHE', '')
    if env.lower() in ('off', '0', 'none', 'disable', 'false'):
        return None
    if env.lower() in ('on', '1', 'true', 'yes'):
        env = ''  # enable with the default path, not a dir literally named '1'
    cache_dir = env or cache_dir or os.path.join(
        os.path.expanduser('~'), '.cache', 'difflinker_tpu', 'xla')
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # cache sub-second compiles too — many small host programs surround
        # the big chain (measured: the tunneled-TPU backend serialises fine)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
        return cache_dir
    except Exception:
        return None


def add_respacing_args(p):
    """--steps / --respace-mode / --resample-steps, shared by the sampling
    CLIs (sample, generate, generate_with_protein). Pair with
    apply_respacing(cfg, args)."""
    p.add_argument('--steps', type=int, default=None,
                   help='override the number of reverse-diffusion steps')
    p.add_argument('--resample-steps', type=int, default=1,
                   help='RePaint-style repeats per reverse step (re-noise + '
                        're-denoise so the generated part harmonises with '
                        'the conditioning part; chain cost scales linearly). '
                        'Works on both masked-linker and inpainting models.')
    p.add_argument('--noise-scale', type=float, default=1.0,
                   help='low-temperature sampling: scale the posterior noise '
                        'of every reverse transition (1.0 = exact ancestral '
                        'sampler; <1 trades diversity for validity)')
    p.add_argument('--respace-mode', type=str, default='subsequence',
                   choices=['subsequence', 'rebuild'],
                   help="how --steps respaces the chain: 'subsequence' reads "
                        "gamma off the trained grid (exact, the reference's "
                        "n_steps semantics); 'rebuild' regenerates the "
                        'schedule at T=steps (legacy)')
    p.add_argument('--sampler', type=str, default='ancestral',
                   choices=['ancestral', 'ddim'],
                   help="reverse integrator: 'ancestral' is the reference's "
                        "stochastic sampler; 'ddim' is the deterministic "
                        'eta=0 update (holds quality at far fewer --steps)')
    return p


def add_mesh_args(p):
    """--mesh / --mesh-atoms / --mesh-senders, shared by the train and
    sampling CLIs. Pair with build_mesh(args)."""
    p.add_argument('--mesh', type=int, default=None,
                   help='data-parallel devices (default: single device)')
    p.add_argument('--mesh-atoms', type=int, default=1,
                   help='atoms mesh axis: shard node axes over this many '
                        'devices (sequence parallelism — row-shards the '
                        'O(N^2 H) edge activations for HBM-bound '
                        'pocket-scale graphs; total devices = mesh * '
                        'mesh_atoms * mesh_senders)')
    p.add_argument('--mesh-senders', type=int, default=1,
                   help='senders mesh axis: additionally shard the SENDER '
                        'node axis of the (B, N, N, .) edge tensors (tensor '
                        'parallelism over the pairwise graph op; composes '
                        'multiplicatively with --mesh-atoms — per-device '
                        'edge blocks are (N/atoms x N/senders))')
    p.add_argument('--mesh-stages', type=int, default=1,
                   help='stages mesh axis: partition the EGNN blocks over '
                        'this many devices (pipeline parallelism — '
                        'node-sized point-to-point traffic only, at an '
                        '(S-1)/(M+S-1) bubble; dense layout only, exclusive '
                        'with --mesh-atoms/--mesh-senders; must be a '
                        'divisor of n_layers)')
    return p


def build_mesh(args):
    """Mesh from add_mesh_args flags: data×stages when --mesh-stages > 1,
    3-D data×atoms×senders when --mesh-senders > 1, 2-D data×atoms when
    --mesh-atoms > 1, 1-D data for --mesh > 1, else None (single device)."""
    from difflinker_tpu.parallel import mesh as mesh_lib
    if getattr(args, 'mesh_stages', 1) > 1:
        if (getattr(args, 'mesh_atoms', 1) > 1
                or getattr(args, 'mesh_senders', 1) > 1):
            raise SystemExit(
                '--mesh-stages (pipeline parallelism) does not compose with '
                '--mesh-atoms/--mesh-senders: the pipeline moves node-sized '
                'activations whole; shard the edge work with atoms/senders '
                'OR pipeline the blocks, not both')
        return mesh_lib.make_mesh_pp(args.mesh or 1, args.mesh_stages)
    if getattr(args, 'mesh_senders', 1) > 1:
        return mesh_lib.make_mesh_3d(args.mesh or 1,
                                     getattr(args, 'mesh_atoms', 1) or 1,
                                     args.mesh_senders)
    if getattr(args, 'mesh_atoms', 1) > 1:
        return mesh_lib.make_mesh_2d(args.mesh or 1, args.mesh_atoms)
    if getattr(args, 'mesh', None) and args.mesh > 1:
        return mesh_lib.make_mesh(args.mesh)
    return None


def apply_respacing(cfg, args):
    """Apply the add_respacing_args() flags to a loaded ExperimentConfig."""
    import dataclasses
    cfg = respace_config(cfg, args.steps, args.respace_mode)
    if args.resample_steps > 1:
        cfg = dataclasses.replace(
            cfg, diffusion=dataclasses.replace(
                cfg.diffusion, resample_steps=args.resample_steps))
    if getattr(args, 'noise_scale', 1.0) != 1.0:
        cfg = dataclasses.replace(
            cfg, diffusion=dataclasses.replace(
                cfg.diffusion, noise_scale=args.noise_scale))
    if getattr(args, 'sampler', 'ancestral') != 'ancestral':
        cfg = dataclasses.replace(
            cfg, diffusion=dataclasses.replace(
                cfg.diffusion, sampler=args.sampler))
    return cfg


def respace_config(cfg, steps, mode: str = 'subsequence'):
    """Apply a --steps override to an ExperimentConfig (canonical
    implementation: difflinker_tpu.config.respace_config — kept here as the
    CLI-facing alias)."""
    from difflinker_tpu.config import respace_config as _impl
    return _impl(cfg, steps, mode)
