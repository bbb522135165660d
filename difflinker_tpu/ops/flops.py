"""Analytic FLOP model for the EGNN denoiser and the diffusion chain.

Counts multiply-accumulates as 2 FLOPs (matmul (m,k)x(k,n) = 2mkn), covering
every dense op in models/egnn.py on the hot path (the reference equivalents:
GCL edge/node MLPs src/egnn.py:45-72, EquivariantUpdate :101-117, stacked
n_layers x inv_sublayers per src/egnn.py:157-178,181-238). Elementwise work
(SiLU, masking, adds) is excluded — it is bandwidth-, not FLOP-limited, and
<2% of the total at the shapes we run.

Used by bench.py to report achieved TFLOP/s and MFU against the chip's peak.
"""
from __future__ import annotations

from difflinker_tpu.config import ModelConfig

# Peak dense matmul throughput per chip, FLOP/s. Sources: public TPU spec
# tables (v5e: 197 TFLOP/s bf16; v4: 275 bf16; v3: 123 bf16). fp32 on TPU
# runs the MXU in passes — the conventional peak is 1/2 the bf16 number for
# v5e-class chips (fp32 inputs via 3-pass bf16x3 are slower still; XLA uses
# the default F32 path).
PEAK_FLOPS = {
    'TPU v5 lite': {'bfloat16': 197e12, 'float32': 98.5e12},
    'TPU v5': {'bfloat16': 459e12, 'float32': 229.5e12},
    'TPU v4': {'bfloat16': 275e12, 'float32': 137.5e12},
    'TPU v6 lite': {'bfloat16': 918e12, 'float32': 459e12},
}


def peak_flops(device_kind: str, dtype: str) -> float | None:
    for k, peaks in PEAK_FLOPS.items():
        if device_kind.startswith(k):
            return peaks.get(str(dtype))
    return None


def gcl_flops(B: int, N: int, H: int, E: int = 2, *, attention: bool = False,
              in_nf: int | None = None, out_nf: int | None = None,
              k: int | None = None) -> float:
    """One GCL (models/egnn.gcl_apply). in_nf/out_nf default to H. `k` set =
    the sparse K-neighbor layout (N*K edge rows instead of N^2)."""
    F_in = in_nf if in_nf is not None else H
    F_out = out_nf if out_nf is not None else H
    edges = N * (k if k else N)
    fl = 0.0
    # edge MLP lin0 (split-weight): src/dst pre-products + edge-feature slab
    fl += 2 * B * N * F_in * H * 2          # (B*N, F_in) @ (F_in, H) twice
    fl += 2 * B * edges * E * H             # edge_attr @ w_e over edge rows
    # edge MLP lin1: the dominant O(edges * H^2) matmul
    fl += 2 * B * edges * H * H
    if attention:
        fl += 2 * B * edges * H * 1
    # node MLP lin0 (split): h and agg slabs; lin1
    fl += 2 * B * N * F_in * H + 2 * B * N * H * H
    fl += 2 * B * N * H * F_out
    return fl


def coord_update_flops(B: int, N: int, H: int, E: int = 2,
                       k: int | None = None) -> float:
    """EquivariantUpdate (models/egnn.coord_update_apply)."""
    edges = N * (k if k else N)
    fl = 0.0
    fl += 2 * B * N * H * H * 2             # lin0 split pre-products
    fl += 2 * B * edges * E * H             # edge-feature slab
    fl += 2 * B * edges * H * H             # lin1
    fl += 2 * B * edges * H * 1             # lin_out
    return fl


def egnn_forward_flops(B: int, N: int, cfg: ModelConfig) -> float:
    """One full EGNN forward (dynamics_apply hot path)."""
    from difflinker_tpu.config import GraphType
    H = cfg.hidden_nf
    E = 24 * 2 if cfg.sin_embedding else 2  # [feat, dist0] concat width
    in_nf = cfg.dynamics_in_nf
    # layout precedence mirrors models/dynamics.py: tile-pair first, then
    # K-neighbor, else dense
    k = None
    if (cfg.tile_size and cfg.tile_neighbors
            and cfg.graph_type != GraphType.FC):
        # tile-pair layout: each row does M*T edge columns, not N
        k = min(cfg.tile_neighbors * cfg.tile_size, N)
    elif cfg.neighbor_k and cfg.graph_type != GraphType.FC:
        k = min(cfg.neighbor_k, N)
    fl = 2 * B * N * in_nf * H              # embedding
    per_block = (cfg.inv_sublayers
                 * gcl_flops(B, N, H, E, attention=cfg.attention, k=k)
                 + coord_update_flops(B, N, H, E, k=k))
    fl += cfg.n_layers * per_block
    fl += 2 * B * N * H * in_nf             # embedding_out
    return fl


def chain_flops(B: int, N: int, T: int, cfg: ModelConfig) -> float:
    """One reverse diffusion chain: T sample steps + the final decode
    (diffusion/edm.sample_chain) — T+1 EGNN forwards."""
    return (T + 1) * egnn_forward_flops(B, N, cfg)


def train_step_flops(B: int, N: int, cfg: ModelConfig,
                     remat: bool = True) -> float:
    """Forward + backward of the EDM loss. Backward of a matmul-dominated
    graph costs ~2x the forward (two grad matmuls per forward matmul); remat
    of each block re-runs its forward once more -> ~4x forward total with
    remat, ~3x without (config.resolve_remat decides per shape)."""
    return (4 if remat else 3) * egnn_forward_flops(B, N, cfg)
