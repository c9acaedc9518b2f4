"""Tile-size heuristics for the Pallas attention kernels.

TPU analogue of the reference's per-head-dim block tables
(`flash_attn/flash_attn_interface.py:23` `_get_block_size_n` and
`hopper/tile_size.h`).  Sizes here are tuned for MXU (128x128) / VMEM
(~16MB per core) rather than SM occupancy: the lane dimension is always a
multiple of 128 and the score tile (block_q x block_k) plus double-buffered
K/V tiles must fit comfortably in VMEM.
"""

from __future__ import annotations

import dataclasses


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class FwdBlockSizes:
    block_q: int
    block_k: int
    # Compute subtile of block_k (0 = whole tile).  Boundary-heavy masks use
    # a large DMA tile with smaller compute subtiles: masked-out subtiles are
    # skipped by predication without shrinking the DMA.
    block_k_sub: int = 0


@dataclasses.dataclass(frozen=True)
class BwdBlockSizes:
    block_q_dq: int
    block_k_dq: int
    block_q_dkv: int
    block_k_dkv: int


def fwd_block_sizes(
    seqlen_q: int, seqlen_k: int, head_dim: int, boundary_heavy: bool = False
) -> FwdBlockSizes:
    # Tuned on TPU v5e (hdim128 seq8k sweep, 2026-08): large tiles amortise
    # softmax VPU work and per-grid-step pipeline overhead; VMEM is the
    # constraint (the f32 score tile is bq*bk_sub*4 bytes).  Causal/local
    # masks want a large DMA tile (block_k) with 1024-wide compute subtiles
    # so diagonal blocks skip masked subtiles by predication.
    bks = 0
    if head_dim <= 128:
        if boundary_heavy:
            bq, bk, bks = 1024, 4096, 1024
        else:
            bq, bk = 1024, 2048
    elif head_dim <= 192:
        bq, bk = 1024, 1024
    else:
        bq, bk = 512, 1024
    bq = min(bq, max(128, round_up(seqlen_q, 128)))
    bk = min(bk, max(128, round_up(seqlen_k, 128)))
    if bks:
        bks = min(bks, bk)
        if bk % bks:
            bks = 0
    return FwdBlockSizes(bq, bk, bks)


def bwd_block_sizes(
    seqlen_q: int, seqlen_k: int, head_dim: int, boundary_heavy: bool = False
) -> BwdBlockSizes:
    # v5e sweep (fwd+bwd, hdim128 seq8k): a 2048-wide KV tile wins in the
    # bwd kernels for dense AND (round 4) causal/local — per-tick overhead
    # is ~29% of a 1024x1024 tile's matmul time, so fewer/wider ticks win
    # once the scheduled kernel's static subtile combos skip the
    # masked-out halves of diagonal tiles (`_bwd_static_patterns`).
    if head_dim <= 128:
        bq, bk = 1024, 2048
    else:
        bq, bk = 512, 512
    bq = min(bq, max(128, round_up(seqlen_q, 128)))
    bk = min(bk, max(128, round_up(seqlen_k, 128)))
    return BwdBlockSizes(bq, bk, bq, bk)


@dataclasses.dataclass(frozen=True)
class VarlenBlockSizes:
    block_q: int
    block_k: int
    block_h: int


def varlen_block_sizes(total_q: int, total_k: int, nheads: int,
                       head_dim: int) -> VarlenBlockSizes:
    """Tiles for the scheduled packed-varlen kernel (`varlen_sched.py`).

    The scheduled grid walks host-built (q block, kv block) tile tables, so
    unlike the dense kernel its KV tile is both the DMA and the compute
    granularity.  On-device sweep (benchmarks/sweep_varlen_tiles.py, v5e):
    (1024, 1024, bh4) wins every case — uniform 8x2048 65.7 TF/s,
    uniform 4x4096 85.6, ragged 1x8k+31x256 74.6, mixed 52.4 — vs 37-67
    at the old (512, 512, bh4); block_h deepens the per-tick head
    pipeline the same way the dense kernel's does.
    """
    bq = min(1024, max(128, round_up(total_q, 128)))
    bk = min(1024, max(128, round_up(total_k, 128)))
    # Same VMEM cliff as the dense scheduled grid: at head_dim 256 a
    # 4-head block spills (19 TF/s) while bh2 runs 103.8 (v5e sweep,
    # uniform 4x2048 causal).
    bh = max(1, min(4 if head_dim <= 192 else 2, nheads))
    while nheads % bh:
        bh -= 1
    return VarlenBlockSizes(bq, bk, bh)
