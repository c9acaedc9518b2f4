"""Pallas TPU flash-attention backward kernels.

TPU-native redesign of the reference FA2 backward path
(`csrc/flash_attn/src/flash_bwd_kernel.h`, preprocess
`flash_bwd_preprocess_kernel.h`, launch logic
`flash_bwd_launch_template.h:78-124`).  The CUDA kernel is dKV-stationary and
accumulates dQ through global-memory atomics (or a serialized grid in
deterministic mode).  TPUs have no atomics, so we use the two-kernel
recompute split that maps naturally onto the MXU:

* ``dq`` kernel: grid (b, h, nq, nk), dQ accumulated in VMEM scratch across
  the KV-block loop.  Always deterministic (the reference's
  ``deterministic=True`` mode is our only mode).
* ``dkv`` kernel: grid (b, hk, nk, nq*g), dK/dV accumulated in VMEM scratch
  across the fused (q-block x gqa-group) loop; GQA head-group reduction
  happens in-kernel rather than via a postprocess sum.

Both kernels recompute the score tile from Q/K and normalise with the saved
LSE (p = exp(s - lse)), the same residual strategy the CUDA kernel uses.
The dO*O row-sum preprocess is left to XLA (a bandwidth-bound fused
reduction needs no hand-written kernel on TPU).

Causal/local/varlen block skipping follows the same clamped-index-map +
``pl.when`` scheme as the forward kernel.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.env import use_interpret
from flash_attn_tpu.kernels.block_sizes import bwd_block_sizes, round_up
from flash_attn_tpu.kernels.flash_fwd import (
    LOG2E,
    MASK_VALUE,
    _SCHED_BIAS,
    FwdParams,
    _kv_block_bounds,
    dropout_keep,
)

# Row-statistics (LSE, delta) are carried with a small replicated lane dim so
# the block shape is tileable without 128x HBM amplification.
STAT_LANES = 8


@dataclasses.dataclass(frozen=True)
class BwdParams:
    scale: float
    causal: bool
    window_left: int
    window_right: int
    softcap: float
    has_alibi: bool
    g: int
    block_q: int
    block_k: int
    dropout_p: float = 0.0
    attention_chunk: int = 0
    # >0: the forward hashed dropout with PACKED-stream coordinates
    # (varlen_sched kernel: batch 0, absolute token positions).  Value =
    # batch count; the seed SMEM array then carries per-sequence q/k
    # offsets at [1:1+b] / [1+b:1+2b] and keep masks are computed as
    # (0, h, row + qoff[b], col + koff[b]) so the padded backward
    # reproduces the packed forward's mask bit-for-bit.
    packed_dropout: int = 0
    # Score-consistency mode: q_ref holds q * scale * log2(e) rounded to
    # the input dtype — BITWISE the forward's folded Q — and lse_ref holds
    # lse * log2(e), so pmat = exp2(s - lse) reproduces the forward's
    # probabilities exactly (the reference bwd's scale_softmax_log2 role,
    # `flash_bwd_kernel.h`).  Without this, at large score magnitudes the
    # bwd's recomputed p diverges exponentially from the fwd's.
    folded: bool = False

    @property
    def wr(self) -> int:
        return 0 if self.causal else self.window_right

    @property
    def has_upper(self) -> bool:
        return self.causal or self.window_right >= 0

    @property
    def has_lower(self) -> bool:
        return self.window_left >= 0

    def as_fwd(self, num_kv_blocks: int) -> FwdParams:
        return FwdParams(
            scale=self.scale,
            causal=self.causal,
            window_left=self.window_left,
            window_right=self.window_right,
            softcap=self.softcap,
            has_alibi=self.has_alibi,
            g=self.g,
            block_q=self.block_q,
            block_k=self.block_k,
            num_kv_blocks=num_kv_blocks,
        )


def _bwd_keep(p: BwdParams, seed_ref, b, hq, rows, cols):
    """Dropout keep mask matching the forward that produced the lse (see
    BwdParams.packed_dropout)."""
    if p.packed_dropout:
        nb = p.packed_dropout
        return dropout_keep(
            seed_ref[0], 0, hq, rows + seed_ref[1 + b],
            cols + seed_ref[1 + nb + b], p.dropout_p)
    return dropout_keep(seed_ref[0], b, hq, rows, cols, p.dropout_p)


def _bwd_dq_kernel(p: BwdParams, sq_ref, sk_ref, *refs):
    refs = list(refs)
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = refs[:6]
    refs = refs[6:]
    slopes_ref = refs.pop(0) if p.has_alibi else None
    seed_ref = refs.pop(0) if p.dropout_p > 0.0 else None
    dq_ref, dq_acc = refs

    b = pl.program_id(0)
    hq = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)
    bq, bk = p.block_q, p.block_k
    sq_b = sq_ref[b]
    sk_b = sk_ref[b]

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    min_ki, max_ki = _kv_block_bounds(p.as_fwd(nk), qi, sq_b, sk_b)
    should_compute = jnp.logical_and(ki >= min_ki, ki <= max_ki)

    @pl.when(should_compute)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse_row = lse_ref[0, 0][:, :1]  # (bq, 1)
        delta_row = delta_ref[0, 0][:, :1]

        rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        offset = sk_b - sq_b

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s_cap = None
        if not p.folded:
            s = s * p.scale
            if p.softcap > 0.0:
                s_cap = jnp.tanh(s / p.softcap) * p.softcap
                s = s_cap
            if p.has_alibi:
                slope = slopes_ref[b, hq]
                s = s - slope * jnp.abs(rows + offset - cols).astype(
                    jnp.float32)

        mask = cols >= sk_b
        if p.has_upper:
            mask = jnp.logical_or(mask, cols > rows + offset + p.wr)
        if p.has_lower:
            mask = jnp.logical_or(mask, cols < rows + offset - p.window_left)
        if p.attention_chunk > 0:
            cc = p.attention_chunk
            mask = jnp.logical_or(mask, cols // cc != (rows + offset) // cc)
        s = jnp.where(mask, MASK_VALUE, s)

        # folded: s and lse are both in scale*log2(e) units -> pmat is
        # bitwise the forward's probability (underflows to 0 when masked)
        pmat = jnp.exp2(s - lse_row) if p.folded else (
            jnp.exp2((s - lse_row) * LOG2E))
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if p.dropout_p > 0.0:
            keep = _bwd_keep(p, seed_ref, b, hq, rows, cols)
            dp = jnp.where(keep, dp, 0.0) * (1.0 / (1.0 - p.dropout_p))
        ds = pmat * (dp - delta_row)
        if p.softcap > 0.0:
            ds = ds * (1.0 - (s_cap / p.softcap) ** 2)
        if p.folded:
            # scale folds into the (small) K tile instead of the score tile
            dq_acc[...] += jax.lax.dot_general(
                ds.astype(k.dtype), k * jnp.asarray(p.scale, k.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            ds = ds * p.scale
            dq_acc[...] += jax.lax.dot_general(
                ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def _q_block_bounds(p: BwdParams, ki, sq_b, sk_b):
    """Inclusive [min_qi, max_qi] of q blocks contributing to k block ki."""
    offset = sk_b - sq_b
    c0 = ki * p.block_k
    c1 = ki * p.block_k + p.block_k - 1
    if p.has_upper:
        # need row_max + offset + wr >= c0
        min_qi = jnp.maximum(0, (c0 - offset - max(p.wr, 0)) // p.block_q)
    else:
        min_qi = 0
    nq_valid = (sq_b + p.block_q - 1) // p.block_q
    max_qi = nq_valid - 1
    if p.has_lower:
        # need row_min + offset - wl <= c1
        max_qi = jnp.minimum(max_qi, (c1 - offset + p.window_left) // p.block_q)
    return min_qi, max_qi


def _bwd_dkv_kernel(p: BwdParams, sq_ref, sk_ref, *refs):
    refs = list(refs)
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = refs[:6]
    refs = refs[6:]
    slopes_ref = refs.pop(0) if p.has_alibi else None
    seed_ref = refs.pop(0) if p.dropout_p > 0.0 else None
    dk_ref, dv_ref, dk_acc, dv_acc = refs

    b = pl.program_id(0)
    hk_i = pl.program_id(1)
    ki = pl.program_id(2)
    t = pl.program_id(3)
    nt = pl.num_programs(3)
    bq, bk = p.block_q, p.block_k
    qi = t // p.g  # t = qi * g + gi
    sq_b = sq_ref[b]
    sk_b = sk_ref[b]

    @pl.when(t == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    min_qi, max_qi = _q_block_bounds(p, ki, sq_b, sk_b)
    in_range = jnp.logical_and(qi >= min_qi, qi <= max_qi)
    k_valid = ki * bk < sk_b
    should_compute = jnp.logical_and(in_range, k_valid)

    @pl.when(should_compute)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse_row = lse_ref[0, 0][:, :1]
        delta_row = delta_ref[0, 0][:, :1]

        rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        offset = sk_b - sq_b

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s_cap = None
        if not p.folded:
            s = s * p.scale
            if p.softcap > 0.0:
                s_cap = jnp.tanh(s / p.softcap) * p.softcap
                s = s_cap
            if p.has_alibi:
                slope = slopes_ref[b, hk_i * p.g + t % p.g]
                s = s - slope * jnp.abs(rows + offset - cols).astype(
                    jnp.float32)

        mask = cols >= sk_b
        if p.has_upper:
            mask = jnp.logical_or(mask, cols > rows + offset + p.wr)
        if p.has_lower:
            mask = jnp.logical_or(mask, cols < rows + offset - p.window_left)
        if p.attention_chunk > 0:
            cc = p.attention_chunk
            mask = jnp.logical_or(mask, cols // cc != (rows + offset) // cc)
        s = jnp.where(mask, MASK_VALUE, s)

        pmat = jnp.exp2(s - lse_row) if p.folded else (
            jnp.exp2((s - lse_row) * LOG2E))
        pd = pmat
        if p.dropout_p > 0.0:
            keep = _bwd_keep(p, seed_ref, b, hk_i * p.g + t % p.g,
                             rows, cols)
            rp = 1.0 / (1.0 - p.dropout_p)
            pd = jnp.where(keep, pmat, 0.0) * rp
        # dV += Pd^T dO
        dv_acc[...] += jax.lax.dot_general(
            pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if p.dropout_p > 0.0:
            dp = jnp.where(keep, dp, 0.0) * rp
        ds = pmat * (dp - delta_row)
        if p.softcap > 0.0:
            ds = ds * (1.0 - (s_cap / p.softcap) ** 2)
        if not p.folded:
            ds = ds * p.scale
        # dK += dS^T Q  (folded: q holds q*scale*log2e — compensated by the
        # constant 1/(log2e) at flush; the scale factor is exactly the one
        # dK needs)
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(t == nt - 1)
    def _finalize():
        dk = dk_acc[...]
        if p.folded:
            dk = dk * (1.0 / LOG2E)
        dk_ref[0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _fused_tile_body(p: BwdParams, q_ref, k_ref, v_ref, do_ref, lse_ref,
                     delta_ref, slopes_ref, seed_ref, dq_all, dk_acc, dv_acc,
                     b, hk_i, ki, qi, gi, dq_off, sq_b, sk_b, *,
                     masked: bool):
    """One (q block, kv block) tile of the fused backward: 5 matmuls
    (S = QK^T, dV += P^T dO, dP = dO V^T, dK += dS^T Q, dQ += dS K) plus
    the recomputed softmax.  `masked=False` skips the elementwise mask —
    interior tiles of a causal/local schedule run a select/iota-free body
    (the reference's masked/unmasked mainloop split,
    `flash_bwd_kernel.h` n_masking_steps analogue)."""
    bq, bk = p.block_q, p.block_k
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse_row = lse_ref[0, 0][:, :1]
    delta_row = delta_ref[0, 0][:, :1]

    need_pos = masked or p.has_alibi or p.dropout_p > 0.0 \
        or p.attention_chunk > 0
    if need_pos:
        rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    offset = sk_b - sq_b

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s_cap = None
    if not p.folded:
        s = s * p.scale
        if p.softcap > 0.0:
            s_cap = jnp.tanh(s / p.softcap) * p.softcap
            s = s_cap
        if p.has_alibi:
            slope = slopes_ref[b, hk_i * p.g + gi]
            s = s - slope * jnp.abs(rows + offset - cols).astype(
                jnp.float32)

    if masked:
        mask = cols >= sk_b
        if p.has_upper:
            mask = jnp.logical_or(mask, cols > rows + offset + p.wr)
        if p.has_lower:
            mask = jnp.logical_or(mask, cols < rows + offset - p.window_left)
        if p.attention_chunk > 0:
            cc = p.attention_chunk
            mask = jnp.logical_or(mask, cols // cc != (rows + offset) // cc)
        s = jnp.where(mask, MASK_VALUE, s)

    pmat = jnp.exp2(s - lse_row) if p.folded else (
        jnp.exp2((s - lse_row) * LOG2E))
    pd = pmat
    if p.dropout_p > 0.0:
        keep = _bwd_keep(p, seed_ref, b, hk_i * p.g + gi,
                         rows, cols)
        rp = 1.0 / (1.0 - p.dropout_p)
        pd = jnp.where(keep, pmat, 0.0) * rp
    # dV += Pd^T dO
    dv_acc[...] += jax.lax.dot_general(
        pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if p.dropout_p > 0.0:
        dp = jnp.where(keep, dp, 0.0) * rp
    ds = pmat * (dp - delta_row)
    if p.softcap > 0.0:
        ds = ds * (1.0 - (s_cap / p.softcap) ** 2)
    if not p.folded:
        ds = ds * p.scale
    ds_lp = ds.astype(q.dtype)
    # dK += dS^T Q (folded: q holds q*scale*log2e — the 1/log2e
    # compensation is applied at flush)
    dk_acc[...] += jax.lax.dot_general(
        ds_lp, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dQ[qi, gi] += dS K  (shared-recompute half of the dq kernel;
    # folded: scale rides on the small K tile)
    k_dq = k * jnp.asarray(p.scale, k.dtype) if p.folded else k
    dq_all[pl.dslice(dq_off, bq), :] += jax.lax.dot_general(
        ds_lp, k_dq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fused_tile_static_body(p: BwdParams, q_ref, k_ref, v_ref, do_ref,
                            lse_ref, delta_ref, dq_all, dk_acc, dv_acc,
                            dq_off, codes, bias_refs):
    """Static-combo variant of `_fused_tile_body` for boundary ticks whose
    mask geometry is compile-time (see `_bwd_static_patterns`): the tile is
    walked in subtiles — fully-masked subtiles are skipped entirely (no
    matmuls), partially-masked ones add a VMEM-resident bias pattern
    instead of computing iota/compare/where, interior ones run mask-free.
    Only reachable with no alibi/dropout/attention_chunk."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse_col = lse_ref[0, 0][:, :1]
    delta_col = delta_ref[0, 0][:, :1]
    fr, fc = len(codes), len(codes[0])
    brq, brk = p.block_q // fr, p.block_k // fc
    for ri in range(fr):
        qs = q[ri * brq:(ri + 1) * brq]
        dos = do[ri * brq:(ri + 1) * brq]
        lse_row = lse_col[ri * brq:(ri + 1) * brq]
        delta_row = delta_col[ri * brq:(ri + 1) * brq]
        # coalesce runs of adjacent interior subtiles into one wider
        # matmul — per-dot overhead (~0.1us) dominates at 512-wide ops
        runs = []
        ci = 0
        while ci < fc:
            code = codes[ri][ci]
            if code == 1:
                w = 1
                while ci + w < fc and codes[ri][ci + w] == 1:
                    w += 1
                runs.append((ci, w, 1))
                ci += w
            else:
                if code != 0:
                    runs.append((ci, 1, code))
                ci += 1
        for ci, w, code in runs:
            ks = k[ci * brk:(ci + w) * brk]
            vs = v[ci * brk:(ci + w) * brk]
            s = jax.lax.dot_general(
                qs, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s_cap = None
            if not p.folded:
                s = s * p.scale
                if p.softcap > 0.0:
                    s_cap = jnp.tanh(s / p.softcap) * p.softcap
                    s = s_cap
            if code >= 2:
                s = s + bias_refs[code - 2][...]
            pmat = jnp.exp2(s - lse_row) if p.folded else (
                jnp.exp2((s - lse_row) * LOG2E))
            dv_acc[pl.dslice(ci * brk, w * brk), :] += jax.lax.dot_general(
                pmat.astype(dos.dtype), dos, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                dos, vs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = pmat * (dp - delta_row)
            if p.softcap > 0.0:
                ds = ds * (1.0 - (s_cap / p.softcap) ** 2)
            if not p.folded:
                ds = ds * p.scale
            ds_lp = ds.astype(qs.dtype)
            dk_acc[pl.dslice(ci * brk, w * brk), :] += jax.lax.dot_general(
                ds_lp, qs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            k_dq = ks * jnp.asarray(p.scale, ks.dtype) if p.folded else ks
            dq_all[pl.dslice(dq_off + ri * brq, brq), :] += (
                jax.lax.dot_general(
                    ds_lp, k_dq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))


def _bwd_fused_kernel(p: BwdParams, nq: int, sq_ref, sk_ref, *refs):
    """Single-pass backward: dK/dV stationary per kv block (as
    `_bwd_dkv_kernel`) plus a whole-head dQ accumulator in VMEM scratch,
    so the score/dP recompute is shared — 5 matmuls per (q, kv) tile
    instead of the 7 the two-kernel split pays.  The TPU analogue of the
    reference's single-loop dKV-stationary backward
    (`csrc/flash_attn/src/flash_bwd_kernel.h`), with the VMEM accumulator
    playing the role of the atomic/semaphore dQ accumulation.

    The dq output tile for (head, q block) is written on *every* kv-block
    pass with the accumulator's current slab; the grid visits it last at
    ki == nk-1, by which point every contribution has landed, so the final
    write wins (earlier partial writes are dead stores).
    """
    refs = list(refs)
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = refs[:6]
    refs = refs[6:]
    slopes_ref = refs.pop(0) if p.has_alibi else None
    seed_ref = refs.pop(0) if p.dropout_p > 0.0 else None
    dq_ref, dk_ref, dv_ref, dq_all, dk_acc, dv_acc = refs

    b = pl.program_id(0)
    hk_i = pl.program_id(1)
    ki = pl.program_id(2)
    t = pl.program_id(3)
    nt = pl.num_programs(3)
    bq, bk = p.block_q, p.block_k
    qi = t // p.g
    gi = t % p.g
    sq_b = sq_ref[b]
    sk_b = sk_ref[b]
    dq_off = (gi * nq + qi) * bq  # row offset into the (g*nq*bq, d) scratch

    @pl.when(jnp.logical_and(ki == 0, t == 0))
    def _init_dq():
        dq_all[...] = jnp.zeros_like(dq_all)

    @pl.when(t == 0)
    def _init_dkv():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    min_qi, max_qi = _q_block_bounds(p, ki, sq_b, sk_b)
    in_range = jnp.logical_and(qi >= min_qi, qi <= max_qi)
    k_valid = ki * bk < sk_b
    should_compute = jnp.logical_and(in_range, k_valid)

    @pl.when(should_compute)
    def _compute():
        _fused_tile_body(
            p, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
            slopes_ref, seed_ref, dq_all, dk_acc, dv_acc,
            b, hk_i, ki, qi, gi, dq_off, sq_b, sk_b, masked=True,
        )

    # Write the dq slab only on the LAST kv pass (the accumulator is
    # complete there).  The out index map parks every earlier tick on the
    # first real target, so Pallas coalesces them into one run and copies
    # the buffer out exactly once per (head, q block) — removing the
    # ~nk x dq HBM write amplification of the old write-every-tick form.
    @pl.when(ki == pl.num_programs(2) - 1)
    def _flush_dq():
        dq_ref[0, 0] = dq_all[pl.dslice(dq_off, bq), :].astype(dq_ref.dtype)

    @pl.when(t == nt - 1)
    def _finalize():
        dk = dk_acc[...]
        if p.folded:
            dk = dk * (1.0 / LOG2E)
        dk_ref[0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


# dQ scratch ceiling for the fused kernel: g * sq_p * d * 4 bytes must fit
# VMEM alongside the working tiles.
_FUSED_DQ_SCRATCH_LIMIT = 48 * 1024 * 1024


def _bwd_fused(p, q, k, v, do, lse_r, delta_r, slopes, seed,
               seqused_q, seqused_k, sq, sk, sq_p, sk_p, dv_dim):
    b, h, _, d = q.shape
    hk = k.shape[1]
    g = p.g
    bq, bk = p.block_q, p.block_k
    nq = sq_p // bq
    nk = sk_p // bk

    def qhead_map(b_, hk_, ki, t, sq_ref, sk_ref):
        qi = t // g
        gi = t % g
        min_qi, max_qi = _q_block_bounds(p, ki, sq_ref[b_], sk_ref[b_])
        qi_eff = jnp.clip(qi, jnp.maximum(min_qi, 0), jnp.maximum(max_qi, 0))
        qi_eff = jnp.clip(qi_eff, 0, nq - 1)
        return (b_, hk_ * g + gi, qi_eff, 0)

    def dq_out_map(b_, hk_, ki, t, *_):
        # park every pre-final kv pass on the first real target: Pallas
        # coalesces the constant-index run into ONE output copy, and the
        # (ki == nk-1, t == 0) tick — same index — writes the real slab
        # before the run ends, so no garbage is ever copied (see the
        # kernel's _flush_dq)
        real = ki == nk - 1
        return (b_, jnp.where(real, hk_ * g + t % g, hk_ * g),
                jnp.where(real, t // g, 0), 0)

    def kv_map(b_, hk_, ki, t, *_):
        return (b_, hk_, ki, 0)

    in_specs = [
        pl.BlockSpec((1, 1, bq, d), qhead_map),
        pl.BlockSpec((1, 1, bk, d), kv_map),
        pl.BlockSpec((1, 1, bk, dv_dim), kv_map),
        pl.BlockSpec((1, 1, bq, dv_dim), qhead_map),
        pl.BlockSpec((1, 1, bq, STAT_LANES), qhead_map),
        pl.BlockSpec((1, 1, bq, STAT_LANES), qhead_map),
    ]
    inputs = [q, k, v, do, lse_r, delta_r]
    if slopes is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(slopes)
    if p.dropout_p > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(seed)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, p, nq),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, hk, nk, nq * g),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, bq, d), dq_out_map),
                pl.BlockSpec((1, 1, bk, d), kv_map),
                pl.BlockSpec((1, 1, bk, dv_dim), kv_map),
            ],
            scratch_shapes=[
                pltpu.VMEM((g * nq * bq, d), jnp.float32),
                pltpu.VMEM((bk, d), jnp.float32),
                pltpu.VMEM((bk, dv_dim), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, hk, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b, hk, sk_p, dv_dim), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "arbitrary", "arbitrary"
            ),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=use_interpret(),
    )(seqused_q, seqused_k, *inputs)
    return dq[:, :, :sq, :], dk[:, :, :sk, :], dv[:, :, :sk, :]


# Scheduled fused-backward flags (see _build_bwd_schedule)
_BWDS_INIT = 1      # very first entry: zero the whole-head dQ accumulator
_BWDS_FIRST = 2     # first entry of this kv block: zero dK/dV accumulators
_BWDS_LAST = 4      # last entry of this kv block: flush dK/dV
_BWDS_BOUNDARY = 8  # tile needs the elementwise mask
_BWDS_COMPUTE = 16  # run the compute body (filler entries omit it)
_BWDS_DQFLUSH = 32  # last visit of this (q block, head): write the dq slab


def _build_bwd_schedule(p: BwdParams, sq: int, sk: int, nq: int, nk: int):
    """Flatten the KV-stationary (kv block, q block x group) space into
    exactly the pairs the mask needs — the backward twin of the forward's
    `_build_schedule` (reference: `SingleTileBwdLPTScheduler` +
    n_masking_steps split, `hopper/tile_scheduler.hpp:368`,
    `flash_bwd_kernel.h`).  Static full lengths only.

    The rectangular fused grid predicates ~half its ticks away under a
    causal mask (each skipped tick still costs a pipeline slot); here the
    host enumerates only contributing (ki, qi) pairs.  dQ correctness:
    entries are ordered ki-ascending, so the LAST scheduled visit of any q
    block carries the completed accumulator slab and its dq write wins.

    Returns (ki_tab, t_tab, fl_tab, dqo_tab) int32 arrays; t = qi * g + gi.
    """
    import numpy as np

    off = sk - sq
    bq, bk, g = p.block_q, p.block_k, p.g
    ki_tab, t_tab, fl_tab = [], [], []
    visited = set()
    for ki in range(nk):
        c0, c1 = ki * bk, ki * bk + bk - 1
        min_qi, max_qi = 0, nq - 1
        if c0 < sk:
            if p.has_upper:
                min_qi = max(0, (c0 - off - max(p.wr, 0)) // bq)
            max_qi = (sq + bq - 1) // bq - 1
            if p.has_lower:
                max_qi = min(max_qi, (c1 - off + p.window_left) // bq)
        if c0 >= sk or min_qi > max_qi:
            # no contributing q blocks: still emit one entry so the dk/dv
            # tiles are written (zeros)
            ki_tab.append(ki)
            t_tab.append(0)
            fl_tab.append(_BWDS_FIRST | _BWDS_LAST)
            continue
        for qi in range(min_qi, max_qi + 1):
            r0, r1 = qi * bq, qi * bq + bq - 1
            interior = c1 < sk and r1 < sq and p.attention_chunk == 0
            if p.has_upper:
                interior = interior and c1 <= r0 + off + p.wr
            if p.has_lower:
                interior = interior and c0 >= r1 + off - p.window_left
            visited.add(qi)
            for gi in range(g):
                fl = _BWDS_COMPUTE | (0 if interior else _BWDS_BOUNDARY)
                if qi == min_qi and gi == 0:
                    fl |= _BWDS_FIRST
                if qi == max_qi and gi == g - 1:
                    fl |= _BWDS_LAST
                ki_tab.append(ki)
                t_tab.append(qi * g + gi)
                fl_tab.append(fl)
    # q blocks no kv block touches (e.g. causal with sk < sq): filler
    # entries that just write their (zeroed) dq slab
    for qi in range(nq):
        if qi not in visited:
            for gi in range(g):
                ki_tab.append(0)
                t_tab.append(qi * g + gi)
                fl_tab.append(0)
    fl_tab[0] |= _BWDS_INIT
    # dq flush points: the LAST visit of each (q block, group head) has the
    # completed accumulator slab.  dqo_tab carries the NEXT flush's t value
    # backward, so the dq out-block index is constant between flushes and
    # Pallas copies each slab out exactly once (write-every-tick caused a
    # ~(#visits)x dq HBM write amplification).
    last_of = {}
    for i, t in enumerate(t_tab):
        last_of[t] = i
    for i in last_of.values():
        fl_tab[i] |= _BWDS_DQFLUSH
    dqo_tab = np.zeros(len(t_tab), np.int32)
    nxt = t_tab[-1]
    for i in range(len(t_tab) - 1, -1, -1):
        if fl_tab[i] & _BWDS_DQFLUSH:
            nxt = t_tab[i]
        dqo_tab[i] = nxt
    pm_tab, combos, biases = _bwd_static_patterns(
        p, sq, sk, ki_tab, t_tab, fl_tab)
    return (np.asarray(ki_tab, np.int32), np.asarray(t_tab, np.int32),
            np.asarray(fl_tab, np.int32), dqo_tab, pm_tab, combos, biases)


def _bwd_static_patterns(p: BwdParams, sq: int, sk: int,
                         ki_tab, t_tab, fl_tab):
    """Classify boundary ticks whose mask is a compile-time constant.

    A boundary tick fully inside the key range depends only on
    rel = (col origin - row origin) - (sk - sq): every causal diagonal
    tile shares one rel.  Such ticks get a *static combo*: the (bq, bk)
    mask is split into subtiles, each classified skip / interior /
    masked-with-resident-bias — the backward twin of the forward's
    `_static_bias_patterns` + subtile combos.  The 5-matmul body then
    skips the fully-masked subtile of the diagonal (25% of its FLOPs at
    2x2) and replaces the iota/compare/where mask (5 VPU passes over the
    f32 score tile) with one additive bias from a VMEM-resident pattern.

    Rows past sq need no mask: padded LSE is +inf so p == 0 there.

    Returns (pm_tab, combos, biases): pm_tab[i] = 0 (dynamic) or combo
    index + 1; combos = tuple of subtile-code grids (0 skip, 1 interior,
    j >= 2 masked with biases[j - 2]); biases = list of f32 arrays.
    """
    import numpy as np

    n = len(ki_tab)
    pm_tab = np.zeros(n, np.int32)
    static_ok = (p.attention_chunk == 0 and not p.has_alibi
                 and p.dropout_p == 0.0
                 and os.environ.get("FLASH_ATTN_TPU_BWD_STATIC") != "0")
    if not static_ok:
        return pm_tab, (), []
    bq, bk, g = p.block_q, p.block_k, p.g
    # Subtile granularity: 512x512 is the swept optimum (256 halves the
    # MXU tiles' M/N and loses more to per-dot overhead than the extra
    # skipped FLOPs recover; 1024 skips too coarsely).  Env override keeps
    # the legacy "split each dim in SUB" semantics for sweeps.
    sub = int(os.environ.get("FLASH_ATTN_TPU_BWD_STATIC_SUB", "0"))
    if sub:
        fr = sub if sub > 1 and bq % sub == 0 and (bq // sub) % 256 == 0 \
            else 1
        fc = sub if sub > 1 and bk % sub == 0 and (bk // sub) % 128 == 0 \
            else 1
    else:
        sr = int(os.environ.get("FLASH_ATTN_TPU_BWD_STATIC_SR", "512"))
        sc = int(os.environ.get("FLASH_ATTN_TPU_BWD_STATIC_SC", "512"))
        fr = bq // sr if bq % sr == 0 else 1
        fc = bk // sc if bk % sc == 0 else 1
    brq, brk = bq // fr, bk // fc
    off = sk - sq
    rel_combo: dict = {}
    combos: list = []
    biases: list = []
    bias_keys: dict = {}
    for i in range(n):
        if not (fl_tab[i] & _BWDS_COMPUTE) or not (fl_tab[i] & _BWDS_BOUNDARY):
            continue
        ki = int(ki_tab[i])
        qi = int(t_tab[i]) // g
        if (ki + 1) * bk > sk:
            continue  # key-range end mask is dynamic
        rel = ki * bk - qi * bq - off
        if rel not in rel_combo:
            if len(combos) >= 4:
                continue  # pattern budget: keep the rest dynamic
            rows = np.arange(bq)[:, None]
            cols = rel + np.arange(bk)[None, :]
            mask = np.zeros((bq, bk), bool)
            if p.has_upper:
                mask |= cols > rows + p.wr
            if p.has_lower:
                mask |= cols < rows - p.window_left
            grid = []
            for ri in range(fr):
                row = []
                for ci in range(fc):
                    m = mask[ri * brq:(ri + 1) * brq,
                             ci * brk:(ci + 1) * brk]
                    if m.all():
                        row.append(0)
                    elif not m.any():
                        row.append(1)
                    else:
                        key = m.tobytes()
                        if key not in bias_keys:
                            bias_keys[key] = len(biases)
                            biases.append(np.where(
                                m, _SCHED_BIAS, 0.0).astype(np.float32))
                        row.append(2 + bias_keys[key])
                grid.append(tuple(row))
            rel_combo[rel] = len(combos)
            combos.append(tuple(grid))
        pm_tab[i] = rel_combo[rel] + 1
    return pm_tab, tuple(combos), biases


def _bwd_fused_sched_kernel(p: BwdParams, nq: int, sq: int, sk: int,
                            combos, n_bias: int,
                            ki_ref, t_ref, fl_ref, dqo_ref, pm_ref, *refs):
    """Scheduled-grid fused backward: grid (b, hk, T) walking host-built
    (kv block, q block x group) tables — zero wasted ticks under
    causal/local masks, interior ticks run the mask-free body, and
    static-geometry boundary ticks (pm > 0) run per-combo subtile bodies
    with resident bias patterns (see `_bwd_static_patterns`)."""
    refs = list(refs)
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = refs[:6]
    refs = refs[6:]
    slopes_ref = refs.pop(0) if p.has_alibi else None
    seed_ref = refs.pop(0) if p.dropout_p > 0.0 else None
    bias_refs = [refs.pop(0) for _ in range(n_bias)]
    dq_ref, dk_ref, dv_ref, dq_all, dk_acc, dv_acc = refs

    b = pl.program_id(0)
    hk_i = pl.program_id(1)
    i = pl.program_id(2)
    bq = p.block_q
    ki = ki_ref[i]
    t = t_ref[i]
    fl = fl_ref[i]
    pm = pm_ref[i]
    qi = t // p.g
    gi = t % p.g
    dq_off = (gi * nq + qi) * bq

    @pl.when((fl & _BWDS_INIT) != 0)
    def _init_dq():
        dq_all[...] = jnp.zeros_like(dq_all)

    @pl.when((fl & _BWDS_FIRST) != 0)
    def _init_dkv():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    compute = (fl & _BWDS_COMPUTE) != 0
    boundary = (fl & _BWDS_BOUNDARY) != 0

    def body(masked):
        _fused_tile_body(
            p, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
            slopes_ref, seed_ref, dq_all, dk_acc, dv_acc,
            b, hk_i, ki, qi, gi, dq_off, sq, sk, masked=masked,
        )

    @pl.when(jnp.logical_and(compute, jnp.logical_not(boundary)))
    def _interior():
        body(False)

    @pl.when(jnp.logical_and(compute,
                             jnp.logical_and(boundary, pm == 0)))
    def _boundary():
        body(True)

    for pi, codes in enumerate(combos):
        @pl.when(jnp.logical_and(compute, pm == pi + 1))
        def _static(codes=codes):
            _fused_tile_static_body(
                p, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dq_all, dk_acc, dv_acc, dq_off, codes, bias_refs,
            )

    # write the dq slab only at the (gi, qi)'s LAST visit; the out index
    # map (dqo_tab) parks intermediate ticks on the upcoming flush target
    # so the buffer is copied out exactly once per slab
    @pl.when((fl & _BWDS_DQFLUSH) != 0)
    def _flush_dq():
        dq_ref[0, 0] = dq_all[pl.dslice(dq_off, bq), :].astype(dq_ref.dtype)

    @pl.when((fl & _BWDS_LAST) != 0)
    def _finalize():
        dk = dk_acc[...]
        if p.folded:
            dk = dk * (1.0 / LOG2E)
        dk_ref[0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_fused_sched(p, q, k, v, do, lse_r, delta_r, slopes, seed,
                     sq, sk, sq_p, sk_p, dv_dim):
    """Launch the scheduled fused backward (static full lengths)."""
    b, h, _, d = q.shape
    hk = k.shape[1]
    g = p.g
    bq, bk = p.block_q, p.block_k
    nq = sq_p // bq
    nk = sk_p // bk
    (ki_tab, t_tab, fl_tab, dqo_tab, pm_tab, combos,
     bias_arrays) = _build_bwd_schedule(p, sq, sk, nq, nk)
    T = len(ki_tab)

    def qhead_map(b_, hk_, i, ki_r, t_r, fl_r, dqo_r, pm_r):
        t = t_r[i]
        return (b_, hk_ * g + t % g, t // g, 0)

    def dq_out_map(b_, hk_, i, ki_r, t_r, fl_r, dqo_r, pm_r):
        # constant between dq flushes (see _build_bwd_schedule.dqo_tab)
        t = dqo_r[i]
        return (b_, hk_ * g + t % g, t // g, 0)

    def kv_map(b_, hk_, i, ki_r, t_r, fl_r, dqo_r, pm_r):
        return (b_, hk_, ki_r[i], 0)

    def const_map(*_):
        return (0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, bq, d), qhead_map),
        pl.BlockSpec((1, 1, bk, d), kv_map),
        pl.BlockSpec((1, 1, bk, dv_dim), kv_map),
        pl.BlockSpec((1, 1, bq, dv_dim), qhead_map),
        pl.BlockSpec((1, 1, bq, STAT_LANES), qhead_map),
        pl.BlockSpec((1, 1, bq, STAT_LANES), qhead_map),
    ]
    inputs = [q, k, v, do, lse_r, delta_r]
    if slopes is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(slopes)
    if p.dropout_p > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(seed)
    for arr in bias_arrays:
        # resident mask-bias patterns: constant index map, fetched once
        in_specs.append(pl.BlockSpec(arr.shape, const_map))
        inputs.append(jnp.asarray(arr))

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_sched_kernel, p, nq, sq, sk,
                          combos, len(bias_arrays)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(b, hk, T),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, bq, d), dq_out_map),
                pl.BlockSpec((1, 1, bk, d), kv_map),
                pl.BlockSpec((1, 1, bk, dv_dim), kv_map),
            ],
            scratch_shapes=[
                pltpu.VMEM((g * nq * bq, d), jnp.float32),
                pltpu.VMEM((bk, d), jnp.float32),
                pltpu.VMEM((bk, dv_dim), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, hk, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b, hk, sk_p, dv_dim), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=use_interpret(),
    )(ki_tab, t_tab, fl_tab, dqo_tab, pm_tab, *inputs)
    return dq[:, :, :sq, :], dk[:, :, :sk, :], dv[:, :, :sk, :]


def flash_attn_bwd_bhsd(
    do,
    q,
    k,
    v,
    o,
    lse,
    seqused_q,
    seqused_k,
    *,
    softmax_scale: float,
    causal: bool = False,
    window_size=(-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    dropout_p: float = 0.0,
    dropout_seed=None,
    attention_chunk: int = 0,
    block_q: int | None = None,
    block_k: int | None = None,
    dlse=None,
    dropout_packed_offsets=None,
    full_lengths: bool = False,
):
    """Backward flash attention on (b, h, s, d)-layout operands.

    do/q/o: (b, h, sq, d); k/v: (b, hk, sk, d); lse: (b, h, sq) float32.
    `dlse` (b, h, sq) is the cotangent of the LSE output (nonzero when the
    LSE feeds later math, e.g. ring-attention merges / split combines);
    since d(lse)/d(s) = p, it folds into the delta term: ds = p * (dp -
    (delta - dlse)).  Returns (dq, dk, dv) in input dtypes with k/v grads
    already group-reduced for GQA (reference `run_mha_bwd`,
    `flash_api.cpp:757`).
    """
    b, h, sq, d = q.shape
    _, hk, sk, _ = k.shape
    dv_dim = v.shape[-1]  # may differ from d (MLA shapes, FA3 hdim_v)
    g = h // hk

    # one-sided window normalisation (reference `flash_api.cpp:141-142`;
    # see flash_attn_fwd_bhsd)
    if window_size[0] >= 0 and window_size[1] < 0:
        window_size = (window_size[0], sk)
    elif window_size[1] >= 0 and window_size[0] < 0 and not causal:
        window_size = (sk, window_size[1])
    boundary_heavy = causal or window_size[0] >= 0 or window_size[1] >= 0
    bs = bwd_block_sizes(sq, sk, d, boundary_heavy=boundary_heavy)
    bq = block_q or bs.block_q_dq
    bk = block_k or bs.block_k_dq
    sq_p = round_up(max(sq, bq), bq)
    sk_p = round_up(max(sk, bk), bk)

    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # (b, h, sq) — the dO . O preprocess (`flash_bwd_preprocess_kernel.h`)
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)

    # Score consistency with the forward (see BwdParams.folded): reproduce
    # the forward's Q folding bit-for-bit and move LSE to log2 units, so
    # the recomputed probabilities match the forward's exactly.  The fwd
    # folds iff no softcap/alibi and not fp8 (`flash_fwd.py`).
    # (fp8 guard: the forward never folds fp8 inputs — rounding q*scale
    # back to fp8 would destroy gradient precision if an fp8 backward were
    # ever added.)
    fp8_q = jnp.issubdtype(q.dtype, jnp.floating) and q.dtype.itemsize == 1
    folded = softcap == 0.0 and alibi_slopes is None and not fp8_q
    if folded:
        q = (q.astype(jnp.float32)
             * (float(softmax_scale) * LOG2E)).astype(q.dtype)
        lse = lse * LOG2E

    def pad_s(x, target, axis=2):
        padw = [(0, 0)] * x.ndim
        padw[axis] = (0, target - x.shape[axis])
        return jnp.pad(x, padw) if target != x.shape[axis] else x

    q, do, o = (pad_s(x, sq_p) for x in (q, do, o))
    k, v = (pad_s(x, sk_p) for x in (k, v))
    # Pad LSE with +inf so padded rows have p == 0 in the dkv kernel.
    lse = jnp.pad(
        lse, ((0, 0), (0, 0), (0, sq_p - lse.shape[2])), constant_values=jnp.inf
    ) if sq_p != lse.shape[2] else lse
    delta = pad_s(delta, sq_p)

    lse_r = jnp.broadcast_to(lse[..., None], (*lse.shape, STAT_LANES))
    delta_r = jnp.broadcast_to(delta[..., None], (*delta.shape, STAT_LANES))

    nq = sq_p // bq
    nk = sk_p // bk

    p = BwdParams(
        scale=float(softmax_scale),
        causal=bool(causal),
        window_left=int(window_size[0]),
        window_right=int(window_size[1]),
        softcap=float(softcap),
        has_alibi=alibi_slopes is not None,
        g=g,
        block_q=bq,
        block_k=bk,
        dropout_p=float(dropout_p),
        attention_chunk=int(attention_chunk),
        folded=folded,
        packed_dropout=b if dropout_packed_offsets is not None else 0,
    )
    seed = jnp.asarray(
        0 if dropout_seed is None else dropout_seed, jnp.int32
    ).reshape(1)
    if dropout_packed_offsets is not None:
        qoff, koff = dropout_packed_offsets
        seed = jnp.concatenate([
            seed, jnp.asarray(qoff, jnp.int32).reshape(b),
            jnp.asarray(koff, jnp.int32).reshape(b)])

    slopes = None
    if alibi_slopes is not None:
        slopes = jnp.broadcast_to(
            jnp.asarray(alibi_slopes, jnp.float32).reshape(-1, h), (b, h)
        )
    seqused_q = jnp.asarray(seqused_q, jnp.int32)
    seqused_k = jnp.asarray(seqused_k, jnp.int32)

    # ---- Scheduled fused kernel: causal/local masks with static full
    # lengths walk host-built tile tables (no wasted predicated ticks,
    # interior ticks mask-free) — see _build_bwd_schedule. ----
    fits_scratch = g * sq_p * d * 4 <= _FUSED_DQ_SCRATCH_LIMIT
    if (full_lengths and (p.has_upper or p.has_lower) and fits_scratch
            and os.environ.get("FLASH_ATTN_TPU_NO_SCHED_BWD") != "1"):
        return _bwd_fused_sched(
            p, q, k, v, do, lse_r, delta_r, slopes, seed,
            sq, sk, sq_p, sk_p, dv_dim,
        )

    # ---- Fused single-pass kernel (default): dKV stationary + whole-head
    # dQ accumulator in scratch; falls back to the two-kernel split when the
    # dQ scratch would not fit VMEM. ----
    if fits_scratch:
        return _bwd_fused(
            p, q, k, v, do, lse_r, delta_r, slopes, seed,
            seqused_q, seqused_k, sq, sk, sq_p, sk_p, dv_dim,
        )

    # ---- dQ kernel: grid (b, h, nq, nk) ----
    def q_map(b_, h_, qi, ki, *_):
        return (b_, h_, qi, 0)

    def kv_map_dq(b_, h_, qi, ki, sq_ref, sk_ref):
        min_ki, max_ki = _kv_block_bounds(p.as_fwd(nk), qi, sq_ref[b_], sk_ref[b_])
        ki_eff = jnp.clip(ki, jnp.maximum(min_ki, 0), jnp.maximum(max_ki, 0))
        ki_eff = jnp.clip(ki_eff, 0, nk - 1)
        return (b_, h_ // g, ki_eff, 0)

    def stat_map(b_, h_, qi, ki, *_):
        return (b_, h_, qi, 0)

    in_specs = [
        pl.BlockSpec((1, 1, bq, d), q_map),
        pl.BlockSpec((1, 1, bk, d), kv_map_dq),
        pl.BlockSpec((1, 1, bk, dv_dim), kv_map_dq),
        pl.BlockSpec((1, 1, bq, dv_dim), q_map),
        pl.BlockSpec((1, 1, bq, STAT_LANES), stat_map),
        pl.BlockSpec((1, 1, bq, STAT_LANES), stat_map),
    ]
    inputs = [q, k, v, do, lse_r, delta_r]
    if slopes is not None:
        # Whole array in SMEM; kernels index [b, h] (Mosaic requires SMEM
        # blocks to cover the full array).
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(slopes)
    if dropout_p > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(seed)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, p),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, h, nq, nk),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, bq, d), q_map),
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=use_interpret(),
    )(seqused_q, seqused_k, *inputs)

    # ---- dKV kernel: grid (b, hk, nk, nq * g) ----
    def qhead_map(b_, hk_, ki, t, sq_ref, sk_ref):
        qi = t // g
        gi = t % g
        min_qi, max_qi = _q_block_bounds(p, ki, sq_ref[b_], sk_ref[b_])
        qi_eff = jnp.clip(qi, jnp.maximum(min_qi, 0), jnp.maximum(max_qi, 0))
        qi_eff = jnp.clip(qi_eff, 0, nq - 1)
        return (b_, hk_ * g + gi, qi_eff, 0)

    def kv_map_dkv(b_, hk_, ki, t, *_):
        return (b_, hk_, ki, 0)

    in_specs2 = [
        pl.BlockSpec((1, 1, bq, d), qhead_map),
        pl.BlockSpec((1, 1, bk, d), kv_map_dkv),
        pl.BlockSpec((1, 1, bk, dv_dim), kv_map_dkv),
        pl.BlockSpec((1, 1, bq, dv_dim), qhead_map),
        pl.BlockSpec((1, 1, bq, STAT_LANES), qhead_map),
        pl.BlockSpec((1, 1, bq, STAT_LANES), qhead_map),
    ]
    inputs2 = [q, k, v, do, lse_r, delta_r]
    if slopes is not None:
        in_specs2.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs2.append(slopes)
    if dropout_p > 0.0:
        in_specs2.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs2.append(seed)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, p),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, hk, nk, nq * g),
            in_specs=in_specs2,
            out_specs=[
                pl.BlockSpec((1, 1, bk, d), kv_map_dkv),
                pl.BlockSpec((1, 1, bk, dv_dim), kv_map_dkv),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk, d), jnp.float32),
                pltpu.VMEM((bk, dv_dim), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, hk, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b, hk, sk_p, dv_dim), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=use_interpret(),
    )(seqused_q, seqused_k, *inputs2)

    dq = dq[:, :, :sq, :]
    dk = dk[:, :, :sk, :]
    dv = dv[:, :, :sk, :]
    return dq, dk, dv
