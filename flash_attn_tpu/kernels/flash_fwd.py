"""Pallas TPU flash-attention forward kernel.

TPU-native redesign of the reference FA2 forward path
(`csrc/flash_attn/src/flash_fwd_kernel.h:52` `compute_attn_1rowblock`,
launch grid `flash_fwd_launch_template.h:66`, online softmax
`csrc/flash_attn/src/softmax.h:129`, masking `mask.h:112`, varlen offsets
`block_info.h:13`).  Design differences from the CUDA kernel, chosen for the
TPU execution model:

* Grid is ``(batch, q_heads, num_q_blocks, num_kv_blocks)`` with the KV block
  dimension innermost and sequential ("arbitrary"); the online-softmax state
  (m, l, acc) lives in VMEM scratch that persists across KV iterations —
  the Pallas analogue of the register-resident accumulator of the CUDA
  mainloop.
* Causal / sliding-window / varlen block skipping is done by *clamping the
  K/V index maps*: skipped iterations map to an already-resident block so the
  pipeline issues no DMA, and ``pl.when`` skips the compute.  This replaces
  the CUDA kernel's n_block_min/max loop bounds.
* Per-batch actual lengths (``seqused_q`` / ``seqused_k``) are scalar-
  prefetched into SMEM (PrefetchScalarGridSpec), playing the role of
  `BlockInfo` + `cu_seqlens`, and also handle padding of non-multiple
  sequence lengths.
* GQA consumes K/V directly with an index-map head mapping (h -> h // g) —
  no KV repeat materialisation.
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
from flash_attn_tpu.kernels.block_sizes import cdiv, fwd_block_sizes, round_up

# Perf-debugging ablation (role of the reference's FLASHATTENTION_DISABLE_*
# compile flags): "nosm" drops the whole online softmax (acc += S V),
# "noexp" replaces exp2 with a linear op, "nomax" freezes the running max.
# Results are WRONG under any ablation — benchmarking only.
import os as _os

_ABLATE = _os.environ.get("FLASH_ATTN_TPU_ABLATE", "")

LOG2E = math.log2(math.e)
MASK_VALUE = -1e30
# Additive mask bias for the scheduled grid: far below the MASK_VALUE floor
# of the running max, so exp2(bias - m) is exactly 0 in f32 and the
# probability pass needs no select.  Finite (not -inf) so s + bias never
# produces nan for masked columns.
_SCHED_BIAS = -3e38
LANES = 128

# int32 views of the 32-bit hash constants (lowbias32 mixer)
def _i32(x):
    import numpy as np

    return np.int32(np.uint32(x).view(np.int32))


_H1, _H2 = _i32(0x7FEB352D), _i32(0x846CA68B)
_C1, _C2, _C3, _C4 = _i32(0x9E3779B1), _i32(0x85EBCA77), _i32(0xC2B2AE3D), _i32(0x27D4EB2F)


def _mix32(x):
    sr = jax.lax.shift_right_logical
    x = x ^ sr(x, 16)
    x = x * _H1
    x = x ^ sr(x, 15)
    x = x * _H2
    x = x ^ sr(x, 16)
    return x


def dropout_keep(seed, b, h, rows, cols, dropout_p):
    """Counter-based dropout keep mask from *absolute* positions.

    Pure-jnp stateless hash (the Philox role of
    `csrc/flash_attn/src/dropout.h`): the mask depends only on
    (seed, batch, head, row, col), so forward and both backward kernels
    reproduce it exactly regardless of their tile shapes, and interpret
    mode matches hardware bit-for-bit.
    """
    base = seed ^ (b * _C1) ^ (h * _C2)
    x = _mix32(rows * _C3 + cols * _C4 + base)
    u = (x & jnp.int32(0xFFFFFF)).astype(jnp.float32) * (2.0 ** -24)
    return u >= dropout_p


@dataclasses.dataclass(frozen=True)
class FwdParams:
    scale: float
    causal: bool
    window_left: int
    window_right: int
    softcap: float
    has_alibi: bool
    g: int  # q heads per kv head
    block_q: int
    block_k: int  # major KV tile: DMA + grid granularity
    num_kv_blocks: int
    block_k_sub: int = 0  # compute subtile (<= block_k); 0 = same as block_k
    # Q-row compute subtile for the scheduled grid (<= block_q; 0 = no row
    # split).  With row subtiles, a diagonal tick computes only the
    # (row-subtile x col-subtile) pairs the mask needs — triangular MXU
    # waste drops from ~bq/2 to ~block_q_sub/2 rows per column (the 2-D
    # form of the reference's n_masking_steps split,
    # `flash_fwd_kernel.h:52`).
    block_q_sub: int = 0
    # FP8 (e4m3) inputs with per-(batch, kv-head) descale, the TPU analogue
    # of the Hopper FP8 path (`hopper/flash_api.cpp:694-696` q/k/v_descale).
    # Tiles are dequantised to bf16 on load — fwd HBM traffic halves, the
    # MXU runs bf16 (v5e has no native fp8 matmul).
    fp8: bool = False
    # Learnable per-head attention sink: a virtual logit that joins the
    # softmax denominator only (reference `cute/interface.py:1149`).
    has_sinks: bool = False
    # Attention dropout on the post-softmax probabilities (reference
    # semantics: P dropped and scaled by 1/(1-p); the softmax denominator
    # and LSE stay undropped).
    dropout_p: float = 0.0
    # Chunked attention: queries attend only within their own chunk of
    # `attention_chunk` positions (FA3 `hopper/flash_api.cpp:701`).
    attention_chunk: int = 0
    # Heads processed per grid step.  Short sequences are grid-step-overhead
    # and KV-bandwidth bound; blocking heads amortises both (each K/V tile
    # is DMA'd once and reused by every q head of the block — the TPU
    # counterpart of the reference's persistent-scheduler head batching).
    block_h: int = 1
    hbk: int = 1  # kv heads per block (HB for MHA, 1 for GQA)
    # Dense fast path: no mask can bite except the static key-padding tail,
    # so the (subtile x head) loop is emitted UNPREDICATED (no pl.when) as a
    # 1-deep software pipeline — QK of item n issues ahead of softmax+PV of
    # item n-1, giving Mosaic independent MXU/VPU chains to overlap (the
    # role of the reference's GEMM-softmax pingpong between warpgroups,
    # `flash_fwd_kernel_sm90.h` intra-warpgroup overlap).  Requires
    # trivially-full seqused (set by the dense public API only).
    pipelined: bool = False
    seqlen_q: int = 0  # static true query length (pipelined masking)
    seqlen_k: int = 0  # static true key length (pipelined tail masking)
    # Scheduled grid: drop the per-tick combo dispatch and run ONE
    # unpredicated body that always applies the elementwise mask (interior
    # ticks select nothing out).  A/B knob for the combo-coded dispatch.
    sched_uncond: bool = False
    # Emit the LSE output.  The LSE tile is lane-replicated (.., 128) f32 —
    # at hdim128 it is 2x the HBM bytes of the output itself — so the
    # inference-only forward (custom_vjp primal, no grad) skips the write
    # entirely; the grad path (core_fwd) always emits it for the residuals.
    emit_lse: bool = True

    @property
    def local(self) -> bool:
        return self.window_left >= 0 or self.window_right >= 0

    @property
    def wr(self) -> int:
        # causal == window_right 0 (reference `attention_ref` sets this too)
        if self.causal:
            return 0
        return self.window_right

    @property
    def has_upper(self) -> bool:
        return self.causal or self.window_right >= 0

    @property
    def has_lower(self) -> bool:
        return self.window_left >= 0


def _kv_block_bounds(p: FwdParams, qi, sq_b, sk_b, block_k: int | None = None):
    """Inclusive [min_ki, max_ki] of KV blocks contributing to q block qi.

    Mirrors the n_block_min/max computation of the CUDA fwd kernel but at
    trace time on prefetched scalars.  Bottom-right aligned: offset =
    sk_b - sq_b (reference `mask.h` semantics).  `block_k` overrides the
    granularity (used for compute subtiles).
    """
    bk = block_k or p.block_k
    offset = sk_b - sq_b
    row_min = qi * p.block_q
    row_max = qi * p.block_q + p.block_q - 1
    max_col = sk_b - 1
    if p.has_upper:
        max_col = jnp.minimum(max_col, row_max + offset + max(p.wr, 0))
    if p.has_lower:
        min_col = jnp.maximum(0, row_min + offset - p.window_left)
    else:
        min_col = 0
    min_ki = min_col // bk
    max_ki = max_col // bk  # may be negative when nothing valid
    return min_ki, max_ki


def _fwd_kernel(p: FwdParams, sq_ref, sk_ref, *refs):
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    refs = refs[3:]
    slopes_ref = refs.pop(0) if p.has_alibi else None
    if p.fp8:
        qd_ref, kd_ref, vd_ref = refs[:3]
        refs = refs[3:]
    else:
        qd_ref = kd_ref = vd_ref = None
    sinks_ref = refs.pop(0) if p.has_sinks else None
    seed_ref = refs.pop(0) if p.dropout_p > 0.0 else None
    if p.emit_lse:
        o_ref, lse_ref, acc_ref, m_ref, l_ref = refs
    else:
        o_ref, acc_ref, m_ref, l_ref = refs
        lse_ref = None

    b = pl.program_id(0)
    hb = pl.program_id(1)
    ki = pl.program_id(3)
    qi = pl.program_id(2)
    nk = pl.num_programs(3)
    bq, bk = p.block_q, p.block_k
    HB = p.block_h
    hq0 = hb * HB  # first global q head of this block
    sq_b = sq_ref[b]
    sk_b = sk_ref[b]

    # With neither softcap nor alibi the full scale*log2(e) factor is folded
    # into Q *outside* the kernel (one cheap pass over Q), so the exponent is
    # exp2(s - m) with no per-element multiply at all — one step beyond the
    # exp2 trick of `softmax.h:67` `scale_apply_exp2` (measured +3% on v5e).
    # m/l state is then kept in scale*log2(e) units.
    generic = p.softcap > 0.0 or p.has_alibi
    c = LOG2E if generic else 1.0

    def q_tile(hh):
        if p.fp8:
            # Dequantise Q on load, folding the qk descale (and, on the
            # fast path, scale*log2(e)) into the same scalar multiply.
            hkv = (hq0 + hh) // p.g
            deq = qd_ref[b, hkv] * kd_ref[b, hkv]
            qmul = deq if generic else deq * (p.scale * LOG2E)
            return (q_ref[0, hh].astype(jnp.float32) * qmul
                    ).astype(jnp.bfloat16)
        return q_ref[0, hh]

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    offset = sk_b - sq_b
    bks = p.block_k_sub or bk
    nsub = bk // bks
    r0 = qi * bq
    r1 = r0 + bq - 1

    def _update(j, kgj, masked: bool):
        """One (bq, bks) compute subtile at global subtile idx kgj, for all
        HB heads of the block (mask/iota built once, K/V slice reused)."""
        mask = None
        rows = cols = None
        if masked or p.has_alibi or p.dropout_p > 0.0:
            rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bks), 0)
            cols = kgj * bks + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bks), 1)
        if masked:
            mask = cols >= sk_b
            if p.has_upper:
                mask = jnp.logical_or(mask, cols > rows + offset + p.wr)
            if p.has_lower:
                mask = jnp.logical_or(
                    mask, cols < rows + offset - p.window_left
                )
            if p.attention_chunk > 0:
                cc = p.attention_chunk
                mask = jnp.logical_or(mask,
                                      cols // cc != (rows + offset) // cc)

        def _qk(hh):
            # kv head within the block: one shared head (GQA, HBK==1) or
            # aligned per-q-head (MHA, HBK==HB)
            hkv_local = 0 if p.hbk == 1 else hh
            k = k_ref[0, hkv_local, j * bks:(j + 1) * bks, :]
            if p.fp8:
                k = k.astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q_tile(hh), k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if generic:
                s = s * p.scale
                if p.softcap > 0.0:
                    s = jnp.tanh(s / p.softcap) * p.softcap
            if p.has_alibi:
                slope = slopes_ref[b, hq0 + hh]
                s = s - slope * jnp.abs(rows + offset - cols).astype(
                    jnp.float32)
            if masked:
                s = jnp.where(mask, MASK_VALUE, s)
            return s

        def _smpv(hh, s):
            hkv_local = 0 if p.hbk == 1 else hh
            v = v_ref[0, hkv_local, j * bks:(j + 1) * bks, :]
            if p.fp8:
                v = v.astype(jnp.bfloat16)
            if _ABLATE == "nosm":
                pv = jax.lax.dot_general(
                    s.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_ref[hh] += pv
                return
            m_prev = m_ref[hh, :, :1]  # (bq, 1)
            l_prev = l_ref[hh, :, :1]
            if _ABLATE == "nomax":
                m_curr = m_prev
                alpha = 1.0
                pmat = jnp.exp2(s * c)
            elif _ABLATE == "noexp":
                m_curr = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
                alpha = (m_prev - m_curr) * c + 1.0
                pmat = (s - m_curr) * c
            else:
                m_curr = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp2((m_prev - m_curr) * c)
                pmat = jnp.exp2((s - m_curr) * c)
            if masked:
                # A row whose every column is masked in this tile would get
                # p == 1 from exp2(0); zero it explicitly.
                pmat = jnp.where(mask, 0.0, pmat)

            l_curr = l_prev * alpha + jnp.sum(pmat, axis=1, keepdims=True)
            m_ref[hh] = jnp.broadcast_to(m_curr, m_ref.shape[1:])
            l_ref[hh] = jnp.broadcast_to(l_curr, l_ref.shape[1:])

            if p.dropout_p > 0.0:
                keep_d = dropout_keep(seed_ref[0], b, hq0 + hh, rows, cols,
                                      p.dropout_p)
                pmat = jnp.where(keep_d, pmat, 0.0) * (
                    1.0 / (1.0 - p.dropout_p))
            pv = jax.lax.dot_general(
                pmat.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[hh] = acc_ref[hh] * alpha + pv

        # 1-deep software pipeline over heads: QK of head h issues ahead
        # of softmax+PV of head h-1, so Mosaic overlaps VPU with MXU.
        prev = None
        for hh in range(HB):
            s = _qk(hh)
            if prev is not None:
                _smpv(*prev)
            prev = (hh, s)
        _smpv(*prev)

    if p.pipelined:
        # Fast path: unpredicated software-pipelined (subtile x head) loop.
        # Causal/local masks use the STATIC bottom-right offset (sk - sq,
        # full lengths guaranteed), so masking is a branch-free elementwise
        # select; only whole grid steps are predicated.  See
        # FwdParams.pipelined.
        need_tail = (p.seqlen_k % p.block_k) != 0
        off_s = p.seqlen_k - p.seqlen_q
        masked_rows_possible = (p.has_upper or p.has_lower) and off_s < 0

        def build_mask(j):
            # Head-invariant: built once per subtile, shared by all heads
            mask = None
            cols_t = ki * bk + j * bks + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bks), 1)
            if need_tail:
                mask = cols_t >= p.seqlen_k
            if p.has_upper or p.has_lower:
                rows_t = r0 + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, bks), 0)
                if p.has_upper:
                    m2 = cols_t > rows_t + off_s + p.wr
                    mask = m2 if mask is None else jnp.logical_or(mask, m2)
                if p.has_lower:
                    m3 = cols_t < rows_t + off_s - p.window_left
                    mask = m3 if mask is None else jnp.logical_or(mask, m3)
            return mask

        def qk_stage(j, hh, mask):
            hkv_local = 0 if p.hbk == 1 else hh
            kk = k_ref[0, hkv_local, j * bks:(j + 1) * bks, :]
            s = jax.lax.dot_general(
                q_tile(hh), kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if mask is not None:
                s = jnp.where(mask, MASK_VALUE, s)
            return s, mask

        def smpv_stage(j, hh, s, mask):
            hkv_local = 0 if p.hbk == 1 else hh
            v = v_ref[0, hkv_local, j * bks:(j + 1) * bks, :]
            m_prev = m_ref[hh, :, :1]
            l_prev = l_ref[hh, :, :1]
            m_curr = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp2(m_prev - m_curr)
            pmat = jnp.exp2(s - m_curr)
            if masked_rows_possible and mask is not None:
                # a fully-masked (real) row has s == m_curr == MASK_VALUE
                # and would get pmat == 1; zero it explicitly
                pmat = jnp.where(mask, 0.0, pmat)
            l_curr = l_prev * alpha + jnp.sum(pmat, axis=1, keepdims=True)
            m_ref[hh] = jnp.broadcast_to(m_curr, m_ref.shape[1:])
            l_ref[hh] = jnp.broadcast_to(l_curr, l_ref.shape[1:])
            pv = jax.lax.dot_general(
                pmat.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[hh] = acc_ref[hh] * alpha + pv

        def run_items(with_mask: bool):
            prev = None
            for j in range(nsub):
                mask_j = build_mask(j) if with_mask else None
                for hh in range(HB):
                    s, mask = qk_stage(j, hh, mask_j)
                    if prev is not None:
                        smpv_stage(*prev)
                    prev = (j, hh, s, mask)
            smpv_stage(*prev)

        if p.has_upper or p.has_lower or need_tail:
            # 3-way step predication: skipped / interior (mask-free dense
            # body) / boundary (elementwise-masked body).  Interior steps
            # run at the dense pipelined rate, so only diagonal/tail steps
            # pay the mask cost.
            if p.has_upper or p.has_lower:
                min_ki, max_ki = _kv_block_bounds(p, qi, sq_b, sk_b)
                needed = jnp.logical_and(ki >= min_ki, ki <= max_ki)
            else:
                needed = (ki * bk) < sk_b
            c0 = ki * bk
            c1 = c0 + bk - 1
            interior = c1 < p.seqlen_k
            if p.has_upper:
                interior = jnp.logical_and(
                    interior, c1 <= r0 + off_s + p.wr)
            if p.has_lower:
                interior = jnp.logical_and(
                    interior, c0 >= r1 + off_s - p.window_left)

            @pl.when(jnp.logical_and(needed, interior))
            def _interior_step():
                run_items(with_mask=False)

            @pl.when(jnp.logical_and(needed, jnp.logical_not(interior)))
            def _boundary_step():
                run_items(with_mask=True)
        else:
            run_items(with_mask=False)

        @pl.when(ki == nk - 1)
        def _finalize_pipelined():
            _fwd_finalize(p, sinks_ref, vd_ref, o_ref, lse_ref, acc_ref,
                          m_ref, l_ref, b, hq0)
        return

    # Compute-subtile loop (statically unrolled so Mosaic can software-
    # pipeline the MXU): the major tile is DMA'd whole; masked-out subtiles
    # are skipped by predication, and interior subtiles (no mask can bite)
    # take a select/iota-free fast path.  This keeps DMA large while
    # causal/local masking wastes at most bks/2 columns per row.
    min_kj, max_kj = _kv_block_bounds(p, qi, sq_b, sk_b, block_k=bks)
    for j in range(nsub):
        kgj = ki * nsub + j
        needed = jnp.logical_and(kgj >= min_kj, kgj <= max_kj)
        c0 = kgj * bks
        c1 = c0 + bks - 1
        interior = c1 < sk_b
        if p.attention_chunk > 0:
            interior = jnp.bool_(False) & interior
        if p.has_upper:
            interior = jnp.logical_and(interior, c1 <= r0 + offset + p.wr)
        if p.has_lower:
            interior = jnp.logical_and(
                interior, c0 >= r1 + offset - p.window_left
            )

        @pl.when(jnp.logical_and(needed, interior))
        def _fast(j=j, kgj=kgj):
            _update(j, kgj, masked=False)

        @pl.when(jnp.logical_and(needed, jnp.logical_not(interior)))
        def _slow(j=j, kgj=kgj):
            _update(j, kgj, masked=True)

    @pl.when(ki == nk - 1)
    def _finalize():
        _fwd_finalize(p, sinks_ref, vd_ref, o_ref, lse_ref, acc_ref,
                      m_ref, l_ref, b, hq0)


# Scheduled-grid flags (host-built tile schedule; see _build_schedule)
_SCHED_FIRST = 1
_SCHED_LAST = 2
_SCHED_BOUNDARY = 4
_SCHED_EMPTY = 8
_SCHED_INIT = 16  # zero m/l/acc scratch before the body (fallback only:
# a row's first tick normally uses a *fresh* combo that writes instead of
# read-modify-writes, so the ~6MB of zeroing VPU stores never happen)
_SCHED_TYPE_SHIFT = 5  # upper bits: subtile-combo index


def _combo_items(grid, nomerge=False):
    """Work items of one static 2-D combo grid: one item per maximal row
    group with identical code rows — (rg0, n_rows, runs) where runs are
    the group's maximal same-code col runs (col_subtile, n_subtiles,
    masked).  All runs of an item share one online-softmax update
    (`_fwd_sched_kernel.smpv_stage`)."""
    nrsub, nsub = len(grid), len(grid[0])
    items = []
    r = 0
    while r < nrsub:
        row = grid[r]
        r2 = r
        while r2 + 1 < nrsub and grid[r2 + 1] == row:
            r2 += 1
        runs = []
        j = 0
        while j < nsub:
            code = row[j]
            if code == 0:
                j += 1
                continue
            j2 = j
            while j2 + 1 < nsub and row[j2 + 1] == code:
                j2 += 1
            runs.append((j, j2 - j + 1, code == 2))
            j = j2 + 1
        if runs:
            if nomerge:
                for ja, nj, masked in runs:
                    items.append((r, r2 - r + 1, ((ja, nj, masked),)))
            else:
                items.append((r, r2 - r + 1, tuple(runs)))
        r = r2 + 1
    return items


def _static_bias_patterns(p: FwdParams, combos):
    """Enumerate the distinct compile-time mask-bias patterns of a
    schedule's combos (combos whose ticks all share one (col - row)
    offset and stay inside the key range — see _build_schedule).  Returns
    (patterns, index) where patterns is a list of float32 numpy arrays and
    index maps (combo_idx, rg0, ja) -> position in patterns."""
    import numpy as np

    brs = p.block_q_sub or p.block_q
    bks = p.block_k_sub or p.block_k
    off_s = p.seqlen_k - p.seqlen_q
    nomerge = os.environ.get("FLASH_ATTN_TPU_SCHED_NOMERGE") == "1"
    patterns, keys, index = [], {}, {}
    for ci, (grid, _fresh, (delta, in_bounds)) in enumerate(combos):
        if delta is None or not in_bounds:
            continue
        for rg0, nr, runs in _combo_items(grid, nomerge):
            for ja, nj, masked in runs:
                if not masked:
                    continue
                R, W = nr * brs, nj * bks
                # dynamic form masks cols_t > rows_t + off_s + wr; in
                # relative coords: (rel + jc) > jr + wr with
                # rel = (col origin) - (row origin) - off_s
                rel = delta + ja * bks - rg0 * brs - off_s
                key = (R, W, rel)
                if key not in keys:
                    rows_i = np.arange(R)[:, None]
                    cols_i = rel + np.arange(W)[None, :]
                    mask = np.zeros((R, W), bool)
                    if p.has_upper:
                        mask |= cols_i > rows_i + p.wr
                    if p.has_lower:
                        mask |= cols_i < rows_i - p.window_left
                    keys[key] = len(patterns)
                    patterns.append(
                        np.where(mask, _SCHED_BIAS, 0.0).astype(np.float32))
                index[(ci, rg0, ja)] = keys[key]
    return patterns, index


def _build_schedule(p: FwdParams, nq: int, nk: int):
    """Flatten the (q block, kv block) iteration space into exactly the
    pairs a causal/local mask needs — the TPU analogue of the reference's
    tile schedulers (`hopper/tile_scheduler.hpp` LPT/varlen scheduling,
    `csrc/flash_attn/src/flash_fwd_kernel.h` n_block_min/max): instead of
    a rectangular grid with predicated skips (a wasted pipeline tick per
    skipped block — up to ~45% of ticks for causal), the host enumerates
    needed pairs and the kernel walks them via scalar-prefetched tables.

    Round 3: each tick also carries a **subtile combo** — per compute
    subtile (bks columns of the bk-wide DMA tile) whether it is skipped,
    interior (mask-free body), or masked.  The host collects the distinct
    combos; the kernel emits ONE unpredicated body per combo (the
    masked/unmasked inner-loop split of the reference,
    `flash_fwd_kernel.h:52` n_masking_steps), so a diagonal tick computes
    exactly the needed subtiles at full DMA width — diagonal waste drops
    from ~bk/2 to ~bks/2 columns per row without shrinking the transfers.

    Returns (qi_tab, ki_tab, flags, combos): flags bits FIRST/LAST/EMPTY
    plus the combo index << _SCHED_TYPE_SHIFT; combos is a static tuple of
    2-D (row-subtile x col-subtile) code grids — tuples of per-row tuples
    of codes (0 = skip, 1 = interior, 2 = masked).  Without block_q_sub
    each grid has one row (whole-block behaviour).
    """
    import numpy as np

    sq, sk = p.seqlen_q, p.seqlen_k
    off = sk - sq
    bq, bk = p.block_q, p.block_k
    bks = p.block_k_sub or bk
    brs = p.block_q_sub or bq
    nsub = bk // bks
    nrsub = bq // brs
    qi_tab, ki_tab, flags = [], [], []
    combos: dict = {}
    combo_meta: dict = {}

    def combo_index(codes, qi=None, ki=None):
        if codes not in combos:
            combos[codes] = len(combos)
            # static mask geometry: if every tick using this combo sits at
            # the same (col - row) offset and never crosses the key end,
            # its bias is a compile-time constant (no runtime iota/where)
            combo_meta[codes] = [ki * bk - qi * bq, True] \
                if qi is not None else [None, False]
        else:
            meta = combo_meta[codes]
            if qi is None or meta[0] != ki * bk - qi * bq:
                meta[0] = None
        if qi is not None and (ki + 1) * bk > sk:
            combo_meta[codes][1] = False
        return combos[codes]

    # combo 0 is always the all-interior body (EMPTY padding entries point
    # at it; they execute nothing).  Combos are keyed (grid, fresh): the
    # fresh variant WRITES m/l/acc (a row's first tick) instead of
    # read-modify-writing, so no scratch zeroing pass is needed.
    combo_index((tuple(tuple([1] * nsub) for _ in range(nrsub)), False))

    def row_codes(r0q, r1q, ki):
        codes = []
        max_col = sk - 1
        if p.has_upper:
            max_col = min(max_col, r1q + off + max(p.wr, 0))
        min_col = 0
        if p.has_lower:
            min_col = max(0, r0q + off - p.window_left)
        for j in range(nsub):
            c0 = ki * bk + j * bks
            c1 = c0 + bks - 1
            needed = (c0 <= max_col and c1 >= min_col and r0q < sq
                      and max_col >= min_col)
            if not needed:
                codes.append(0)
                continue
            interior = c1 < sk and r1q < sq
            if p.has_upper:
                interior = interior and c1 <= r0q + off + p.wr
            if p.has_lower:
                interior = interior and c0 >= r1q + off - p.window_left
            if not interior and os.environ.get(
                    "FLASH_ATTN_TPU_SCHED_SKIPMASKED") == "1":
                codes.append(0)  # perf diagnostic ONLY: wrong results
                continue
            codes.append(1 if interior else 2)
        return tuple(codes)

    for qi in range(nq):
        r0q = qi * bq
        r1q = r0q + bq - 1
        max_col = sk - 1
        if p.has_upper:
            max_col = min(max_col, r1q + off + max(p.wr, 0))
        min_col = 0
        if p.has_lower:
            min_col = max(0, r0q + off - p.window_left)
        ki_lo, ki_hi = min_col // bk, max_col // bk
        if r0q >= sq or max_col < min_col or ki_hi < 0:
            qi_tab.append(qi)
            ki_tab.append(0)
            flags.append(
                _SCHED_FIRST | _SCHED_LAST | _SCHED_EMPTY | _SCHED_INIT)
            continue
        ki_lo = max(ki_lo, 0)
        diag_full = os.environ.get("FLASH_ATTN_TPU_SCHED_DIAG_FULL") == "1"
        entries = []
        for ki in range(ki_lo, ki_hi + 1):
            grid = tuple(
                row_codes(r0q + r * brs, r0q + (r + 1) * brs - 1, ki)
                for r in range(nrsub))
            if diag_full and any(2 in row for row in grid):
                # A/B knob: run boundary tiles as ONE full-width masked
                # matmul (static resident bias) instead of the staircase
                # of row-group items — trades ~bk/2 wasted MXU columns for
                # zero small-matmul/per-item softmax overhead.
                grid = tuple(tuple([2] * nsub) for _ in range(nrsub))
            entries.append((ki, grid))
        if os.environ.get("FLASH_ATTN_TPU_SCHED_DIAG_LAST") != "1":
            # boundary (masked) tiles first: the row's LAST tick — which
            # carries the finalize (o/lse write for every head) — lands on
            # a big mask-free interior tile whose straight-line MXU body
            # hides the finalize VPU work, instead of serialising behind
            # the diagonal staircase.  Online softmax is order-invariant.
            entries.sort(key=lambda e: 0 if any(
                2 in row for row in e[1]) else 1)
        for n, (ki, grid) in enumerate(entries):
            fl = 0
            if n == 0:
                fl |= _SCHED_FIRST
                # fresh combo only if this tick touches every row group
                # (it writes all scratch rows); otherwise zero-init
                if all(any(row) for row in grid) and not p.sched_uncond:
                    fl |= combo_index((grid, True), qi, ki) \
                        << _SCHED_TYPE_SHIFT
                else:
                    fl |= _SCHED_INIT
                    fl |= combo_index((grid, False), qi, ki) \
                        << _SCHED_TYPE_SHIFT
            else:
                fl |= combo_index((grid, False), qi, ki) \
                    << _SCHED_TYPE_SHIFT
            if n == len(entries) - 1:
                fl |= _SCHED_LAST
            qi_tab.append(qi)
            ki_tab.append(ki)
            flags.append(fl)
    combo_list = tuple(
        (grid, fresh, tuple(combo_meta[(grid, fresh)]))
        for grid, fresh in sorted(combos, key=combos.get))
    return (np.asarray(qi_tab, np.int32), np.asarray(ki_tab, np.int32),
            np.asarray(flags, np.int32), combo_list)


def _build_split_schedules(p_int: FwdParams, p_dia: FwdParams, nq: int):
    """Partition the causal/local tile space into an *interior* schedule
    (tiles fully unmasked at the interior call's big block_k — run with the
    mask-free body at dense-tuned tiles) and a *diagonal* schedule (every
    remaining needed tile at a small block_k, masked where the boundary
    bites).  The TPU split-call form of the reference's masked/unmasked
    mainloop specialisation (`flash_fwd_kernel.h:52` n_masking_steps,
    `hopper/tile_size.h:10`): instead of one kernel switching loop flavours
    mid-flight, two pallas_calls each run ONE straight-line flavour and the
    partials merge by the split-KV combine identity.

    Both calls must share block_q (the covered-column range is constant per
    q block) and bk_int % bk_dia == 0 (alignment — no tile straddles the
    partition).  Returns (sched_int, sched_dia), each in _build_schedule's
    (qi_tab, ki_tab, flags, combos) form.
    """
    import numpy as np

    assert p_int.block_q == p_dia.block_q
    assert p_int.block_k % p_dia.block_k == 0
    sq, sk = p_int.seqlen_q, p_int.seqlen_k
    off = sk - sq
    bq = p_int.block_q
    bki, bkd = p_int.block_k, p_dia.block_k
    bksd = p_dia.block_k_sub or bkd
    nsub_d = bkd // bksd
    nsub_i = bki // (p_int.block_k_sub or bki)
    nrs_i = bq // (p_int.block_q_sub or bq)
    nrs_d = bq // (p_dia.block_q_sub or bq)

    def new_sched(nrs):
        return {"qi": [], "ki": [], "fl": [], "combos": {}, "nrs": nrs}

    def combo_index(s, codes, fresh=False):
        # 2-D grid form (_build_schedule): block-level codes replicated
        # per row-subtile (conservative — no row skipping in split mode)
        grid = (tuple(codes for _ in range(s["nrs"])), fresh)
        if grid not in s["combos"]:
            s["combos"][grid] = len(s["combos"])
        return s["combos"][grid]

    si, sd = new_sched(nrs_i), new_sched(nrs_d)
    combo_index(si, tuple([1] * nsub_i))  # interior: all-interior body
    combo_index(sd, tuple([1] * nsub_d))

    def emit(s, qi, entries):
        # entries: list of (ki, codes); [] -> EMPTY placeholder
        if not entries:
            s["qi"].append(qi)
            s["ki"].append(0)
            s["fl"].append(
                _SCHED_FIRST | _SCHED_LAST | _SCHED_EMPTY | _SCHED_INIT)
            return
        for n, (ki, codes) in enumerate(entries):
            if n == 0:
                # first tick always covers all (replicated) row groups:
                # use the fresh (write-not-RMW) combo, skip scratch init
                fl = combo_index(s, codes, fresh=True) << _SCHED_TYPE_SHIFT
                fl |= _SCHED_FIRST
            else:
                fl = combo_index(s, codes) << _SCHED_TYPE_SHIFT
            if n == len(entries) - 1:
                fl |= _SCHED_LAST
            s["qi"].append(qi)
            s["ki"].append(ki)
            s["fl"].append(fl)

    p = p_int  # mask geometry (shared)
    for qi in range(nq):
        r0q = qi * bq
        r1q = r0q + bq - 1
        max_col = sk - 1
        if p.has_upper:
            max_col = min(max_col, r1q + off + max(p.wr, 0))
        min_col = 0
        if p.has_lower:
            min_col = max(0, r0q + off - p.window_left)
        if r0q >= sq or max_col < min_col:
            emit(si, qi, [])
            emit(sd, qi, [])
            continue

        # interior tiles at bki: fully valid for EVERY row of the q block
        lo_full = r1q + off - p.window_left if p.has_lower else 0
        hi_full = r0q + off + p.wr if p.has_upper else sk - 1
        hi_full = min(hi_full, sk - 1)
        kiA = max(0, -(-max(lo_full, 0) // bki))  # ceil
        kiB = (hi_full + 1) // bki - 1
        int_entries = [(ki, tuple([1] * nsub_i)) for ki in range(kiA, kiB + 1)]
        emit(si, qi, int_entries)
        covA = kiA * bki if int_entries else 0
        covB = (kiB + 1) * bki if int_entries else 0

        # diagonal tiles at bkd: every needed tile outside [covA, covB)
        dia_entries = []
        for kd in range(min_col // bkd, max_col // bkd + 1):
            c0t, c1t = kd * bkd, (kd + 1) * bkd - 1
            if int_entries and c0t >= covA and c1t < covB:
                continue
            codes = []
            for j in range(nsub_d):
                c0 = c0t + j * bksd
                c1 = c0 + bksd - 1
                if not (c0 <= max_col and c1 >= min_col):
                    codes.append(0)
                    continue
                interior = c1 < sk and r1q < sq
                if p.has_upper:
                    interior = interior and c1 <= r0q + off + p.wr
                if p.has_lower:
                    interior = interior and c0 >= r1q + off - p.window_left
                codes.append(1 if interior else 2)
            if any(codes):
                dia_entries.append((kd, tuple(codes)))
        emit(sd, qi, dia_entries)

    def fin(s):
        return (np.asarray(s["qi"], np.int32), np.asarray(s["ki"], np.int32),
                np.asarray(s["fl"], np.int32),
                tuple((grid, fresh, (None, False))
                      for grid, fresh in sorted(s["combos"],
                                                key=s["combos"].get)))

    return fin(si), fin(sd)


def _fwd_sched_kernel(p: FwdParams, combos, bias_index,
                      qi_ref, ki_ref, fl_ref, *refs):
    """Scheduled-grid forward: grid (b, h/block_h, T) walking the
    host-built tile tables.  Static-length fast path only (full_lengths):
    masks are branch-free elementwise selects against static offsets; the
    (subtile x head) loop software-pipelines as in the dense path.

    `combos`: static 2-D (row-subtile x col-subtile) code grids (see
    _build_schedule) — each becomes its own unpredicated body selected by
    the tick's type field.  Operands arrive subtile-blocked 5-D
    ((1, HB, nrsub, brs, d) / (1, hbk, nsub, bks, d)): subtile reads are
    leading-dim slices (cheap) and whole-tile reads are free contiguous
    reshapes — the v5e sublane-subslice penalty (~1.6x) never applies.
    Within a combo, maximal row groups with identical code rows merge
    into one matmul M, and per row group maximal same-code col runs merge
    into one matmul N, so the all-interior combo is a single
    (bq x bk x d) matmul per head while a diagonal tick computes only the
    triangular band (n_masking_steps role, `flash_fwd_kernel.h:52`)."""
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    refs = refs[3:]
    sinks_ref = refs.pop(0) if p.has_sinks else None
    n_bias = 1 + max(bias_index.values()) if bias_index else 0
    bias_refs = [refs.pop(0) for _ in range(n_bias)]
    if p.emit_lse:
        o_ref, lse_ref, acc_ref, m_ref, l_ref = refs
    else:
        o_ref, acc_ref, m_ref, l_ref = refs
        lse_ref = None

    b = pl.program_id(0)
    hb = pl.program_id(1)
    t = pl.program_id(2)
    bq, bk = p.block_q, p.block_k
    bks = p.block_k_sub or bk
    brs = p.block_q_sub or bq
    nsub = bk // bks
    nrsub = bq // brs
    HB = p.block_h
    hq0 = hb * HB
    qi = qi_ref[t]
    ki = ki_ref[t]
    fl = fl_ref[t]
    last = (fl & _SCHED_LAST) != 0
    empty = (fl & _SCHED_EMPTY) != 0
    init = (fl & _SCHED_INIT) != 0
    ctype = jax.lax.shift_right_logical(fl, _SCHED_TYPE_SHIFT)

    off_s = p.seqlen_k - p.seqlen_q
    r0 = qi * bq
    dv = v_ref.shape[-1]

    @pl.when(init)
    def _init():
        # Fallback only (rows whose first tick doesn't cover every row
        # group, EMPTY padding, uncond mode): fresh combos write the
        # scratch instead.  m floor is MASK_VALUE (not -inf): masked
        # scores carry the far lower _SCHED_BIAS, so exp2(bias - m)
        # underflows to exactly 0 and the probability pass needs NO
        # select (see smpv_stage).
        m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def build_bias(rg0, nr, ja, nj, ci=None):
        # Head-invariant additive mask bias, built once per (row group x
        # col run) and shared by every head of the block: one VPU add per
        # head replaces the two selects (score + probability) of the
        # select-mask form.
        R, W = nr * brs, nj * bks
        if (ci, rg0, ja) in bias_index:
            # every tick using this combo sits at the same static
            # (col - row) offset inside the key range: the bias is a
            # host-precomputed constant input resident in VMEM — zero
            # runtime iota/compare/where (see _static_bias_patterns)
            return bias_refs[bias_index[(ci, rg0, ja)]][...]
        cols_t = ki * bk + ja * bks + jax.lax.broadcasted_iota(
            jnp.int32, (R, W), 1)
        mask = cols_t >= p.seqlen_k
        rows_t = r0 + rg0 * brs + jax.lax.broadcasted_iota(
            jnp.int32, (R, W), 0)
        if p.has_upper:
            mask = jnp.logical_or(mask, cols_t > rows_t + off_s + p.wr)
        if p.has_lower:
            mask = jnp.logical_or(
                mask, cols_t < rows_t + off_s - p.window_left)
        return jnp.where(mask, _SCHED_BIAS, 0.0).astype(jnp.float32)

    def qk_stage(it, hh, biases):
        # One QK^T matmul per col run of the row group; the masked run's
        # additive bias (head-invariant, hoisted) folds into the same VPU
        # pass that writes s.
        rg0, nr, runs = it
        hkv_local = 0 if p.hbk == 1 else hh
        qq = q_ref[0, hh, rg0:rg0 + nr].reshape(nr * brs, q_ref.shape[-1])
        ss = []
        for (ja, nj, _), bias in zip(runs, biases):
            kk = k_ref[0, hkv_local, ja:ja + nj].reshape(
                nj * bks, k_ref.shape[-1])
            s = jax.lax.dot_general(
                qq, kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if bias is not None:
                s = s + bias
            ss.append(s)
        return ss

    def smpv_stage(it, hh, ss, fresh=False):
        # ONE fused online-softmax step over ALL col runs of the row
        # group: a single joint max, one rescale, and one m/l/acc
        # read-modify-write — a diagonal tick's interior+masked runs no
        # longer double the (LANES-broadcast) scratch traffic.  `fresh`
        # (a row's first tick): WRITE m/l/acc outright — no prior-state
        # reads, no rescale, and no separate scratch-zeroing pass.
        rg0, nr, runs = it
        hkv_local = 0 if p.hbk == 1 else hh
        R = nr * brs
        if fresh:
            m_curr = jnp.full((R, 1), MASK_VALUE, jnp.float32)
        else:
            m_prev = m_ref[hh, rg0:rg0 + nr, :, :1].reshape(R, 1)
            m_curr = m_prev
        for s in ss:
            m_curr = jnp.maximum(m_curr, jnp.max(s, axis=1, keepdims=True))
        if fresh:
            l_curr = jnp.zeros((R, 1), jnp.float32)
        else:
            l_prev = l_ref[hh, rg0:rg0 + nr, :, :1].reshape(R, 1)
            alpha = jnp.exp2(m_prev - m_curr)
            l_curr = l_prev * alpha
        pv_tot = None
        for (ja, nj, _), s in zip(runs, ss):
            # masked entries hold s ~ _SCHED_BIAS << m_curr (m is floored
            # at MASK_VALUE), so exp2 underflows to 0 — no select needed
            pmat = jnp.exp2(s - m_curr)
            l_curr = l_curr + jnp.sum(pmat, axis=1, keepdims=True)
            v = v_ref[0, hkv_local, ja:ja + nj].reshape(nj * bks, dv)
            pv = jax.lax.dot_general(
                pmat.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pv_tot = pv if pv_tot is None else pv_tot + pv
        m_ref[hh, rg0:rg0 + nr] = jnp.broadcast_to(
            m_curr, (R, LANES)).reshape(nr, brs, LANES)
        l_ref[hh, rg0:rg0 + nr] = jnp.broadcast_to(
            l_curr, (R, LANES)).reshape(nr, brs, LANES)
        if fresh:
            acc_ref[hh, rg0:rg0 + nr] = pv_tot.reshape(nr, brs, dv)
        else:
            acc = acc_ref[hh, rg0:rg0 + nr].reshape(R, dv)
            acc_ref[hh, rg0:rg0 + nr] = (acc * alpha + pv_tot).reshape(
                nr, brs, dv)

    nomerge = os.environ.get("FLASH_ATTN_TPU_SCHED_NOMERGE") == "1"

    def combo_items(grid):
        return _combo_items(grid, nomerge)

    def run_combo(grid, fresh=False, ci=None):
        # Unpredicated software-pipelined body for ONE static 2-D combo —
        # the Pallas form of the reference's masked/unmasked mainloop
        # split (`flash_fwd_kernel.h:52`, `hopper/tile_size.h`).
        items = combo_items(grid)
        if not items:
            return
        prev = None
        for rg0, nr, runs in items:
            it = (rg0, nr, runs)
            biases = [build_bias(rg0, nr, ja, nj, ci) if masked else None
                      for (ja, nj, masked) in runs]
            for hh in range(HB):
                ss = qk_stage(it, hh, biases)
                if prev is not None:
                    smpv_stage(*prev, fresh=fresh)
                prev = (it, hh, ss)
        smpv_stage(*prev, fresh=fresh)

    if p.sched_uncond:
        # Single unpredicated body: every tick pays the elementwise mask
        # (built from r0/ki, so interior ticks select nothing out).  Trades
        # diagonal-only mask VPU work for zero pl.when combo dispatch —
        # Mosaic schedules one straight-line body.
        @pl.when(jnp.logical_not(empty))
        def _uncond_body():
            run_combo(tuple(tuple([2] * nsub) for _ in range(nrsub)))
    else:
        for idx, (grid, fresh, _meta) in enumerate(combos):
            @pl.when(jnp.logical_and(jnp.logical_not(empty), ctype == idx))
            def _combo_body(grid=grid, fresh=fresh, idx=idx):
                run_combo(grid, fresh, idx)

    @pl.when(last)
    def _finalize():
        _fwd_finalize(p, sinks_ref, None, o_ref, lse_ref, acc_ref,
                      m_ref, l_ref, b, hq0, sched5d=True)


def _fwd_finalize(p: FwdParams, sinks_ref, vd_ref, o_ref, lse_ref, acc_ref,
                  m_ref, l_ref, b, hq0, sched5d: bool = False):
    for hh in range(p.block_h):
        _fwd_finalize_head(p, sinks_ref, vd_ref, o_ref, lse_ref, acc_ref,
                           m_ref, l_ref, b, hq0, hh, sched5d=sched5d)


def _fwd_finalize_head(p: FwdParams, sinks_ref, vd_ref, o_ref, lse_ref,
                       acc_ref, m_ref, l_ref, b, hq0, hh,
                       sched5d: bool = False):
    generic = p.softcap > 0.0 or p.has_alibi
    bq = p.block_q
    if sched5d:
        # subtile-blocked scratch/outputs (see _fwd_sched_kernel):
        # whole-tile views are free contiguous reshapes
        l_final = l_ref[hh].reshape(bq, LANES)[:, :1]
        m_final = m_ref[hh].reshape(bq, LANES)[:, :1]
        acc = acc_ref[hh].reshape(bq, acc_ref.shape[-1])
    else:
        l_final = l_ref[hh, :, :1]
        m_final = m_ref[hh, :, :1]
        acc = acc_ref[hh]
    if p.has_sinks:
        # One more online-softmax step against a virtual single-
        # logit "block" that contributes no value (denominator only).
        sink = sinks_ref[hq0 + hh]  # natural scaled-logit units
        sink_k = sink * LOG2E if not generic else sink
        cc = 1.0 if not generic else LOG2E
        m_eff = jnp.maximum(m_final, sink_k)
        alpha = jnp.exp2((m_final - m_eff) * cc)
        sink_p = jnp.exp2((sink_k - m_eff) * cc)
        acc = acc * alpha
        l_final = l_final * alpha + sink_p
        m_final = m_eff
    empty = l_final == 0.0
    l_safe = jnp.where(empty, 1.0, l_final)
    if p.fp8:
        acc = acc * vd_ref[b, (hq0 + hh) // p.g]
    out = (acc / l_safe).astype(o_ref.dtype)
    if sched5d:
        o_ref[0, hh] = out.reshape(o_ref.shape[2:])
    else:
        o_ref[0, hh] = out
    if lse_ref is not None:
        # m is in scale*log2(e) units on the fast path (Q pre-scaled);
        # rescale for the natural-log LSE.  Reference writes +inf LSE
        # for fully-masked rows (`softmax.h:170` normalize_softmax_lse).
        m_nat = m_final if generic else m_final / LOG2E
        lse = jnp.where(empty, jnp.inf, m_nat + jnp.log(l_safe))
        if sched5d and lse_ref.ndim == 4:
            # packed rows->(sublane, lane) tile: a 4KB write per head
            # instead of a 512KB LANES-broadcast (and 128x less HBM).
            # Only when bq/LANES is sublane-aligned (see _run_sched).
            lse_ref[0, hh] = lse.reshape(lse_ref.shape[2:])
        elif sched5d:
            lse_ref[0, hh] = jnp.broadcast_to(
                lse, (bq, LANES)).reshape(lse_ref.shape[2:])
        else:
            lse_ref[0, hh] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def flash_attn_fwd_bhsd(
    q,
    k,
    v,
    seqused_q,
    seqused_k,
    *,
    softmax_scale: float,
    causal: bool = False,
    window_size=(-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    q_descale=None,
    k_descale=None,
    v_descale=None,
    sinks=None,
    dropout_p: float = 0.0,
    dropout_seed=None,
    attention_chunk: int = 0,
    block_q: int | None = None,
    block_k: int | None = None,
    block_k_sub: int | None = None,
    block_q_sub: int | None = None,
    block_h: int | None = None,
    full_lengths: bool = False,
    split_diag: tuple | None = None,
    emit_lse: bool = True,
):
    """Forward flash attention on (b, h, s, d)-layout operands.

    q: (b, h, sq, d); k: (b, hk, sk, d); v: (b, hk, sk, dv) — `dv` may
    differ from `d` (MLA shapes, e.g. DeepSeek d=576/dv=512; reference FA3
    hdim_v support, `hopper/flash_api.cpp:673` mha_fwd).  seqused_{q,k}:
    (b,) int32 actual lengths (handles varlen and non-block-multiple
    padding uniformly).  Returns o: (b, h, sq, dv) in q.dtype and lse:
    (b, h, sq) float32 (natural-log, reference layout `flash_api.cpp:351`).

    FP8: when q/k/v are float8_e4m3fn, `{q,k,v}_descale` are (b, nheads_k)
    float32 dequantisation factors (Hopper FP8 semantics,
    `hopper/flash_api.cpp:694-696`); the output is bfloat16.

    `sinks`: (nheads,) float32 learnable attention-sink logits joining the
    softmax denominator only (reference `cute/interface.py:1149`).
    """
    b, h, sq, d = q.shape
    _, hk, sk, _ = k.shape
    dv = v.shape[-1]
    assert h % hk == 0, (h, hk)
    g = h // hk
    fp8 = jnp.issubdtype(q.dtype, jnp.floating) and q.dtype.itemsize == 1
    out_dtype = jnp.bfloat16 if fp8 else q.dtype

    # one-sided window: the unbounded side becomes seqlen_k (reference
    # `flash_api.cpp:141-142`) — NOT fully unbounded: with sq > sk the
    # normalised right bound (row + sk - sq + sk) still bites
    if window_size[0] >= 0 and window_size[1] < 0:
        window_size = (window_size[0], sk)
    elif window_size[1] >= 0 and window_size[0] < 0 and not causal:
        window_size = (sk, window_size[1])
    boundary_heavy = causal or window_size[0] >= 0 or window_size[1] >= 0
    # Dense fast path (see FwdParams.pipelined): masks reduce to the static
    # key-padding tail, so predication disappears and the head loop
    # software-pipelines MXU against VPU.
    pipelined = (
        full_lengths and attention_chunk == 0
        and softcap == 0.0 and alibi_slopes is None and not fp8
        and dropout_p == 0.0
    )
    bs = fwd_block_sizes(sq, sk, d, boundary_heavy=boundary_heavy)
    bq = block_q or bs.block_q
    bk = block_k or bs.block_k
    bks = block_k_sub or bs.block_k_sub or bk
    if bk % bks != 0:
        bks = bk
    if pipelined and block_q is None and block_k is None:
        if boundary_heavy:
            # Causal/local run the scheduled grid.  v5e seq8k sweep
            # (round 3): 147-152 TF/s with-LSE at 1024/1024 tiles with
            # 256x256 (row x col) compute subtiles — diagonal ticks
            # compute only the triangular band of fused row-group items
            # (see _fwd_sched_kernel) while interior ticks stay one
            # whole-tile matmul at the dense rate (164.7).
            bq, cap = 1024, 1024
        else:
            # v5e hdim128/seq8k sweep (round 3, LSE-write elided): 175.0
            # TF/s at 256/2048/bh16 no-LSE, 168.0 with LSE (old
            # 256/4096/bh8: 166.9/163.9).
            bq, cap = 256, 2048
        bk = min(cap, max(128, round_up(sk, 128)))
        bks = bk
        if boundary_heavy and bk >= 512:
            # bk is always a multiple of 128 but not necessarily of 256
            # (e.g. sk 800 -> bk 896): fall back to 128-wide subtiles
            bks = 256 if bk % 256 == 0 else 128
    # Q-row compute subtile (scheduled grid only; see FwdParams)
    brs = block_q_sub or 0
    if not brs and pipelined and boundary_heavy and block_q_sub is None \
            and bq >= 512:
        brs = 256
    if brs and (bq % brs != 0 or brs % 8 != 0):
        brs = 0
    sq_p = round_up(max(sq, bq), bq)
    sk_p = round_up(max(sk, bk), bk)

    # head blocking: the shorter the sequences, the more heads per step
    work = sq_p * sk_p
    if block_h is not None:
        bh = block_h
    elif pipelined:
        # keep several independent MXU/VPU chains in flight (d > 128 halves
        # the head block to keep double-buffered K/V tiles inside VMEM).
        # Scheduled grid at d256: bh4 spills VMEM and collapses to 69 TF/s;
        # bh2 runs 164.6 (v5e seq8k sweep).  d192 still prefers bh4 (126.9
        # vs 108.9), so the cliff sits between 192 and 256.
        if boundary_heavy:
            bh = 4 if d <= 192 else 2
        else:
            bh = 16 if d <= 128 else 8
    elif work >= 2048 * 4096:
        bh = 1
    elif work >= 1024 * 2048:
        bh = 2
    elif work >= 512 * 1024:
        bh = 4
    else:
        bh = 8
    limit = h if g == 1 else g  # a block must live within one kv group
    bh = min(bh, limit)
    while limit % bh:
        bh -= 1
    hbk = bh if g == 1 else 1
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    nq = sq_p // bq
    nk = sk_p // bk

    p = FwdParams(
        scale=float(softmax_scale),
        causal=bool(causal),
        window_left=int(window_size[0]),
        window_right=int(window_size[1]),
        softcap=float(softcap),
        has_alibi=alibi_slopes is not None,
        g=g,
        block_q=bq,
        block_k=bk,
        num_kv_blocks=nk,
        block_k_sub=bks,
        block_q_sub=brs,
        fp8=bool(fp8),
        has_sinks=sinks is not None,
        dropout_p=float(dropout_p),
        attention_chunk=int(attention_chunk),
        block_h=bh,
        hbk=hbk,
        pipelined=pipelined,
        seqlen_q=sq,
        seqlen_k=sk,
        sched_uncond=os.environ.get("FLASH_ATTN_TPU_SCHED_UNCOND") == "1",
        emit_lse=bool(emit_lse),
    )

    if not (p.softcap > 0.0 or p.has_alibi) and not fp8:
        # Fold scale*log2(e) into Q (see _fwd_kernel); rounding back to the
        # input dtype adds at most one extra ulp of quantisation, same order
        # as the input's own low-precision error.
        q = (q.astype(jnp.float32) * (p.scale * LOG2E)).astype(q.dtype)

    def _run_sched(p_c: FwdParams, schedule, q_c, k_c, v_c, part_dtype):
        """One scheduled-grid pallas_call (tables from _build_schedule or
        _build_split_schedules).  Operands must already be padded to the
        call's own block multiples."""
        qi_tab, ki_tab, fl_tab, combos = schedule
        T = len(qi_tab)
        bq_c, bk_c, bh_c = p_c.block_q, p_c.block_k, p_c.block_h
        hbk_c = p_c.hbk
        sqp_c = q_c.shape[2]
        skp_c = k_c.shape[2]
        bks_c = p_c.block_k_sub or bk_c
        brs_c = p_c.block_q_sub or bq_c
        nsub_c = bk_c // bks_c
        nrsub_c = bq_c // brs_c

        # subtile-blocked 5-D layout: subtile reads in the kernel are
        # leading-dim slices (no sublane-subslice penalty) and whole-tile
        # reads are free contiguous reshapes
        q5 = q_c.reshape(b, h, sqp_c // brs_c, brs_c, d)
        k5 = k_c.reshape(b, k_c.shape[1], skp_c // bks_c, bks_c, d)
        v5 = v_c.reshape(b, v_c.shape[1], skp_c // bks_c, bks_c, dv)

        def q_map_s(b_, hb_, t, qi_r, ki_r, fl_r):
            return (b_, hb_, qi_r[t], 0, 0)

        def kv_map_s(b_, hb_, t, qi_r, ki_r, fl_r):
            if g == 1:
                return (b_, hb_, ki_r[t], 0, 0)
            return (b_, (hb_ * bh_c) // g, ki_r[t], 0, 0)

        in_specs_s = [
            pl.BlockSpec((1, bh_c, nrsub_c, brs_c, d), q_map_s),
            pl.BlockSpec((1, hbk_c, nsub_c, bks_c, d), kv_map_s),
            pl.BlockSpec((1, hbk_c, nsub_c, bks_c, dv), kv_map_s),
        ]
        inputs_s = [q5, k5, v5]
        if p_c.has_sinks:
            in_specs_s.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            inputs_s.append(jnp.asarray(sinks, jnp.float32).reshape(h))
        # host-precomputed constant mask-bias tiles (constant index map:
        # fetched into VMEM once, never re-DMAed)
        bias_pats, bias_index = _static_bias_patterns(p_c, combos)
        for pat in bias_pats:
            in_specs_s.append(pl.BlockSpec(
                pat.shape, lambda b_, hb_, t, qi_r, ki_r, fl_r: (0, 0)))
            inputs_s.append(jnp.asarray(pat))
        out_specs_s = [pl.BlockSpec((1, bh_c, nrsub_c, brs_c, dv), q_map_s)]
        out_shape_s = [jax.ShapeDtypeStruct(
            (b, h, sqp_c // brs_c, brs_c, dv), part_dtype)]
        lse_packed = bq_c % (8 * LANES) == 0
        if p_c.emit_lse and lse_packed:
            # packed LSE: bq rows per tile as (bq/LANES sublanes x LANES)
            def lse_map_s(b_, hb_, t, qi_r, ki_r, fl_r):
                return (b_, hb_, qi_r[t], 0)

            out_specs_s.append(
                pl.BlockSpec((1, bh_c, bq_c // LANES, LANES), lse_map_s))
            out_shape_s.append(jax.ShapeDtypeStruct(
                (b, h, sqp_c // LANES, LANES), jnp.float32))
        elif p_c.emit_lse:
            # sublane-misaligned bq: LANES-broadcast fallback layout
            out_specs_s.append(
                pl.BlockSpec((1, bh_c, nrsub_c, brs_c, LANES), q_map_s))
            out_shape_s.append(jax.ShapeDtypeStruct(
                (b, h, sqp_c // brs_c, brs_c, LANES), jnp.float32))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, h // bh_c, T),
            in_specs=in_specs_s,
            out_specs=out_specs_s,
            scratch_shapes=[
                pltpu.VMEM((bh_c, nrsub_c, brs_c, dv), jnp.float32),
                pltpu.VMEM((bh_c, nrsub_c, brs_c, LANES), jnp.float32),
                pltpu.VMEM((bh_c, nrsub_c, brs_c, LANES), jnp.float32),
            ],
        )
        flops = 4 * b * h * sq * sk * d // (2 if causal else 1)
        res = pl.pallas_call(
            functools.partial(_fwd_sched_kernel, p_c, combos, bias_index),
            grid_spec=grid_spec,
            out_shape=out_shape_s,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=(q_c.size + k_c.size + v_c.size
                                ) * q_c.dtype.itemsize,
                transcendentals=b * h * sq * sk,
            ),
            interpret=use_interpret(),
        )(jnp.asarray(qi_tab), jnp.asarray(ki_tab), jnp.asarray(fl_tab),
          *inputs_s)
        res = list(res) if isinstance(res, (tuple, list)) else [res]
        o5 = res[0].reshape(b, h, sqp_c, dv)
        if p_c.emit_lse and lse_packed:
            return o5, res[1].reshape(b, h, sqp_c)
        if p_c.emit_lse:
            return o5, res[1].reshape(b, h, sqp_c, LANES)[..., 0]
        return o5, None

    if pipelined and boundary_heavy and split_diag is not None:
        # Interior/diagonal split (see _build_split_schedules): the
        # interior call runs the mask-free body at dense-tuned tiles, the
        # diagonal call sweeps the boundary band at a small block_k so
        # masked waste shrinks from ~bk/2 to ~bk_dia/2 columns per row;
        # partials merge by the split-KV combine identity.
        bk_dia, bh_dia = split_diag
        bh_dia = min(bh_dia, h if g == 1 else g)
        while (h if g == 1 else g) % bh_dia:
            bh_dia -= 1
        # sinks only in the interior call: the virtual logit must join the
        # softmax denominator exactly once across the merged partials
        # (partials always emit LSE — the merge identity needs it)
        p_int = dataclasses.replace(p, emit_lse=True)
        p_dia = dataclasses.replace(
            p, block_k=bk_dia, block_k_sub=bk_dia, block_h=bh_dia,
            hbk=bh_dia if g == 1 else 1, has_sinks=False, emit_lse=True)
        sched_int, sched_dia = _build_split_schedules(p, p_dia, nq)
        o_i, lse_i = _run_sched(p_int, sched_int, q, k, v, jnp.float32)
        o_d, lse_d = _run_sched(p_dia, sched_dia, q, k, v, jnp.float32)
        from flash_attn_tpu.kernels.combine import merge_attn_state

        o, lse = merge_attn_state(o_i, lse_i, o_d, lse_d)
        o = o.astype(out_dtype)
        lse = lse[:, :, :sq]
        if sq_p != sq:
            o = o[:, :, :sq, :]
        return o, lse

    if pipelined and boundary_heavy:
        # Scheduled grid: zero wasted ticks for causal/local masks (see
        # _build_schedule).
        o, lse = _run_sched(p, _build_schedule(p, nq, nk), q, k, v,
                            out_dtype)
        if lse is not None:
            lse = lse[:, :, :sq]
        if sq_p != sq:
            o = o[:, :, :sq, :]
        return o, lse

    def q_map(b_, hb_, qi, ki, sq_ref, sk_ref):
        return (b_, hb_, qi, 0)

    def kv_map(b_, hb_, qi, ki, sq_ref, sk_ref):
        min_ki, max_ki = _kv_block_bounds(p, qi, sq_ref[b_], sk_ref[b_])
        ki_eff = jnp.clip(ki, jnp.maximum(min_ki, 0), jnp.maximum(max_ki, 0))
        ki_eff = jnp.clip(ki_eff, 0, nk - 1)
        if g == 1:
            # MHA: kv head block aligns with the q head block
            return (b_, hb_, ki_eff, 0)
        # GQA: the whole q-head block shares one kv head
        return (b_, (hb_ * bh) // g, ki_eff, 0)

    def out_map(b_, hb_, qi, ki, sq_ref, sk_ref):
        return (b_, hb_, qi, 0)

    lse_map = out_map

    in_specs = [
        pl.BlockSpec((1, bh, bq, d), q_map),
        pl.BlockSpec((1, hbk, bk, d), kv_map),
        pl.BlockSpec((1, hbk, bk, dv), kv_map),
    ]
    inputs = [q, k, v]
    if alibi_slopes is not None:
        slopes = jnp.broadcast_to(
            jnp.asarray(alibi_slopes, jnp.float32).reshape(-1, h), (b, h)
        )
        # Whole array resident in SMEM; the kernel indexes [b, h] directly
        # (Mosaic requires SMEM blocks to cover the full array).
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(slopes)
    if fp8:
        for ds in (q_descale, k_descale, v_descale):
            ds = jnp.ones((b, hk), jnp.float32) if ds is None else (
                jnp.broadcast_to(
                    jnp.asarray(ds, jnp.float32).reshape(-1, hk), (b, hk)
                )
            )
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            inputs.append(ds)
    if sinks is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(sinks, jnp.float32).reshape(h))
    if dropout_p > 0.0:
        seed = jnp.asarray(
            0 if dropout_seed is None else dropout_seed, jnp.int32
        ).reshape(1)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(seed)

    out_specs = [pl.BlockSpec((1, bh, bq, dv), out_map)]
    out_shape = [jax.ShapeDtypeStruct((b, h, sq_p, dv), out_dtype)]
    if p.emit_lse:
        # LSE is lane-replicated to a (…, 128) trailing dim: TPU block
        # shapes need the last dim tiled; the wrapper strips it.
        out_specs.append(pl.BlockSpec((1, bh, bq, LANES), lse_map))
        out_shape.append(
            jax.ShapeDtypeStruct((b, h, sq_p, LANES), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, h // bh, nq, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((bh, bq, dv), jnp.float32),
            pltpu.VMEM((bh, bq, LANES), jnp.float32),
            pltpu.VMEM((bh, bq, LANES), jnp.float32),
        ],
    )

    kernel = functools.partial(_fwd_kernel, p)
    flops = 4 * b * h * sq * sk * d
    if causal:
        flops //= 2
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
        interpret=use_interpret(),
    )(
        jnp.asarray(seqused_q, jnp.int32),
        jnp.asarray(seqused_k, jnp.int32),
        *inputs,
    )
    o = res[0]
    lse = res[1][:, :, :sq, 0] if p.emit_lse else None
    if sq_p != sq:
        o = o[:, :, :sq, :]
    return o, lse
