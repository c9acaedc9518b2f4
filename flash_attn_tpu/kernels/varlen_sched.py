"""Scheduled-grid packed varlen attention — first-class varlen.

The round-1 packed path rode the flex kernel (~2.5x per-tile overhead,
no softcap/alibi/dropout).  This kernel brings the dense kernel's tricks
to the packed (total_tokens, h, d) stream:

* **Device-built tile schedule** (the `VarlenDynamicPersistentTileScheduler`
  role, `hopper/tile_scheduler.hpp:493`, and the varlen `BlockInfo` role,
  `csrc/flash_attn/src/block_info.h:13`): interval logic on cu_seqlens
  marks each (q block, kv block) pair needed / full / boundary, and the
  pairs are flattened into scalar-prefetched tables walked by a
  `(heads/block_h, T)` grid.  T is a static worst-case bound; unused tail
  entries are EMPTY ticks with no DMA or compute.
* **Aux words**: each token carries `(segment << 16) | pos_from_seq_end`
  (as in `varlen_packed.py`) — boundary tiles mask with three vector
  compares; interior tiles skip the mask entirely.  From-end coordinates
  make bottom-right causal one compare and give ALiBi its |i-j| directly
  (|fq - fk|).
* **Head blocking + software pipelining** as in `flash_fwd.py`: QK of
  item n issues ahead of softmax+PV of item n-1.
* softcap / ALiBi / dropout supported (the round-1 gaps).

Backward: first-class packed backward on the same scheduled grid
(`_varlen_sched_bwd` — the varlen `run_mha_bwd` role,
`csrc/flash_attn/flash_api.cpp:757` + `csrc/flash_attn/src/block_info.h:13`
driving the bwd kernel): dK/dV-stationary walk of a device-built
KV-major tile table over the packed (total_tokens, h, d) streams, with a
whole-stream dQ accumulator in VMEM scratch.  Total fwd+bwd cost scales
with total-token work, not b * max_s^2.  When the dQ scratch would not
fit VMEM the backward falls back to re-gathering to the padded layout
and running the dense deterministic backward (`flash_bwd.py`) with
per-sequence `seqused`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.env import use_interpret
from flash_attn_tpu.kernels.block_sizes import cdiv, round_up
from flash_attn_tpu.kernels.flash_fwd import (
    LANES,
    LOG2E,
    MASK_VALUE,
    dropout_keep,
)

_POS_BITS = 16
_POS_MASK = (1 << _POS_BITS) - 1
_PAD_SEG = 0x7FFF
# Additive mask bias: far below the MASK_VALUE floor of the running max,
# so exp2((bias - m) * c) is exactly 0 in f32 (see _varlen_sched_kernel).
_VL_BIAS = -3e38

_FIRST, _LAST, _BOUND, _EMPTY = 1, 2, 4, 8
STAT = 8  # q-aux lane replication


def token_aux(cu_seqlens, total, total_p, seqused=None):
    """(total_p,) int32 aux words: (segment << 16) | pos_from_seq_END.

    `seqused` optionally limits the used tokens per sequence: tokens at or
    beyond the used length get the pad segment (match nothing)."""
    idx = jnp.arange(total_p, dtype=jnp.int32)
    nseq = cu_seqlens.shape[0] - 1
    seg = jnp.clip(
        jnp.searchsorted(cu_seqlens, idx, side="right").astype(jnp.int32) - 1,
        0, nseq - 1)
    if seqused is not None:
        used = jnp.asarray(seqused, jnp.int32)
        end = cu_seqlens[seg] + used[seg]
    else:
        end = cu_seqlens[seg + 1]
    from_end = jnp.clip(end - 1 - idx, 0, _POS_MASK)
    aux = (seg << _POS_BITS) | from_end
    pad = jnp.int32(_PAD_SEG) << _POS_BITS
    aux = jnp.where(idx < jnp.minimum(total, cu_seqlens[-1]), aux, pad)
    if seqused is not None:
        aux = jnp.where(idx < end, aux, pad)
    return aux


def build_varlen_schedule(
    cu_q, cu_k, total_q_p, total_k_p, *, bq, bk, causal, window, T_max,
    same_stream=False,
):
    """Device-side schedule tables (qi_tab, ki_tab, flags), each (T_max,).

    Interval logic at block granularity (as `varlen_packed.varlen_block_mask`):
    a pair is needed iff the blocks' segment ranges intersect (and survive
    the causal/window block bound); boundary iff a mask can cut it."""
    nq = total_q_p // bq
    nk = total_k_p // bk
    nseq = cu_q.shape[0] - 1
    wl, wr = int(window[0]), int(window[1])

    def seg_of(pos, cu):
        s = jnp.searchsorted(cu, pos, side="right").astype(jnp.int32) - 1
        return jnp.clip(s, 0, nseq - 1)

    q0 = jnp.arange(nq, dtype=jnp.int32) * bq
    q1 = q0 + bq - 1
    k0 = jnp.arange(nk, dtype=jnp.int32) * bk
    k1 = k0 + bk - 1
    total_q = cu_q[-1]
    k_end_of = cu_k[1:]  # (nseq,) end of keys per segment
    total_k = cu_k[-1]
    q1c = jnp.minimum(q1, total_q - 1)
    k1c = jnp.minimum(k1, total_k - 1)
    qs0, qs1 = seg_of(q0, cu_q), seg_of(q1c, cu_q)
    ks0, ks1 = seg_of(k0, cu_k), seg_of(k1c, cu_k)
    q_in = q0 < total_q
    k_live = k0 < total_k

    inter = ((qs0[:, None] <= ks1[None, :]) & (ks0[None, :] <= qs1[:, None])
             & q_in[:, None] & k_live[None, :])
    if causal and same_stream:
        # Exact stream-level pruning: a packed same-stream causal query
        # never attends a key LATER in the stream (its segment's keys all
        # precede it), so any pair with k0 > q1 is fully masked.  This
        # kills the above-diagonal straddle pairs the segment-intersection
        # test keeps, making needed a subset of the block triangle.
        inter = inter & (k0[None, :] <= q1c[:, None])

    # causal/window block-level pruning + fullness via from-end corners
    q_end = cu_q[qs0 + 1]
    k_end = k_end_of[ks0]
    one_seg = ((qs0 == qs1)[:, None] & (ks0 == ks1)[None, :]
               & (qs0[:, None] == ks0[None, :]))
    blocks_real = (q1[:, None] < total_q) & (k1[None, :] < total_k)
    full = inter & one_seg & blocks_real
    if causal or wr >= 0:
        w = 0 if causal else wr
        pk_last = k_end[None, :] - 1 - k1[None, :]
        pq_first = q_end[:, None] - 1 - q0[:, None]
        full = full & (pk_last >= pq_first - w)
        # prune: block pair dead if even the most-permissive corner fails:
        # largest k from-end vs smallest q from-end
        pk_first = k_end[None, :] - 1 - k0[None, :]
        pq_last = q_end[:, None] - 1 - q1[:, None]
        inter = inter & ~(one_seg & (pk_first < pq_last - w))
    if wl >= 0:
        pk_first = k_end[None, :] - 1 - k0[None, :]
        pq_last = q_end[:, None] - 1 - q1[:, None]
        full = full & (pk_first <= pq_last + wl)
        pk_last = k_end[None, :] - 1 - k1[None, :]
        pq_first = q_end[:, None] - 1 - q0[:, None]
        inter = inter & ~(one_seg & (pk_last > pq_first + wl))

    needed = inter
    # ensure every in-range q block has >= 1 entry (zero-output rows)
    row_any = needed.any(axis=1)
    force = (~row_any) & q_in
    needed = needed | (force[:, None] & (jnp.arange(nk) == 0)[None, :])
    empty_entry = force[:, None] & (jnp.arange(nk) == 0)[None, :]
    boundary = needed & ~full

    # Ordering: qi-major, and *boundary (masked) tiles first* within each
    # row — the row's LAST tick (which carries the per-head finalize)
    # lands on a big mask-free interior tile whose straight-line MXU body
    # hides the finalize VPU work (same trick as the dense scheduled
    # grid's _build_schedule).  Online softmax is order-invariant.
    qi_grid = jnp.arange(nq, dtype=jnp.int32)[:, None]
    ki_grid = jnp.arange(nk, dtype=jnp.int32)[None, :]
    sentinel = jnp.int32(2 * nq * nk)
    key = jnp.where(
        needed,
        (qi_grid * 2 + jnp.where(boundary, 0, 1)) * nk + ki_grid,
        sentinel)
    order = jnp.argsort(key.reshape(-1))[:T_max]
    valid = key.reshape(-1)[order] < sentinel
    pair = order
    qi_tab = jnp.where(valid, pair // nk, nq - 1).astype(jnp.int32)
    ki_tab = jnp.where(valid, pair % nk, 0).astype(jnp.int32)
    # FIRST/LAST recomputed on the *ordered* entries (a row's first tick
    # runs the fresh write-not-RMW body; its last runs the finalize)
    qi_raw = (pair // nk).astype(jnp.int32)
    prev_qi = jnp.concatenate([jnp.full((1,), -1, jnp.int32), qi_raw[:-1]])
    next_qi = jnp.concatenate([qi_raw[1:], jnp.full((1,), -1, jnp.int32)])
    next_valid = jnp.concatenate(
        [valid[1:], jnp.zeros((1,), jnp.bool_)])
    first_o = valid & (qi_raw != prev_qi)
    last_o = valid & ((qi_raw != next_qi) | ~next_valid)
    bnd_o = boundary.reshape(-1)[order]
    emp_o = empty_entry.reshape(-1)[order]
    fl_tab = jnp.where(
        valid,
        (first_o * _FIRST + last_o * _LAST + bnd_o * _BOUND
         + emp_o * _EMPTY).astype(jnp.int32),
        jnp.int32(_EMPTY))
    # padding entries keep the LAST valid entry's (qi, ki) so no fresh DMA
    # or out-block transition happens on the tail
    def carry_last(tab):
        # running "index of last valid entry" via a cumulative max
        idx = jax.lax.cummax(
            jnp.where(valid, jnp.arange(T_max, dtype=jnp.int32), -1))
        idx = jnp.maximum(idx, 0)
        return tab[idx]

    qi_tab = carry_last(qi_tab)
    ki_tab = carry_last(ki_tab)
    return qi_tab, ki_tab, fl_tab


def _varlen_sched_kernel(
    meta, qi_ref, ki_ref, fl_ref, *refs,
):
    """Grid (h//bh, T).  meta = (scale, causal, wl, wr, softcap, has_alibi,
    g, bq, bk, bh, hbk, dropout_p, folded, emit_lse, lse_packed)."""
    (scale, causal, wl, wr, softcap, has_alibi, g, bq, bk, bh, hbk,
     dropout_p, folded, emit_lse, lse_packed) = meta
    refs = list(refs)
    q_ref, k_ref, v_ref, qa_ref, ka_ref = refs[:5]
    refs = refs[5:]
    slopes_ref = refs.pop(0) if has_alibi else None
    seed_ref = refs.pop(0) if dropout_p > 0.0 else None
    if emit_lse:
        o_ref, lse_ref, acc_ref, m_ref, l_ref = refs
    else:
        o_ref, acc_ref, m_ref, l_ref = refs
        lse_ref = None

    hb = pl.program_id(0)
    t = pl.program_id(1)
    hq0 = hb * bh
    qi = qi_ref[t]
    ki = ki_ref[t]
    fl = fl_ref[t]
    first = (fl & _FIRST) != 0
    last = (fl & _LAST) != 0
    boundary = (fl & _BOUND) != 0
    empty = (fl & _EMPTY) != 0
    generic = softcap > 0.0 or has_alibi
    c = LOG2E if generic else 1.0

    @pl.when(first)
    def _init():
        # Zero the running state on a row's first tick.  Kept as ONE
        # predicated region + always-RMW bodies: Mosaic charges ~28us of
        # per-tick overhead on EVERY tick once the kernel carries four
        # matmul-bearing pl.when bodies (measured,
        # benchmarks/diag_varlen_overhead_bisect.py K6), so the dense
        # kernel's fresh-first-tick trick must NOT be ported here as
        # separate fresh bodies.  This region itself is free (K2/K4:
        # 0.4-0.6us/tick).
        # m floor is MASK_VALUE (not -inf): masked scores carry the far
        # lower _VL_BIAS, so exp2((bias - m) * c) underflows to exactly 0
        # and the probability pass needs no select.
        m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qa = qa_ref[:, :1]          # (bq, 1) aux words
    ka = ka_ref[0, :1, :]       # (1, bk)
    seg_q = jax.lax.shift_right_logical(qa, _POS_BITS)
    seg_k = jax.lax.shift_right_logical(ka, _POS_BITS)
    pq = qa & _POS_MASK         # from-end positions
    pk = ka & _POS_MASK

    def build_bias():
        # Head-invariant additive mask bias, built ONCE per tick and
        # shared by every head of the block (one VPU add per head instead
        # of a per-head mask rebuild + two selects).
        mask = jnp.logical_or(seg_q != seg_k, seg_q == _PAD_SEG)
        if causal or wr >= 0:
            w = 0 if causal else wr
            mask = jnp.logical_or(mask, pk < pq - w)
        if wl >= 0:
            mask = jnp.logical_or(mask, pk > pq + wl)
        return jnp.where(mask, _VL_BIAS, 0.0).astype(jnp.float32)

    def qk_stage(hh, bias):
        hkv_local = 0 if hbk == 1 else hh
        kk = k_ref[hkv_local]
        s = jax.lax.dot_general(
            q_ref[hh], kk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if generic:
            s = s * scale
            if softcap > 0.0:
                s = jnp.tanh(s / softcap) * softcap
        if has_alibi:
            slope = slopes_ref[hq0 + hh]
            s = s - slope * jnp.abs(pq - pk).astype(jnp.float32)
        if bias is not None:
            s = s + bias
        return s

    def smpv_stage(hh, s):
        hkv_local = 0 if hbk == 1 else hh
        v = v_ref[hkv_local]
        m_prev = m_ref[hh, :, :1]
        l_prev = l_ref[hh, :, :1]
        m_curr = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp2((m_prev - m_curr) * c)
        pmat = jnp.exp2((s - m_curr) * c)
        l_curr = l_prev * alpha + jnp.sum(pmat, axis=1, keepdims=True)
        m_ref[hh] = jnp.broadcast_to(m_curr, m_ref.shape[1:])
        l_ref[hh] = jnp.broadcast_to(l_curr, l_ref.shape[1:])
        if dropout_p > 0.0:
            rows = qi * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 0)
            cols = ki * bk + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 1)
            keep = dropout_keep(seed_ref[0], 0, hq0 + hh, rows, cols,
                                dropout_p)
            pmat = jnp.where(keep, pmat, 0.0) * (1.0 / (1.0 - dropout_p))
        pv = jax.lax.dot_general(
            pmat.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[hh] = acc_ref[hh] * alpha + pv

    def run_items(with_mask: bool):
        bias = build_bias() if with_mask else None
        prev = None
        for hh in range(bh):
            s = qk_stage(hh, bias)
            if prev is not None:
                smpv_stage(*prev)
            prev = (hh, s)
        smpv_stage(*prev)

    live = jnp.logical_not(empty)

    @pl.when(jnp.logical_and(live, jnp.logical_not(boundary)))
    def _interior():
        run_items(with_mask=False)

    @pl.when(jnp.logical_and(live, boundary))
    def _bound():
        run_items(with_mask=True)

    @pl.when(last)
    def _finalize():
        for hh in range(bh):
            l_final = l_ref[hh, :, :1]
            m_final = m_ref[hh, :, :1]
            zero = l_final == 0.0
            l_safe = jnp.where(zero, 1.0, l_final)
            o_ref[hh] = (acc_ref[hh] / l_safe).astype(o_ref.dtype)
            if lse_ref is not None:
                m_nat = m_final if generic else m_final / LOG2E
                lse = jnp.where(zero, jnp.inf, m_nat + jnp.log(l_safe))
                if lse_packed:
                    # packed rows->(sublane, lane) tile: a 4KB write per
                    # head instead of a 512KB LANES-broadcast
                    lse_ref[hh] = lse.reshape(lse_ref.shape[1:])
                else:
                    lse_ref[hh] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _varlen_sched_fwd(
    q, k, v, cu_q, cu_k, qa, ka_rows, qi_tab, ki_tab, fl_tab, *,
    scale, causal, window, softcap, alibi_slopes, dropout_p, dropout_seed,
    bq, bk, bh, emit_lse=True,
):
    """Raw scheduled forward.  q: (total_q_p, h, d) padded; aux/tables
    prebuilt.  Returns o (total_q_p, h, d) and lse (h, total_q_p) —
    lse is None when `emit_lse` is off (the inference primal skips the
    write: lane-replicated it is 2x the output's HBM bytes)."""
    total_q_p, h, d = q.shape
    total_k_p = k.shape[0]
    hk = k.shape[1]
    dv = v.shape[-1]
    g = h // hk
    limit = h if g == 1 else g
    bh = min(bh, limit)
    while limit % bh:
        bh -= 1
    hbk = bh if g == 1 else 1
    generic = softcap > 0.0 or alibi_slopes is not None

    qT = jnp.swapaxes(q, 0, 1)          # (h, total_q_p, d)
    kT = jnp.swapaxes(k, 0, 1)
    vT = jnp.swapaxes(v, 0, 1)
    if not generic:
        qT = (qT.astype(jnp.float32) * (scale * LOG2E)).astype(qT.dtype)

    T = int(qi_tab.shape[0])

    def q_map(hb_, t, qi_r, ki_r, fl_r):
        return (hb_, qi_r[t], 0)

    def kv_map(hb_, t, qi_r, ki_r, fl_r):
        if g == 1:
            return (hb_, ki_r[t], 0)
        return ((hb_ * bh) // g, ki_r[t], 0)

    def qa_map(hb_, t, qi_r, ki_r, fl_r):
        return (qi_r[t], 0)

    def ka_map(hb_, t, qi_r, ki_r, fl_r):
        return (ki_r[t], 0, 0)

    in_specs = [
        pl.BlockSpec((bh, bq, d), q_map),
        pl.BlockSpec((hbk, bk, d), kv_map),
        pl.BlockSpec((hbk, bk, dv), kv_map),
        pl.BlockSpec((bq, STAT), qa_map),
        pl.BlockSpec((1, STAT, bk), ka_map),
    ]
    qa_rep = jnp.broadcast_to(qa[:, None], (total_q_p, STAT))
    inputs = [qT, kT, vT, qa_rep, ka_rows]
    if alibi_slopes is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(alibi_slopes, jnp.float32).reshape(h))
    if dropout_p > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(
            0 if dropout_seed is None else dropout_seed, jnp.int32
        ).reshape(1))

    lse_packed = emit_lse and bq % (8 * LANES) == 0
    meta = (float(scale), bool(causal), int(window[0]), int(window[1]),
            float(softcap), alibi_slopes is not None, g, bq, bk, bh, hbk,
            float(dropout_p), not generic, bool(emit_lse), lse_packed)

    out_specs = [pl.BlockSpec((bh, bq, dv), q_map)]
    out_shape = [jax.ShapeDtypeStruct((h, total_q_p, dv), q.dtype)]
    if lse_packed:
        def lse_map(hb_, t, qi_r, ki_r, fl_r):
            return (hb_, qi_r[t], 0)

        out_specs.append(pl.BlockSpec((bh, bq // LANES, LANES), lse_map))
        out_shape.append(jax.ShapeDtypeStruct(
            (h, total_q_p // LANES, LANES), jnp.float32))
    elif emit_lse:
        out_specs.append(pl.BlockSpec((bh, bq, LANES), q_map))
        out_shape.append(jax.ShapeDtypeStruct(
            (h, total_q_p, LANES), jnp.float32))

    res = pl.pallas_call(
        functools.partial(_varlen_sched_kernel, meta),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(h // bh, T),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((bh, bq, dv), jnp.float32),
                pltpu.VMEM((bh, bq, LANES), jnp.float32),
                pltpu.VMEM((bh, bq, LANES), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * h * bq * bk * d * T,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=h * bq * bk * T,
        ),
        interpret=use_interpret(),
    )(qi_tab, ki_tab, fl_tab, *inputs)
    res = list(res) if isinstance(res, (tuple, list)) else [res]
    o = jnp.swapaxes(res[0], 0, 1)
    if lse_packed:
        return o, res[1].reshape(h, total_q_p)
    if emit_lse:
        return o, res[1][..., 0]
    return o, None


def _sched_t_max(nq, nk, causal, bq, bk, same_stream, nseq, max_sk=None):
    """Static worst-case schedule length.

    Causal same-stream (with the stream-level pruning in
    `build_varlen_schedule`): needed pairs lie within the block triangle
    (k0 <= q1), and each q row's keys span at most
    [q0 - max_seqlen_k + 1, q1] — a static `bq + max_sk - 1` stream
    window — so the row is additionally bounded by the block count of
    that window.  Everything else: full rectangle.
    """
    if causal and same_stream:
        span = nk if max_sk is None else min(
            nk, (bq + int(max_sk) - 2) // bk + 2)
        return sum(min(nk, span, ((qi + 1) * bq - 1) // bk + 1)
                   for qi in range(nq))
    return nq * nk


# ---------------------------------------------------------------------------
# First-class packed backward (scheduled grid)
# ---------------------------------------------------------------------------

# Flags for the backward schedule (KV-stationary walk)
_BV_INIT = 1      # very first entry of the grid row: zero the dQ accumulator
_BV_FIRST = 2     # first entry of this kv block: zero dK/dV accumulators
_BV_LAST = 4      # last entry of this kv block: flush dK/dV
_BV_BOUND = 8     # tile needs the elementwise mask
_BV_COMPUTE = 16  # run the compute body
_BV_DQFLUSH = 32  # last visit of this (q block, head): write the dq slab

# dQ scratch ceiling: g * total_q_p * d * 4 bytes must fit VMEM alongside
# the working tiles (mirrors flash_bwd._FUSED_DQ_SCRATCH_LIMIT).
_PACKED_BWD_DQ_LIMIT = 48 * 1024 * 1024


def build_varlen_bwd_schedule(
    cu_q, cu_k, total_q_p, total_k_p, *, bq, bk, causal, window, g, T_max,
    same_stream=False,
):
    """Device-side KV-major schedule for the packed backward.

    Same interval analysis as `build_varlen_schedule`, but ordered
    ki-major (dK/dV stationary) and expanded by the GQA group `g`
    (t = one (ki, qi, gi) tile).  Returns (ki_tab, qi_tab, gi_tab,
    fl_tab), each (T_max * g,).

    dQ correctness: entries are ki-ascending, so the LAST scheduled visit
    of any (gi, qi) carries the completed dQ accumulator slab and its
    write wins (earlier per-tick writes are dead stores) — the same
    convention as `flash_bwd._build_bwd_schedule`.
    """
    nq = total_q_p // bq
    nk = total_k_p // bk
    nseq = cu_q.shape[0] - 1
    wl, wr = int(window[0]), int(window[1])

    def seg_of(pos, cu):
        s = jnp.searchsorted(cu, pos, side="right").astype(jnp.int32) - 1
        return jnp.clip(s, 0, nseq - 1)

    q0 = jnp.arange(nq, dtype=jnp.int32) * bq
    q1 = q0 + bq - 1
    k0 = jnp.arange(nk, dtype=jnp.int32) * bk
    k1 = k0 + bk - 1
    total_q = cu_q[-1]
    total_k = cu_k[-1]
    q1c = jnp.minimum(q1, total_q - 1)
    k1c = jnp.minimum(k1, total_k - 1)
    qs0, qs1 = seg_of(q0, cu_q), seg_of(q1c, cu_q)
    ks0, ks1 = seg_of(k0, cu_k), seg_of(k1c, cu_k)
    q_in = q0 < total_q
    k_live = k0 < total_k

    inter = ((qs0[:, None] <= ks1[None, :]) & (ks0[None, :] <= qs1[:, None])
             & q_in[:, None] & k_live[None, :])
    if causal and same_stream:
        # stream-level pruning (see build_varlen_schedule)
        inter = inter & (k0[None, :] <= q1c[:, None])

    q_end = cu_q[qs0 + 1]
    k_end = cu_k[ks0 + 1]
    one_seg = ((qs0 == qs1)[:, None] & (ks0 == ks1)[None, :]
               & (qs0[:, None] == ks0[None, :]))
    blocks_real = (q1[:, None] < total_q) & (k1[None, :] < total_k)
    full = inter & one_seg & blocks_real
    if causal or wr >= 0:
        w = 0 if causal else wr
        pk_last = k_end[None, :] - 1 - k1[None, :]
        pq_first = q_end[:, None] - 1 - q0[:, None]
        full = full & (pk_last >= pq_first - w)
        pk_first = k_end[None, :] - 1 - k0[None, :]
        pq_last = q_end[:, None] - 1 - q1[:, None]
        inter = inter & ~(one_seg & (pk_first < pq_last - w))
    if wl >= 0:
        pk_first = k_end[None, :] - 1 - k0[None, :]
        pq_last = q_end[:, None] - 1 - q1[:, None]
        full = full & (pk_first <= pq_last + wl)
        pk_last = k_end[None, :] - 1 - k1[None, :]
        pq_first = q_end[:, None] - 1 - q0[:, None]
        inter = inter & ~(one_seg & (pk_last > pq_first + wl))

    needed = inter
    # forced rows: every in-range q block needs >= 1 entry so its dq slab
    # is written (zeros); forced columns: every live kv block needs >= 1
    # entry so its dk/dv tiles are written (zeros)
    col0 = (jnp.arange(nk) == 0)[None, :]
    row0 = (jnp.arange(nq) == 0)[:, None]
    row_any = needed.any(axis=1)
    force_row = (~row_any) & q_in
    aug = needed | (force_row[:, None] & col0)
    col_any = aug.any(axis=0)
    force_col = (~col_any) & k_live
    aug = aug | (force_col[None, :] & row0)

    # per-kv-block first/last via a column-wise cumsum
    csum = jnp.cumsum(aug, axis=0)
    first = aug & (csum == 1)
    last = aug & (csum == csum[-1:, :])
    boundary = needed & ~full

    flags = (first * _BV_FIRST + last * _BV_LAST + boundary * _BV_BOUND
             + needed * _BV_COMPUTE).astype(jnp.int32)

    flat_aug = aug.reshape(-1)                      # index = qi * nk + ki
    qi_grid = jnp.arange(nq, dtype=jnp.int32)[:, None]
    ki_grid = jnp.arange(nk, dtype=jnp.int32)[None, :]
    key2 = jnp.where(aug, ki_grid * nq + qi_grid, jnp.int32(nq * nk))
    order = jnp.argsort(key2.reshape(-1))[:T_max]
    valid = key2.reshape(-1)[order] < nq * nk
    qi_tab = jnp.where(valid, order // nk, 0).astype(jnp.int32)
    ki_tab = jnp.where(valid, order % nk, 0).astype(jnp.int32)
    fl_tab = jnp.where(valid, flags.reshape(-1)[order], 0)
    del flat_aug

    # tail entries carry the last valid (ki, qi) — no fresh DMA or block
    # transition on padding ticks
    idx = jax.lax.cummax(
        jnp.where(valid, jnp.arange(T_max, dtype=jnp.int32), -1))
    idx = jnp.maximum(idx, 0)
    qi_tab, ki_tab = qi_tab[idx], ki_tab[idx]

    # dq flush = last visit of each q block (tail padding entries carry the
    # last valid qi with compute off, so flushing there writes the same
    # completed slab)
    pos = jnp.arange(T_max, dtype=jnp.int32)
    last_pos = jax.ops.segment_max(pos, qi_tab, num_segments=nq)
    flush = pos == last_pos[qi_tab]
    fl_tab = jnp.where(flush, fl_tab | _BV_DQFLUSH, fl_tab)

    # expand by the GQA group: FIRST/INIT only at gi == 0, LAST at g - 1
    fl_tab = fl_tab.at[0].set(fl_tab[0] | _BV_INIT)
    qi_g = jnp.repeat(qi_tab, g)
    ki_g = jnp.repeat(ki_tab, g)
    gi_g = jnp.tile(jnp.arange(g, dtype=jnp.int32), T_max)
    fl_g = jnp.repeat(fl_tab, g)
    fl_g = jnp.where(gi_g == 0, fl_g, fl_g & ~(_BV_FIRST | _BV_INIT))
    fl_g = jnp.where(gi_g == g - 1, fl_g, fl_g & ~_BV_LAST)
    # carry the NEXT dq flush's (qi, gi) backward: the dq out-block index
    # is constant between flushes, so Pallas copies each completed slab
    # out exactly once (see flash_bwd._build_bwd_schedule dqo_tab)
    Tg = T_max * g
    posg = jnp.arange(Tg, dtype=jnp.int32)
    flushg = (fl_g & _BV_DQFLUSH) != 0
    nf = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(flushg, posg, jnp.int32(Tg - 1)))))
    dqo_g = qi_g[nf] * g + gi_g[nf]
    return ki_g, qi_g, gi_g, fl_g, dqo_g


def _varlen_bwd_kernel(meta, ki_ref, qi_ref, gi_ref, fl_ref, dqo_ref,
                       *refs):
    """Grid (hk, T*g).  One (kv block, q block, group head) tile per tick:
    recompute S from the packed streams + aux-word mask, 5 matmuls
    (S, dV += P^T dO, dP = dO V^T, dK += dS^T Q, dQ += dS K)."""
    (scale, causal, wl, wr, softcap, has_alibi, g, bq, bk, dropout_p,
     folded, nq) = meta
    refs = list(refs)
    (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qa_ref,
     ka_ref) = refs[:8]
    refs = refs[8:]
    slopes_ref = refs.pop(0) if has_alibi else None
    seed_ref = refs.pop(0) if dropout_p > 0.0 else None
    dq_ref, dk_ref, dv_ref, dq_all, dk_acc, dv_acc = refs

    hk_i = pl.program_id(0)
    i = pl.program_id(1)
    ki = ki_ref[i]
    qi = qi_ref[i]
    gi = gi_ref[i]
    fl = fl_ref[i]
    hq = hk_i * g + gi
    dq_off = (gi * nq + qi) * bq

    @pl.when((fl & _BV_INIT) != 0)
    def _init_dq():
        dq_all[...] = jnp.zeros_like(dq_all)

    @pl.when((fl & _BV_FIRST) != 0)
    def _init_dkv():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def body(masked):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse_row = lse_ref[0][:, :1]
        delta_row = delta_ref[0][:, :1]
        qa = qa_ref[:, :1]
        ka = ka_ref[0, :1, :]
        pq = qa & _POS_MASK
        pk = ka & _POS_MASK

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s_cap = None
        if not folded:
            s = s * scale
            if softcap > 0.0:
                s_cap = jnp.tanh(s / softcap) * softcap
                s = s_cap
            if has_alibi:
                slope = slopes_ref[hq]
                s = s - slope * jnp.abs(pq - pk).astype(jnp.float32)

        if masked:
            seg_q = jax.lax.shift_right_logical(qa, _POS_BITS)
            seg_k = jax.lax.shift_right_logical(ka, _POS_BITS)
            mask = jnp.logical_or(seg_q != seg_k, seg_q == _PAD_SEG)
            if causal or wr >= 0:
                w = 0 if causal else wr
                mask = jnp.logical_or(mask, pk < pq - w)
            if wl >= 0:
                mask = jnp.logical_or(mask, pk > pq + wl)
            s = jnp.where(mask, MASK_VALUE, s)

        # folded: s and lse both in scale*log2(e) units — pmat is bitwise
        # the forward's probability
        pmat = jnp.exp2(s - lse_row) if folded else (
            jnp.exp2((s - lse_row) * LOG2E))
        pd = pmat
        if dropout_p > 0.0:
            # forward hashed on packed-stream coordinates, batch 0
            rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            cols = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            keep = dropout_keep(seed_ref[0], 0, hq, rows, cols, dropout_p)
            rp = 1.0 / (1.0 - dropout_p)
            pd = jnp.where(keep, pmat, 0.0) * rp
        dv_acc[...] += jax.lax.dot_general(
            pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if dropout_p > 0.0:
            dp = jnp.where(keep, dp, 0.0) * rp
        ds = pmat * (dp - delta_row)
        if softcap > 0.0:
            ds = ds * (1.0 - (s_cap / softcap) ** 2)
        if not folded:
            ds = ds * scale
        ds_lp = ds.astype(q.dtype)
        # dK += dS^T Q (folded: q carries scale*log2e — compensated at
        # flush); dQ += dS K (folded: scale rides on the K tile)
        dk_acc[...] += jax.lax.dot_general(
            ds_lp, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        k_dq = k * jnp.asarray(scale, k.dtype) if folded else k
        dq_all[pl.dslice(dq_off, bq), :] += jax.lax.dot_general(
            ds_lp, k_dq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    compute = (fl & _BV_COMPUTE) != 0
    bound = (fl & _BV_BOUND) != 0

    @pl.when(jnp.logical_and(compute, jnp.logical_not(bound)))
    def _interior():
        body(False)

    @pl.when(jnp.logical_and(compute, bound))
    def _boundary():
        body(True)

    # write the dq slab only at the (gi, qi)'s last visit; the out index
    # map parks intermediate ticks on the upcoming flush target so each
    # completed slab is copied out exactly once
    @pl.when((fl & _BV_DQFLUSH) != 0)
    def _flush_dq():
        dq_ref[0] = dq_all[pl.dslice(dq_off, bq), :].astype(dq_ref.dtype)

    @pl.when((fl & _BV_LAST) != 0)
    def _finalize():
        dk = dk_acc[...]
        if folded:
            dk = dk * (1.0 / LOG2E)
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _varlen_sched_bwd(
    q, k, v, do, o, lse, cu_q, cu_k, *, scale, causal, window, softcap,
    slopes, dropout_p, dropout_seed, same_stream, bq, bk, max_sk=None,
):
    """Packed backward launch.  q/do/o: (total_q, h, d); k/v: (total_k,
    hk, d); lse: (h, total_q) natural-log units.  Returns packed
    (dq, dk, dv)."""
    total_q, h, d = q.shape
    total_k, hk, _ = k.shape
    dv_dim = v.shape[-1]
    g = h // hk
    tq_p = round_up(max(total_q, bq), bq)
    tk_p = round_up(max(total_k, bk), bk)
    nq, nk = tq_p // bq, tk_p // bk
    folded = softcap == 0.0 and slopes is None

    cu_q32 = jnp.asarray(cu_q, jnp.int32)
    cu_k32 = jnp.asarray(cu_k, jnp.int32)
    qa = token_aux(cu_q32, total_q, tq_p)
    ka = token_aux(cu_k32, total_k, tk_p)
    qa_rep = jnp.broadcast_to(qa[:, None], (tq_p, STAT))
    ka_rows = jnp.broadcast_to(
        ka.reshape(nk, 1, bk), (nk, STAT, bk)).reshape(nk, STAT, bk)

    # dO . O rowsum preprocess (XLA fused reduction), packed layout
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)                       # (total_q, h)
    delta = jnp.swapaxes(delta, 0, 1)              # (h, total_q)

    def pad_t(x, t):
        return (jnp.pad(x, ((0, t - x.shape[0]), (0, 0), (0, 0)))
                if x.shape[0] != t else x)

    qT = jnp.swapaxes(pad_t(q, tq_p), 0, 1)        # (h, tq_p, d)
    doT = jnp.swapaxes(pad_t(do, tq_p), 0, 1)
    kT = jnp.swapaxes(pad_t(k, tk_p), 0, 1)
    vT = jnp.swapaxes(pad_t(v, tk_p), 0, 1)
    if folded:
        # reproduce the forward's Q fold bit-for-bit; lse to log2 units
        qT = (qT.astype(jnp.float32) * (scale * LOG2E)).astype(qT.dtype)
        lse = lse * LOG2E
    # pad rows: +inf lse -> p == 0; delta 0
    lse_p = jnp.pad(lse, ((0, 0), (0, tq_p - total_q)),
                    constant_values=jnp.inf) if tq_p != total_q else lse
    delta_p = jnp.pad(delta, ((0, 0), (0, tq_p - total_q))) \
        if tq_p != total_q else delta
    lse_r = jnp.broadcast_to(lse_p[..., None], (h, tq_p, STAT))
    delta_r = jnp.broadcast_to(delta_p[..., None], (h, tq_p, STAT))

    nseq = int(cu_q32.shape[0]) - 1
    T_pairs = min(
        nq * nk,
        _sched_t_max(nq, nk, causal, bq, bk, same_stream, nseq,
                     max_sk=max_sk) + nk + nq)
    ki_tab, qi_tab, gi_tab, fl_tab, dqo_tab = build_varlen_bwd_schedule(
        cu_q32, cu_k32, tq_p, tk_p, bq=bq, bk=bk, causal=causal,
        window=window, g=g, T_max=T_pairs, same_stream=same_stream)
    T = int(ki_tab.shape[0])

    def q_map(hk_, i, ki_r, qi_r, gi_r, fl_r, dqo_r):
        return (hk_ * g + gi_r[i], qi_r[i], 0)

    def dq_out_map(hk_, i, ki_r, qi_r, gi_r, fl_r, dqo_r):
        t = dqo_r[i]
        return (hk_ * g + t % g, t // g, 0)

    def kv_map(hk_, i, ki_r, qi_r, gi_r, fl_r, dqo_r):
        return (hk_, ki_r[i], 0)

    def qa_map(hk_, i, ki_r, qi_r, gi_r, fl_r, dqo_r):
        return (qi_r[i], 0)

    def ka_map(hk_, i, ki_r, qi_r, gi_r, fl_r, dqo_r):
        return (ki_r[i], 0, 0)

    in_specs = [
        pl.BlockSpec((1, bq, d), q_map),
        pl.BlockSpec((1, bk, d), kv_map),
        pl.BlockSpec((1, bk, dv_dim), kv_map),
        pl.BlockSpec((1, bq, dv_dim), q_map),
        pl.BlockSpec((1, bq, STAT), q_map),
        pl.BlockSpec((1, bq, STAT), q_map),
        pl.BlockSpec((bq, STAT), qa_map),
        pl.BlockSpec((1, STAT, bk), ka_map),
    ]
    inputs = [qT, kT, vT, doT, lse_r, delta_r, qa_rep, ka_rows]
    if slopes is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(slopes, jnp.float32).reshape(h))
    if dropout_p > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(
            0 if dropout_seed is None else dropout_seed, jnp.int32
        ).reshape(1))

    meta = (float(scale), bool(causal), int(window[0]), int(window[1]),
            float(softcap), slopes is not None, g, bq, bk,
            float(dropout_p), folded, nq)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_varlen_bwd_kernel, meta),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(hk, T),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, bq, d), dq_out_map),
                pl.BlockSpec((1, bk, d), kv_map),
                pl.BlockSpec((1, bk, dv_dim), kv_map),
            ],
            scratch_shapes=[
                pltpu.VMEM((g * tq_p, d), jnp.float32),
                pltpu.VMEM((bk, d), jnp.float32),
                pltpu.VMEM((bk, dv_dim), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((h, tq_p, d), q.dtype),
            jax.ShapeDtypeStruct((hk, tk_p, d), k.dtype),
            jax.ShapeDtypeStruct((hk, tk_p, dv_dim), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=use_interpret(),
    )(ki_tab, qi_tab, gi_tab, fl_tab, dqo_tab, *inputs)
    dq = jnp.swapaxes(dq, 0, 1)[:total_q]
    dk = jnp.swapaxes(dk, 0, 1)[:total_k]
    dv = jnp.swapaxes(dv, 0, 1)[:total_k]
    return dq, dk, dv


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(5, 6, 7, 8, 9, 10, 12, 13, 15),
)
def _sched_core(q, k, v, cu_q, cu_k, max_sq, max_sk, scale, causal, window,
                softcap, slopes, dropout_p, same_stream, dropout_seed,
                blocks):
    o, _ = _sched_fwd_impl(q, k, v, cu_q, cu_k, max_sq, max_sk, scale,
                           causal, window, softcap, slopes, dropout_p,
                           same_stream, dropout_seed,
                           bq=blocks[0], bk=blocks[1], bh=blocks[2],
                           emit_lse=False)
    return o


def _sched_fwd_impl(q, k, v, cu_q, cu_k, max_sq, max_sk, scale, causal,
                    window, softcap, slopes, dropout_p, same_stream,
                    dropout_seed, bq=512, bk=512, bh=4, emit_lse=True):
    total_q, h, d = q.shape
    total_k = k.shape[0]
    tq_p = round_up(max(total_q, bq), bq)
    tk_p = round_up(max(total_k, bk), bk)

    def pad_t(x, t):
        return (jnp.pad(x, ((0, t - x.shape[0]), (0, 0), (0, 0)))
                if x.shape[0] != t else x)

    q_p, k_p, v_p = pad_t(q, tq_p), pad_t(k, tk_p), pad_t(v, tk_p)
    cu_q32 = jnp.asarray(cu_q, jnp.int32)
    cu_k32 = jnp.asarray(cu_k, jnp.int32)
    qa = token_aux(cu_q32, total_q, tq_p)
    ka = token_aux(cu_k32, total_k, tk_p)
    nk = tk_p // bk
    ka_rows = jnp.broadcast_to(
        ka.reshape(nk, 1, bk), (nk, STAT, bk)).reshape(nk, STAT, bk)
    T = _sched_t_max(tq_p // bq, nk, causal, bq, bk, same_stream,
                     int(cu_q32.shape[0]) - 1, max_sk=max_sk)
    qi_tab, ki_tab, fl_tab = build_varlen_schedule(
        cu_q32, cu_k32, tq_p, tk_p, bq=bq, bk=bk, causal=causal,
        window=window, T_max=T, same_stream=same_stream,
    )
    o, lse = _varlen_sched_fwd(
        q_p, k_p, v_p, cu_q32, cu_k32, qa, ka_rows, qi_tab, ki_tab, fl_tab,
        scale=scale, causal=causal, window=window, softcap=softcap,
        alibi_slopes=slopes, dropout_p=dropout_p, dropout_seed=dropout_seed,
        bq=bq, bk=bk, bh=bh, emit_lse=emit_lse,
    )
    return o[:total_q], None if lse is None else lse[:, :total_q]


def _sched_core_fwd(q, k, v, cu_q, cu_k, max_sq, max_sk, scale, causal,
                    window, softcap, slopes, dropout_p, same_stream,
                    dropout_seed, blocks):
    o, lse = _sched_fwd_impl(q, k, v, cu_q, cu_k, max_sq, max_sk, scale,
                             causal, window, softcap, slopes, dropout_p,
                             same_stream, dropout_seed,
                             bq=blocks[0], bk=blocks[1], bh=blocks[2])
    return o, (q, k, v, cu_q, cu_k, o, lse, slopes, dropout_seed)


def _sched_core_bwd(max_sq, max_sk, scale, causal, window, softcap,
                    dropout_p, same_stream, blocks, res, do):
    """Backward dispatch: first-class packed backward on the scheduled
    grid when the whole-stream dQ accumulator fits VMEM; otherwise gather
    the packed streams into (b, max_s) layout and run the dense
    deterministic backward with per-sequence seqused."""
    import os

    from flash_attn_tpu.kernels.flash_bwd import flash_attn_bwd_bhsd

    q, k, v, cu_q, cu_k, o, lse, slopes, dropout_seed = res
    total_q_, h_, d_ = q.shape
    g_ = h_ // k.shape[1]
    bq_, bk_ = blocks[0], blocks[1]
    tq_p_ = round_up(max(total_q_, bq_), bq_)
    fits = g_ * tq_p_ * d_ * 4 <= _PACKED_BWD_DQ_LIMIT
    if fits and os.environ.get("FLASH_ATTN_TPU_NO_PACKED_BWD") != "1":
        gq, gk, gv = _varlen_sched_bwd(
            q, k, v, do, o, lse, cu_q, cu_k, scale=scale, causal=causal,
            window=window, softcap=softcap, slopes=slopes,
            dropout_p=dropout_p, dropout_seed=dropout_seed,
            same_stream=same_stream, bq=bq_, bk=bk_, max_sk=max_sk)
        return gq, gk, gv, None, None, None, None
    total_q, h, d = q.shape
    total_k = k.shape[0]
    b = cu_q.shape[0] - 1
    lens_q = cu_q[1:] - cu_q[:-1]
    lens_k = cu_k[1:] - cu_k[:-1]

    def to_padded(x, cu, max_s, total):
        idx = cu[:-1, None] + jnp.arange(max_s, dtype=jnp.int32)[None, :]
        return x[jnp.minimum(idx, total - 1)]

    qp = jnp.swapaxes(to_padded(q, cu_q, max_sq, total_q), 1, 2)
    kp = jnp.swapaxes(to_padded(k, cu_k, max_sk, total_k), 1, 2)
    vp = jnp.swapaxes(to_padded(v, cu_k, max_sk, total_k), 1, 2)
    op = jnp.swapaxes(to_padded(o, cu_q, max_sq, total_q), 1, 2)
    dop = jnp.swapaxes(to_padded(do, cu_q, max_sq, total_q), 1, 2)
    # padded-layout lse: (b, h, max_sq); pad rows -> +inf (p == 0)
    idx = cu_q[:-1, None] + jnp.arange(max_sq, dtype=jnp.int32)[None, :]
    row_valid = (jnp.arange(max_sq, dtype=jnp.int32)[None, :]
                 < lens_q[:, None])
    lse_p = lse[:, jnp.minimum(idx, total_q - 1)]      # (h, b, max_sq)
    lse_p = jnp.swapaxes(lse_p, 0, 1)
    lse_p = jnp.where(row_valid[:, None, :], lse_p, jnp.inf)

    dq, dk, dv = flash_attn_bwd_bhsd(
        dop, qp, kp, vp, op, lse_p, lens_q, lens_k,
        softmax_scale=scale, causal=causal, window_size=window,
        softcap=softcap, alibi_slopes=slopes, dropout_p=dropout_p,
        dropout_seed=dropout_seed,
        # the packed forward hashed dropout on packed-stream coordinates;
        # shift the padded layout's (row, col) by each sequence's start so
        # the keep masks agree bit-for-bit
        dropout_packed_offsets=(
            (cu_q[:-1], cu_k[:-1]) if dropout_p > 0.0 else None),
    )

    def to_packed(xp, cu, total, max_s, lens):
        seg = jnp.clip(
            jnp.searchsorted(cu, jnp.arange(total, dtype=jnp.int32),
                             side="right").astype(jnp.int32) - 1,
            0, b - 1)
        pos = jnp.arange(total, dtype=jnp.int32) - cu[seg]
        return jnp.swapaxes(xp, 1, 2)[seg, jnp.clip(pos, 0, max_s - 1)]

    gq = to_packed(dq, cu_q, total_q, max_sq, lens_q)
    gk = to_packed(dk, cu_k, total_k, max_sk, lens_k)
    gv = to_packed(dv, cu_k, total_k, max_sk, lens_k)
    return gq, gk, gv, None, None, None, None


_sched_core.defvjp(_sched_core_fwd, _sched_core_bwd)


def flash_attn_varlen_sched_func(
    q, k, v, cu_seqlens_q, cu_seqlens_k, max_seqlen_q=None,
    max_seqlen_k=None, *, softmax_scale=None, causal=False,
    window_size=(-1, -1), softcap=0.0, alibi_slopes=None, dropout_p=0.0,
    dropout_seed=None, block_q=None, block_k=None, block_h=None,
):
    """First-class packed varlen attention (scheduled grid).

    q: (total_q, h, d); k/v: (total_k, hk, d); cu_seqlens: (b+1,) int32.
    Dropout uses packed-stream positions for its keep-mask hash.  The
    dropout/mask semantics need per-sequence lengths <= 65535 (aux words);
    callers route longer sequences to the padded path."""
    total_q, h, d = q.shape
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    # one-sided window normalisation (reference `flash_api.cpp:141-142`)
    if window_size[0] >= 0 and window_size[1] < 0:
        window_size = (window_size[0], int(max_seqlen_k))
    elif window_size[1] >= 0 and window_size[0] < 0 and not causal:
        window_size = (int(max_seqlen_k), window_size[1])
    for name, ms in (("q", max_seqlen_q), ("k", max_seqlen_k)):
        if ms is not None and int(ms) > _POS_MASK:
            raise ValueError(
                f"packed varlen supports per-sequence lengths up to "
                f"{_POS_MASK}; max_seqlen_{name}={int(ms)} exceeds it")
    same_stream = cu_seqlens_q is cu_seqlens_k
    slopes = (None if alibi_slopes is None
              else jnp.asarray(alibi_slopes, jnp.float32).reshape(h))
    if max_seqlen_q is None or max_seqlen_k is None:
        raise ValueError("max_seqlen_q/max_seqlen_k are required")
    from flash_attn_tpu.kernels.block_sizes import varlen_block_sizes

    vb = varlen_block_sizes(q.shape[0], k.shape[0], h, d)
    blocks = (int(block_q or vb.block_q), int(block_k or vb.block_k),
              int(block_h or vb.block_h))
    return _sched_core(
        q, k, v, jnp.asarray(cu_seqlens_q, jnp.int32),
        jnp.asarray(cu_seqlens_k, jnp.int32), int(max_seqlen_q),
        int(max_seqlen_k), float(softmax_scale), bool(causal),
        (int(window_size[0]), int(window_size[1])), float(softcap),
        slopes, float(dropout_p), bool(same_stream), dropout_seed, blocks,
    )
