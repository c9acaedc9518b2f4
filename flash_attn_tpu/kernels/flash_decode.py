"""KV-cache decode attention: split-KV kernel, paged KV, GQA head packing.

TPU-native redesign of the reference decode stack:
* `mha_fwd_kvcache` host logic (`csrc/flash_attn/flash_api.cpp:1240-1480`):
  cache append, rotary, cache_batch_idx, leftpad.
* split-KV kernel + combine (`flash_fwd_kernel.h:499`
  `compute_attn_1rowblock_splitkv`, `:1111` combine; heuristic
  `flash_api.cpp:263`).
* GQA q-head packing: the reference folds q heads into the M dimension for
  single-token decode (`seqlenq_ngroups_swapped`, `flash.h:142`; FA3
  `pack_gqa.h`).  Here q is reshaped (b, h, sq, d) -> (b, hk, g*sq, d) so
  one MXU pass serves a whole KV head group.
* paged KV (`flash.h:100-103` block_table): the kernels consume the
  reference page layout (num_pages, page_size, hk, d) directly — one
  whole-page DMA per grid step (all kv heads), a static in-kernel head loop
  over cheap 128-lane slices, page table scalar-prefetched into the
  BlockSpec index maps (no gather materialisation, no cache transposes).

Decode is HBM-bandwidth-bound (reading the cache once is the floor), so the
kernel keeps K/V streaming through VMEM with the online-softmax state in
scratch.  On a single TPU core the grid is a pipelined sequential loop —
there is no SM-occupancy cliff — so `num_splits` defaults to 1; splits
exist for parity and for sharded decode where splits land on different
devices.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.env import use_interpret

# INT8 decode variant knob (benchmarking): 1 = dequantise slabs to bf16
# per step instead of native int8 MXU matmuls.
import os as _os

_INT8_CAST = _os.environ.get("FLASH_ATTN_TPU_INT8_CAST", "") == "1"
# 1 = keep native int8 QK^T but cast the V slab to bf16 and run PV in
# bf16 (skips the probability-tile int8 quantisation).
_INT8_PV_CAST = _os.environ.get("FLASH_ATTN_TPU_INT8_PV", "") == "1"
# Diagnostic: skip the attention math, only touch the KV slabs (isolates
# DMA/grid cost from compute cost; output is garbage).
_DECODE_NOCOMPUTE = _os.environ.get(
    "FLASH_ATTN_TPU_DECODE_NOCOMPUTE", "") == "1"

from flash_attn_tpu.kernels.block_sizes import cdiv, round_up
from flash_attn_tpu.kernels.combine import combine_attn_partials
from flash_attn_tpu.kernels.flash_fwd import LOG2E, MASK_VALUE, flash_attn_fwd_bhsd

STAT_LANES = 8


@dataclasses.dataclass(frozen=True)
class DecodeParams:
    scale: float
    causal: bool
    window_left: int
    window_right: int
    softcap: float
    has_alibi: bool
    has_leftpad: bool
    g: int
    sq: int
    lp_rows: int  # padded packed-row count
    block_k: int
    blocks_per_split: int
    paged: bool
    attention_chunk: int = 0
    # FP8 (e4m3) KV cache with per-(batch, kv-head) descale — quantised-
    # cache decode (FA3 FP8 semantics, `hopper/flash_api.cpp:694-696`).
    fp8_kv: bool = False
    # INT8 KV cache: the v5e-native quantised cache.  No dequant cast of
    # the streamed slabs at all — QK^T runs as a native int8 MXU matmul
    # against a per-(batch, kv-head)-quantised int8 Q, and PV quantises
    # the probability tile to int8 (scale 127).  The MXU runs int8 at 2x
    # the bf16 rate and HBM traffic halves, so this path is FASTER than
    # bf16 decode (unlike fp8, whose byte->bf16 VPU cast dominated).
    int8_kv: bool = False
    # KV tiles DMA'd per grid step: small pages are bundled so each step
    # streams >= ~512 rows (measured on v5e: 256-row DMAs leave >3x HBM
    # bandwidth on the table; the bundle is the Pallas analogue of the
    # reference's multi-page loads in `paged_kv.h`).
    bundle: int = 1
    # Fused KV pages (npages, 2, page, hk, d): K and V of a page live in
    # ONE contiguous slab, so each page costs ONE DMA of 2x the bytes.
    fused: bool = False
    # Vectorised-over-heads page processing: ONE masked online-softmax
    # update on the (hk*rows, bk) score tile per page instead of hk
    # serial (rows, bk) updates.  At small pages the per-(head, page)
    # VPU-chain overhead — not DMA — is what caps streaming (compute-
    # ablated kernel reaches 817 GB/s at page 256 where the per-head
    # kernel decodes at ~420), so collapsing hk updates into one wide
    # pass is the lever.  Gated off for alibi and for large score tiles
    # (vreg pressure), where the per-head loop is already DMA-bound.
    wide: bool = False

    @property
    def wr(self) -> int:
        return 0 if self.causal else self.window_right

    @property
    def has_upper(self) -> bool:
        return self.causal or self.window_right >= 0

    @property
    def has_lower(self) -> bool:
        return self.window_left >= 0


def _decode_kernel(p: DecodeParams, *args):
    # scalar-prefetch refs
    if p.paged:
        lens_ref, leftpad_ref, cbi_ref, table_ref = args[:4]
        rest = args[4:]
    else:
        lens_ref, leftpad_ref, cbi_ref = args[:3]
        rest = args[3:]
    F = p.bundle
    q_ref = rest[0]
    k_refs = rest[1:1 + F]
    v_refs = rest[1 + F:1 + 2 * F]
    rest = rest[1 + 2 * F:]
    slopes_ref = rest[0] if p.has_alibi else None
    if p.has_alibi:
        rest = rest[1:]
    o_ref, lse_ref, acc_ref, m_ref, l_ref = rest

    b = pl.program_id(0)
    s = pl.program_id(2)
    ki = pl.program_id(3)
    bps = p.blocks_per_split
    bk = p.block_k
    rows_n = p.lp_rows

    len_b = lens_ref[b]
    lp_b = leftpad_ref[b] if p.has_leftpad else 0

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    len_eff = len_b - lp_b
    offset = len_eff - p.sq
    kg_min = lp_b // bk
    if p.has_lower:
        min_col = lp_b + jnp.maximum(0, offset - p.window_left)
        kg_min = min_col // bk
    kg_max = (len_b - 1) // bk  # negative when the cache is empty

    def _compute(kg, k_ref, v_ref):
        q = q_ref[0, 0]  # (rows_n, d)
        k = k_ref[0, 0]  # (bk, d)
        v = v_ref[0, 0]

        st = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        st = st * p.scale
        if p.softcap > 0.0:
            st = jnp.tanh(st / p.softcap) * p.softcap

        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_n, bk), 0)
        pos = rows % p.sq  # row -> position within the query chunk
        cols_g = kg * bk + jax.lax.broadcasted_iota(jnp.int32, (rows_n, bk), 1)
        cols = cols_g - lp_b

        if p.has_alibi:
            # per-row slope: row r belongs to q head group gi = r // sq
            slope = jnp.zeros((rows_n, 1), jnp.float32)
            gi = rows[:, :1] // p.sq
            for i in range(p.g):
                slope = jnp.where(gi == i, slopes_ref[0, i], slope)
            st = st - slope * jnp.abs(pos + offset - cols).astype(jnp.float32)

        mask = jnp.logical_or(cols < 0, cols >= len_eff)
        if p.has_upper:
            mask = jnp.logical_or(mask, cols > pos + offset + p.wr)
        if p.has_lower:
            mask = jnp.logical_or(mask, cols < pos + offset - p.window_left)
        if p.attention_chunk > 0:
            cc = p.attention_chunk
            mask = jnp.logical_or(mask, cols // cc != (pos + offset) // cc)
        st = jnp.where(mask, MASK_VALUE, st)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_curr = jnp.maximum(m_prev, jnp.max(st, axis=1, keepdims=True))
        alpha = jnp.exp2((m_prev - m_curr) * LOG2E)
        pmat = jnp.exp2((st - m_curr) * LOG2E)
        pmat = jnp.where(mask, 0.0, pmat)
        l_curr = l_prev * alpha + jnp.sum(pmat, axis=1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_curr, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_curr, l_ref.shape)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            pmat.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for j in range(F):
        kg_j = (s * bps + ki) * F + j
        ok = jnp.logical_and(kg_j >= kg_min, kg_j <= kg_max)

        @pl.when(ok)
        def _go(kg_j=kg_j, j=j):
            _compute(kg_j, k_refs[j], v_refs[j])

    @pl.when(ki == bps - 1)
    def _finalize():
        l_final = l_ref[:, :1]
        m_final = m_ref[:, :1]
        empty = l_final == 0.0
        l_safe = jnp.where(empty, 1.0, l_final)
        o_ref[0, 0, 0] = acc_ref[...] / l_safe
        lse = jnp.where(empty, jnp.inf, m_final + jnp.log(l_safe))
        lse_ref[0, 0, 0] = jnp.broadcast_to(lse, lse_ref.shape[3:])


def decode_attn_bhsd(
    q,
    k_cache,
    v_cache,
    cache_seqlens,
    *,
    softmax_scale: float,
    causal: bool = True,
    window_size=(-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    block_table=None,
    cache_batch_idx=None,
    cache_leftpad=None,
    num_splits: int = 1,
    block_k: int | None = None,
    attention_chunk: int = 0,
):
    """Split-KV decode attention on native layouts.

    q: (b, h, sq, d).  Non-paged cache: (bc, hk, smax, d).  Paged cache:
    (hk, num_pages, page_size, d) with block_table (b, pages_per_seq).
    cache_seqlens: (b,) total used keys (including any appended tokens).
    Returns (o (b, h, sq, d) in q.dtype, lse (b, h, sq) float32).
    """
    b, h, sq, d = q.shape
    paged = block_table is not None
    # per-transfer BYTES set the DMA bandwidth regime (see
    # decode_attn_ref_layout): quantised caches stream 2x the rows
    widen = max(1, 2 // k_cache.dtype.itemsize)
    if block_k is None:
        block_k = 1024 * widen
    if paged:
        hk, npages, page, _ = k_cache.shape
        block_k = page
        smax_blocks = block_table.shape[1]
        nk_max = smax_blocks
        # bundle small pages so each grid step streams >= 512 KV rows
        # (bf16-equivalent bytes)
        target = 512 * widen
        bundle = max(1, target // block_k) if block_k < target else 1
    else:
        bc, hk, smax, _ = k_cache.shape
        block_k = min(block_k, round_up(smax, 8))
        smax_p = round_up(smax, block_k)
        if smax_p != smax:
            k_cache = jnp.pad(k_cache, ((0, 0), (0, 0), (0, smax_p - smax), (0, 0)))
            v_cache = jnp.pad(v_cache, ((0, 0), (0, 0), (0, smax_p - smax), (0, 0)))
        nk_max = smax_p // block_k
        bundle = 1
    g = h // hk
    rows = g * sq
    rows_p = max(8, round_up(rows, 8))

    qp = q.reshape(b, hk, g, sq, d).reshape(b, hk, rows, d)
    if rows_p != rows:
        qp = jnp.pad(qp, ((0, 0), (0, 0), (0, rows_p - rows), (0, 0)))

    nk_bund = cdiv(nk_max, bundle)
    num_splits = max(1, min(int(num_splits), nk_bund))
    bps = cdiv(nk_bund, num_splits)

    p = DecodeParams(
        scale=float(softmax_scale),
        causal=bool(causal),
        window_left=int(window_size[0]),
        window_right=int(window_size[1]),
        softcap=float(softcap),
        has_alibi=alibi_slopes is not None,
        has_leftpad=cache_leftpad is not None,
        g=g,
        sq=sq,
        lp_rows=rows_p,
        block_k=block_k,
        blocks_per_split=bps,
        paged=paged,
        bundle=bundle,
        attention_chunk=int(attention_chunk),
    )

    lens = jnp.asarray(cache_seqlens, jnp.int32)
    leftpad = (
        jnp.asarray(cache_leftpad, jnp.int32)
        if cache_leftpad is not None
        else jnp.zeros((b,), jnp.int32)
    )
    cbi = (
        jnp.asarray(cache_batch_idx, jnp.int32)
        if cache_batch_idx is not None
        else jnp.arange(b, dtype=jnp.int32)
    )

    scalar_args = [lens, leftpad, cbi]
    nsp = 3
    if paged:
        scalar_args.append(jnp.asarray(block_table, jnp.int32))
        nsp = 4

    def q_map(b_, h_, s_, ki, *refs):
        return (b_, h_, 0, 0)

    def _kg_eff(j, b_, s_, ki, lens_ref, leftpad_ref):
        len_b = lens_ref[b_]
        lp_b = leftpad_ref[b_] if p.has_leftpad else 0
        kg = (s_ * bps + ki) * bundle + j
        kg_min = lp_b // block_k
        kg_max = jnp.maximum((len_b - 1) // block_k, 0)
        return jnp.clip(jnp.clip(kg, kg_min, kg_max), 0, nk_max - 1)

    def make_kv_map(j):
        if paged:
            def kv_map(b_, h_, s_, ki, lens_ref, leftpad_ref, cbi_ref,
                       table_ref):
                kg = _kg_eff(j, b_, s_, ki, lens_ref, leftpad_ref)
                page_id = table_ref[b_, kg]
                return (h_, page_id, 0, 0)
        else:
            def kv_map(b_, h_, s_, ki, lens_ref, leftpad_ref, cbi_ref):
                kg = _kg_eff(j, b_, s_, ki, lens_ref, leftpad_ref)
                return (cbi_ref[b_], h_, kg, 0)
        return pl.BlockSpec((1, 1, block_k, d), kv_map)

    kv_specs = [make_kv_map(j) for j in range(bundle)]
    in_specs = ([pl.BlockSpec((1, 1, rows_p, d), q_map)]
                + kv_specs + kv_specs)
    inputs = [qp] + [k_cache] * bundle + [v_cache] * bundle
    if alibi_slopes is not None:
        slopes = jnp.broadcast_to(
            jnp.asarray(alibi_slopes, jnp.float32).reshape(-1, h), (b, h)
        ).reshape(b, hk, g)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, g),
                lambda b_, h_, s_, ki, *refs: (b_, h_, 0),
                memory_space=pltpu.SMEM,
            )
        )
        inputs.append(slopes)

    def o_map(b_, h_, s_, ki, *refs):
        return (b_, h_, s_, 0, 0)

    o_parts, lse_parts = pl.pallas_call(
        functools.partial(_decode_kernel, p),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsp,
            grid=(b, hk, num_splits, bps),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, 1, rows_p, d), o_map),
                pl.BlockSpec((1, 1, 1, rows_p, STAT_LANES), o_map),
            ],
            scratch_shapes=[
                pltpu.VMEM((rows_p, d), jnp.float32),
                pltpu.VMEM((rows_p, 128), jnp.float32),
                pltpu.VMEM((rows_p, 128), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, hk, num_splits, rows_p, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hk, num_splits, rows_p, STAT_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary", "arbitrary"),
        ),
        interpret=use_interpret(),
    )(*scalar_args, *inputs)

    if num_splits > 1:
        o, lse = combine_attn_partials(
            jnp.moveaxis(o_parts, 2, 0), jnp.moveaxis(lse_parts[..., 0], 2, 0), axis=0
        )
    else:
        o, lse = o_parts[:, :, 0], lse_parts[:, :, 0, :, 0]
    # unpack gqa rows -> heads
    o = o[:, :, :rows].reshape(b, hk, g, sq, d).reshape(b, h, sq, d)
    lse = lse[:, :, :rows].reshape(b, hk, g, sq).reshape(b, h, sq)
    return o.astype(q.dtype), lse


def _decode_ref_kernel(p: DecodeParams, hk: int, *args):
    """Decode kernel over *reference-layout* caches.

    Works directly on (bc, smax, hk, d) / paged (npages, page, hk, d)
    caches — no transposition — with ONE whole-page DMA per grid step and a
    static loop over kv heads inside the kernel.  Measured on v5e this is
    the difference between ~290 GB/s (per-head 64KB DMAs + a host-side
    cache transpose) and near-peak HBM streaming.
    """
    if p.paged:
        lens_ref, leftpad_ref, cbi_ref, table_ref = args[:4]
        rest = args[4:]
    else:
        lens_ref, leftpad_ref, cbi_ref = args[:3]
        rest = args[3:]
    F = p.bundle
    rest = list(rest)
    q_ref = rest[0]
    if p.fused:
        kv_refs = rest[1:1 + F]
        k_refs = v_refs = None
        rest = rest[1 + F:]
    else:
        k_refs = rest[1:1 + F]
        v_refs = rest[1 + F:1 + 2 * F]
        rest = rest[1 + 2 * F:]
    slopes_ref = rest.pop(0) if p.has_alibi else None
    qs_ref = None
    if p.fp8_kv:
        kd_ref, vd_ref = rest[:2]
        rest = rest[2:]
    elif p.int8_kv:
        kd_ref, vd_ref, qs_ref = rest[:3]
        rest = rest[3:]
    else:
        kd_ref = vd_ref = None
    o_ref, lse_ref, acc_ref, m_ref, l_ref = rest

    b = pl.program_id(0)
    s = pl.program_id(1)
    ki = pl.program_id(2)
    bps = p.blocks_per_split
    bk = p.block_k
    rows_n = p.lp_rows

    len_b = lens_ref[b]
    lp_b = leftpad_ref[b] if p.has_leftpad else 0

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    len_eff = len_b - lp_b
    offset = len_eff - p.sq
    kg_min = lp_b // bk
    if p.has_lower:
        min_col = lp_b + jnp.maximum(0, offset - p.window_left)
        kg_min = min_col // bk
    kg_max = (len_b - 1) // bk

    def _compute_wide(kg, kraw, vraw):
        """One online-softmax update for ALL kv heads of a page.

        The score tile is (hk*rows, bk) — heads stacked on sublanes — so
        the mask/softmax/state RMW chain runs once per page instead of hk
        times.  The per-head work that must stay per-head (QK and PV
        matmuls: different operands per head) is issued back-to-back so
        Mosaic overlaps MXU passes with the single wide VPU phase."""
        d = q_ref.shape[-1]
        dv = vraw.shape[-1] // hk
        R = rows_n
        HR = hk * R

        rr = jax.lax.broadcasted_iota(jnp.int32, (HR, bk), 0) % R
        pos = rr % p.sq
        cols = kg * bk + jax.lax.broadcasted_iota(
            jnp.int32, (HR, bk), 1) - lp_b
        mask = jnp.logical_or(cols < 0, cols >= len_eff)
        if p.has_upper:
            mask = jnp.logical_or(mask, cols > pos + offset + p.wr)
        if p.has_lower:
            mask = jnp.logical_or(mask, cols < pos + offset - p.window_left)
        if p.attention_chunk > 0:
            cc = p.attention_chunk
            mask = jnp.logical_or(mask, cols // cc != (pos + offset) // cc)

        if p.fp8_kv or (p.int8_kv and _INT8_CAST):
            kslab = kraw.astype(jnp.bfloat16)
            vslab = vraw.astype(jnp.bfloat16)
        elif p.int8_kv and _INT8_PV_CAST:
            kslab = kraw
            vslab = vraw.astype(jnp.bfloat16)
        else:
            kslab = kraw
            vslab = vraw

        def head_vec(val_fn):
            # (HR, 1) f32 carrying val_fn(h) on head h's row block
            hv = jax.lax.broadcasted_iota(jnp.int32, (HR, 1), 0) // R
            out = jnp.zeros((HR, 1), jnp.float32)
            for h_ in range(hk):
                out = jnp.where(hv == h_, val_fn(h_), out)
            return out

        int8_native = p.int8_kv and not _INT8_CAST
        sts = []
        for h in range(hk):
            q = q_ref[0, h]
            k = kslab[:, h * d:(h + 1) * d]
            if int8_native:
                st_h = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
            else:
                st_h = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            sts.append(st_h)
        st = jnp.concatenate(sts, axis=0)  # (HR, bk)

        if int8_native:
            st = st * head_vec(
                lambda h_: p.scale * qs_ref[b, h_] * kd_ref[b, h_])
        elif p.int8_kv or p.fp8_kv:
            st = st * head_vec(lambda h_: p.scale * kd_ref[b, h_])
        else:
            st = st * p.scale
        if p.softcap > 0.0:
            st = jnp.tanh(st / p.softcap) * p.softcap
        st = jnp.where(mask, MASK_VALUE, st)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_curr = jnp.maximum(m_prev, jnp.max(st, axis=1, keepdims=True))
        alpha = jnp.exp2((m_prev - m_curr) * LOG2E)
        pmat = jnp.exp2((st - m_curr) * LOG2E)
        pmat = jnp.where(mask, 0.0, pmat)
        l_curr = l_prev * alpha + jnp.sum(pmat, axis=1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_curr, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_curr, l_ref.shape)

        if int8_native:
            pop = jnp.round(pmat * 127.0).astype(jnp.int8)
        else:
            pop = pmat.astype(vslab.dtype)
        pvs = []
        for h in range(hk):
            v = vslab[:, h * dv:(h + 1) * dv]
            ph = pop[h * R:(h + 1) * R]
            if int8_native:
                pv_h = jax.lax.dot_general(
                    ph, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
            else:
                pv_h = jax.lax.dot_general(
                    ph, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            pvs.append(pv_h)
        pv = jnp.concatenate(pvs, axis=0)  # (HR, dv)
        if int8_native:
            pv = pv * head_vec(lambda h_: vd_ref[b, h_] * (1.0 / 127.0))
        elif p.int8_kv or p.fp8_kv:
            pv = pv * head_vec(lambda h_: vd_ref[b, h_])
        acc_ref[...] = acc_ref[...] * alpha + pv

    def _compute(kg, kraw, vraw):
        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_n, bk), 0)
        pos = rows % p.sq
        cols = kg * bk + jax.lax.broadcasted_iota(
            jnp.int32, (rows_n, bk), 1) - lp_b
        mask = jnp.logical_or(cols < 0, cols >= len_eff)
        if p.has_upper:
            mask = jnp.logical_or(mask, cols > pos + offset + p.wr)
        if p.has_lower:
            mask = jnp.logical_or(mask, cols < pos + offset - p.window_left)
        if p.attention_chunk > 0:
            cc = p.attention_chunk
            mask = jnp.logical_or(mask, cols // cc != (pos + offset) // cc)

        d = q_ref.shape[-1]
        dv = vraw.shape[-1] // hk
        if p.fp8_kv or (p.int8_kv and _INT8_CAST):
            # dequantise the whole slab once per step (single wide cast)
            kslab = kraw.astype(jnp.bfloat16)
            vslab = vraw.astype(jnp.bfloat16)
        elif p.int8_kv and _INT8_PV_CAST:
            kslab = kraw
            vslab = vraw.astype(jnp.bfloat16)
        else:
            # int8: slabs stay int8 — the MXU consumes them natively
            kslab = kraw
            vslab = vraw
        for h in range(hk):
            q = q_ref[0, h]                      # (rows_n, d)
            # static lane slices of the (bk, hk*d) slab: cheap on TPU
            # (d is a multiple of the 128-lane tile)
            k = kslab[:, h * d:(h + 1) * d]      # (bk, d)
            v = vslab[:, h * dv:(h + 1) * dv]
            if p.int8_kv and not _INT8_CAST:
                st = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                st = st * (p.scale * qs_ref[b, h] * kd_ref[b, h])
            elif p.int8_kv:
                st = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                st = st * (p.scale * kd_ref[b, h])
            else:
                st = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                st = st * (p.scale * kd_ref[b, h] if p.fp8_kv else p.scale)
            if p.softcap > 0.0:
                st = jnp.tanh(st / p.softcap) * p.softcap
            if p.has_alibi:
                slope = jnp.zeros((rows_n, 1), jnp.float32)
                gi = rows[:, :1] // p.sq
                for i in range(p.g):
                    slope = jnp.where(gi == i, slopes_ref[b, h * p.g + i],
                                      slope)
                st = st - slope * jnp.abs(pos + offset - cols).astype(
                    jnp.float32)
            st = jnp.where(mask, MASK_VALUE, st)

            m_prev = m_ref[h, :, :1]
            l_prev = l_ref[h, :, :1]
            m_curr = jnp.maximum(m_prev, jnp.max(st, axis=1, keepdims=True))
            alpha = jnp.exp2((m_prev - m_curr) * LOG2E)
            pmat = jnp.exp2((st - m_curr) * LOG2E)
            pmat = jnp.where(mask, 0.0, pmat)
            l_curr = l_prev * alpha + jnp.sum(pmat, axis=1, keepdims=True)
            m_ref[h] = jnp.broadcast_to(m_curr, m_ref.shape[1:])
            l_ref[h] = jnp.broadcast_to(l_curr, l_ref.shape[1:])
            if p.int8_kv and _INT8_PV_CAST:
                pv = jax.lax.dot_general(
                    pmat.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * vd_ref[b, h]
            elif p.int8_kv and not _INT8_CAST:
                # probability tile quantised to int8 (denominator l stays
                # exact from the fp32 pmat)
                pq = jnp.round(pmat * 127.0).astype(jnp.int8)
                pv = jax.lax.dot_general(
                    pq, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * (vd_ref[b, h] * (1.0 / 127.0))
            elif p.int8_kv:
                pv = jax.lax.dot_general(
                    pmat.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * vd_ref[b, h]
            else:
                pv = jax.lax.dot_general(
                    pmat.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if p.fp8_kv:
                    pv = pv * vd_ref[b, h]
            acc_ref[h] = acc_ref[h] * alpha + pv

    if p.wide:
        # wide path: per-page validity is handled by the column masks
        # (clamped index maps deliver a resident page whose scores mask to
        # -inf), so only whole-step skipping needs a predicate — it is
        # what keeps ragged batches cheap when one sequence is much
        # shorter than the grid.
        kg0 = (s * bps + ki) * F
        ok_step = jnp.logical_and(kg0 + F - 1 >= kg_min, kg0 <= kg_max)

        @pl.when(ok_step)
        def _go_wide():
            for j in range(F):
                if p.fused:
                    kraw, vraw = kv_refs[j][0, 0], kv_refs[j][0, 1]
                else:
                    kraw, vraw = k_refs[j][0], v_refs[j][0]
                if _DECODE_NOCOMPUTE:
                    t = (kraw[:8, :128].astype(jnp.float32)
                         + vraw[:8, :128].astype(jnp.float32))
                    acc_ref[:8, :min(128, acc_ref.shape[-1])] += (
                        t[:, :acc_ref.shape[-1]])
                else:
                    _compute_wide(kg0 + j, kraw, vraw)
    else:
        for j in range(F):
            kg_j = (s * bps + ki) * F + j
            ok_j = jnp.logical_and(kg_j >= kg_min, kg_j <= kg_max)

            @pl.when(ok_j)
            def _go(kg_j=kg_j, j=j):
                if p.fused:
                    # block (1, 2, bk, hk*d): K and V arrive in ONE
                    # contiguous DMA; [0, 0]/[0, 1] are whole-tile loads
                    # (a sublane slice of a flattened 2*bk slab
                    # materialises the full slab first — measured 437 vs
                    # 740 GB/s)
                    kraw, vraw = kv_refs[j][0, 0], kv_refs[j][0, 1]
                else:
                    kraw, vraw = k_refs[j][0], v_refs[j][0]
                if _DECODE_NOCOMPUTE:
                    t = (kraw[:8, :128].astype(jnp.float32)
                         + vraw[:8, :128].astype(jnp.float32))
                    acc_ref[0, :8, :min(128, acc_ref.shape[-1])] += (
                        t[:, :acc_ref.shape[-1]])
                else:
                    _compute(kg_j, kraw, vraw)

    @pl.when(ki == bps - 1)
    def _finalize():
        if p.wide:
            # scratch is (hk*rows, X); outputs are (1, 1, hk, rows, X)
            l_final = l_ref[:, :1]
            m_final = m_ref[:, :1]
            empty = l_final == 0.0
            l_safe = jnp.where(empty, 1.0, l_final)
            o_ref[0, 0] = (acc_ref[...] / l_safe).reshape(
                hk, rows_n, acc_ref.shape[-1])
            lse = jnp.where(empty, jnp.inf, m_final + jnp.log(l_safe))
            lse_ref[0, 0] = jnp.broadcast_to(
                lse.reshape(hk, rows_n, 1), lse_ref.shape[2:])
            return
        l_final = l_ref[:, :, :1]
        m_final = m_ref[:, :, :1]
        empty = l_final == 0.0
        l_safe = jnp.where(empty, 1.0, l_final)
        o_ref[0, 0] = acc_ref[...] / l_safe
        lse = jnp.where(empty, jnp.inf, m_final + jnp.log(l_safe))
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def decode_attn_ref_layout(
    q,
    k_cache,
    v_cache,
    cache_seqlens,
    *,
    softmax_scale: float,
    causal: bool = True,
    window_size=(-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    block_table=None,
    cache_batch_idx=None,
    cache_leftpad=None,
    num_splits: int = 1,
    block_k: int | None = None,
    attention_chunk: int = 0,
    k_descale=None,
    v_descale=None,
    sinks=None,
):
    """Split-KV decode on reference-layout caches (no transposes).

    q: (b, sq, h, d).  Non-paged cache: (bc, smax, hk, d).  Paged:
    (npages, page, hk, d) + block_table (b, pages_per_seq).  Fused paged
    (v_cache=None): (npages, 2, page, hk, d) — K and V of a page in one
    contiguous slab so each page is ONE DMA of 2x the bytes (the per-DMA
    size sets the v5e bandwidth regime).  Returns (o (b, sq, h, d) in
    q.dtype, lse (b, h, sq) float32).
    """
    b, sq, h, d = q.shape
    paged = block_table is not None
    fused = v_cache is None
    if fused and not paged:
        raise ValueError(
            "fused KV cache requires a paged layout (npages, 2, page, hk, d)"
        )
    # Transfer-size equalisation: the v5e DMA engine's effective bandwidth
    # is set by per-transfer BYTES (~330 GB/s at 131 KB, ~1.1 TB/s at
    # >= 512 KB — DESIGN.md decode notes), so quantised caches must stream
    # proportionally MORE rows per grid step or the byte savings of
    # int8/fp8 are cancelled by a lower-bandwidth transfer regime.
    widen = max(1, 2 // k_cache.dtype.itemsize)  # int8/fp8: 2x rows
    if block_k is None:
        block_k = 1024 * widen
    # The manual DMA pipeline currently measures slightly *slower* than the
    # automatic Pallas pipeline on v5e (412 vs 461 GB/s at page 256); kept
    # behind a flag for further tuning.
    import os

    use_pipe = (paged and not fused and alibi_slopes is None
                and not use_interpret()
                and os.environ.get("FLASH_ATTN_TPU_PIPE_DECODE") == "1")
    if paged:
        if fused:
            npages, _two, page, hk, _ = k_cache.shape
            if _two != 2:
                raise ValueError(
                    "fused KV cache must be (npages, 2, page, hk, d)")
        else:
            npages, page, hk, _ = k_cache.shape
        block_k = page
        nk_max = block_table.shape[1]
        # bundle small pages: each grid step should stream >= ~512 KV rows
        # (only for the automatic-pipeline fallback; the manual pipeline
        # overlaps page DMAs itself).  A fused page already carries 2x the
        # rows per DMA.
        import os as _os2

        target = int(_os2.environ.get("FLASH_ATTN_TPU_BUNDLE_ROWS", "1024"))
        target *= widen
        per_dma_rows = (2 if fused else 1) * block_k
        bundle = 1 if use_pipe else max(1, target // per_dma_rows)
    else:
        bc, smax, hk, _ = k_cache.shape
        block_k = min(block_k, round_up(smax, 8))
        smax_p = round_up(smax, block_k)
        if smax_p != smax:
            k_cache = jnp.pad(
                k_cache, ((0, 0), (0, smax_p - smax), (0, 0), (0, 0)))
            v_cache = jnp.pad(
                v_cache, ((0, 0), (0, smax_p - smax), (0, 0), (0, 0)))
        nk_max = smax_p // block_k
        bundle = 1
    dv = k_cache.shape[-1] if fused else v_cache.shape[-1]
    g = h // hk
    rows = g * sq
    rows_p = max(8, round_up(rows, 8))

    # pack GQA heads into rows: (b, sq, h, d) -> (b, hk, g*sq, d)
    qp = jnp.swapaxes(q, 1, 2).reshape(b, hk, g, sq, d).reshape(
        b, hk, rows, d)
    if rows_p != rows:
        qp = jnp.pad(qp, ((0, 0), (0, 0), (0, rows_p - rows), (0, 0)))

    nk_bund = cdiv(nk_max, bundle)
    num_splits = max(1, min(int(num_splits), nk_bund))
    bps = cdiv(nk_bund, num_splits)

    p = DecodeParams(
        scale=float(softmax_scale),
        causal=bool(causal),
        window_left=int(window_size[0]),
        window_right=int(window_size[1]),
        softcap=float(softcap),
        has_alibi=alibi_slopes is not None,
        has_leftpad=cache_leftpad is not None,
        g=g,
        sq=sq,
        lp_rows=rows_p,
        block_k=block_k,
        blocks_per_split=bps,
        paged=paged,
        bundle=bundle,
        fused=fused,
        # wide (vectorised-over-heads) page processing: the winning
        # config whenever the (hk*rows, bk) f32 score tile stays within
        # vreg-friendly bounds; alibi keeps the per-head loop (per-head
        # slope math)
        wide=(alibi_slopes is None
              and block_k * hk * rows_p * 4 <= 256 * 1024),
        attention_chunk=int(attention_chunk),
        fp8_kv=bool(jnp.issubdtype(k_cache.dtype, jnp.floating)
                    and k_cache.dtype.itemsize == 1),
        int8_kv=bool(k_cache.dtype == jnp.int8),
    )

    lens = jnp.asarray(cache_seqlens, jnp.int32)
    leftpad = (jnp.asarray(cache_leftpad, jnp.int32)
               if cache_leftpad is not None else jnp.zeros((b,), jnp.int32))
    cbi = (jnp.asarray(cache_batch_idx, jnp.int32)
           if cache_batch_idx is not None
           else jnp.arange(b, dtype=jnp.int32))
    scalar_args = [lens, leftpad, cbi]
    nsp = 3
    if paged:
        scalar_args.append(jnp.asarray(block_table, jnp.int32))
        nsp = 4

    def q_map(b_, s_, ki, *refs):
        return (b_, 0, 0, 0)

    def _kg_eff(j, b_, s_, ki, lens_ref, leftpad_ref):
        len_b = lens_ref[b_]
        lp_b = leftpad_ref[b_] if p.has_leftpad else 0
        kg = (s_ * bps + ki) * bundle + j
        kg_min = lp_b // block_k
        kg_max = jnp.maximum((len_b - 1) // block_k, 0)
        return jnp.clip(jnp.clip(kg, kg_min, kg_max), 0, nk_max - 1)

    def make_kv_spec(j, lanes):
        if paged:
            def kv_map(b_, s_, ki, lens_ref, leftpad_ref, cbi_ref,
                       table_ref):
                kg = _kg_eff(j, b_, s_, ki, lens_ref, leftpad_ref)
                return (table_ref[b_, kg], 0, 0)
        else:
            def kv_map(b_, s_, ki, lens_ref, leftpad_ref, cbi_ref):
                kg = _kg_eff(j, b_, s_, ki, lens_ref, leftpad_ref)
                return (cbi_ref[b_], kg, 0)
        return pl.BlockSpec((1, block_k, lanes), kv_map)

    # collapse (hk, d) into lanes (free: contiguous) so the kernel takes
    # static lane slices per head instead of strided sublane gathers
    if fused:
        # (npages, 2, page, hk, d) -> (npages, 2, page, hk*d): one block =
        # one page's K rows then V rows, a single contiguous DMA; the kept
        # `2` axis makes the in-kernel K/V reads whole-tile loads
        def fused_kv_spec(j):
            def kv_map(b_, s_, ki, lens_ref, leftpad_ref, cbi_ref,
                       table_ref):
                kg = _kg_eff(j, b_, s_, ki, lens_ref, leftpad_ref)
                return (table_ref[b_, kg], 0, 0, 0)
            return pl.BlockSpec((1, 2, block_k, hk * d), kv_map)

        in_specs = (
            [pl.BlockSpec((1, hk, rows_p, d), q_map)]
            + [fused_kv_spec(j) for j in range(bundle)]
        )
        inputs = ([qp]
                  + [k_cache.reshape(npages, 2, block_k, hk * d)] * bundle)
    else:
        in_specs = (
            [pl.BlockSpec((1, hk, rows_p, d), q_map)]
            + [make_kv_spec(j, hk * d) for j in range(bundle)]
            + [make_kv_spec(j, hk * dv) for j in range(bundle)]
        )
        inputs = ([qp]
                  + [k_cache.reshape(*k_cache.shape[:-2], hk * d)] * bundle
                  + [v_cache.reshape(*v_cache.shape[:-2], hk * dv)] * bundle)
    if alibi_slopes is not None:
        slopes = jnp.broadcast_to(
            jnp.asarray(alibi_slopes, jnp.float32).reshape(-1, h), (b, h)
        )
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(slopes)
    if p.fp8_kv or p.int8_kv:
        for ds in (k_descale, v_descale):
            ds = jnp.ones((b, hk), jnp.float32) if ds is None else (
                jnp.broadcast_to(
                    jnp.asarray(ds, jnp.float32).reshape(-1, hk), (b, hk))
            )
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            inputs.append(ds)
        if use_pipe:
            use_pipe = False  # pipe kernel has no descale path yet
    if p.int8_kv and _INT8_CAST:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.ones((b, hk), jnp.float32))  # qs placeholder
    elif p.int8_kv:
        # per-(batch, kv-head) symmetric int8 quantisation of the packed Q
        amax = jnp.max(jnp.abs(qp.astype(jnp.float32)), axis=(2, 3))
        q_scale = jnp.maximum(amax, 1e-9) / 127.0  # (b, hk)
        qp_i8 = jnp.clip(
            jnp.round(qp.astype(jnp.float32) / q_scale[:, :, None, None]),
            -127, 127,
        ).astype(jnp.int8)
        inputs[0] = qp_i8
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(q_scale.astype(jnp.float32))

    def o_map(b_, s_, ki, *refs):
        return (b_, s_, 0, 0, 0)

    # Paged caches with no alibi go through the manually-pipelined kernel
    # (multi-buffered page DMAs; see _decode_paged_pipe_kernel).  Interpret
    # mode has no DMA semantics, so it uses the automatic pipeline.
    if use_pipe:
        def o_map2(b_, s_, *refs):
            return (b_, s_, 0, 0, 0)

        o_parts, lse_parts = pl.pallas_call(
            functools.partial(_decode_paged_pipe_kernel, p, hk, d, dv,
                              nk_max),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=nsp,
                grid=(b, num_splits),
                in_specs=[
                    pl.BlockSpec(
                        (1, hk, rows_p, d), lambda b_, s_, *r: (b_, 0, 0, 0)
                    ),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=[
                    pl.BlockSpec((1, 1, hk, rows_p, dv), o_map2),
                    pl.BlockSpec((1, 1, hk, rows_p, STAT_LANES), o_map2),
                ],
                scratch_shapes=[
                    pltpu.VMEM((_PIPE_DEPTH, block_k, hk * d), k_cache.dtype),
                    pltpu.VMEM((_PIPE_DEPTH, block_k, hk * dv), v_cache.dtype),
                    pltpu.SemaphoreType.DMA((_PIPE_DEPTH,)),
                    pltpu.SemaphoreType.DMA((_PIPE_DEPTH,)),
                    pltpu.VMEM((hk, rows_p, dv), jnp.float32),
                    pltpu.VMEM((hk, rows_p, 128), jnp.float32),
                    pltpu.VMEM((hk, rows_p, 128), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct(
                    (b, num_splits, hk, rows_p, dv), jnp.float32),
                jax.ShapeDtypeStruct(
                    (b, num_splits, hk, rows_p, STAT_LANES), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(*scalar_args, *inputs[:3])
    else:
        o_parts, lse_parts = pl.pallas_call(
            functools.partial(_decode_ref_kernel, p, hk),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=nsp,
                grid=(b, num_splits, bps),
                in_specs=in_specs,
                out_specs=[
                    pl.BlockSpec((1, 1, hk, rows_p, dv), o_map),
                    pl.BlockSpec((1, 1, hk, rows_p, STAT_LANES), o_map),
                ],
                scratch_shapes=(
                    [
                        pltpu.VMEM((hk * rows_p, dv), jnp.float32),
                        pltpu.VMEM((hk * rows_p, 128), jnp.float32),
                        pltpu.VMEM((hk * rows_p, 128), jnp.float32),
                    ] if p.wide else [
                        pltpu.VMEM((hk, rows_p, dv), jnp.float32),
                        pltpu.VMEM((hk, rows_p, 128), jnp.float32),
                        pltpu.VMEM((hk, rows_p, 128), jnp.float32),
                    ]
                ),
            ),
            out_shape=[
                jax.ShapeDtypeStruct(
                    (b, num_splits, hk, rows_p, dv), jnp.float32),
                jax.ShapeDtypeStruct(
                    (b, num_splits, hk, rows_p, STAT_LANES), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
                # quantised caches stream 2x-row slabs (byte-based DMA
                # sizing) and the fp8 path casts them to bf16 in-body: the
                # scoped intermediates exceed the 16M default
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=use_interpret(),
        )(*scalar_args, *inputs)

    if num_splits > 1:
        o, lse = combine_attn_partials(
            jnp.moveaxis(o_parts, 1, 0),
            jnp.moveaxis(lse_parts[..., 0], 1, 0), axis=0,
        )
    else:
        o, lse = o_parts[:, 0], lse_parts[:, 0, :, :, 0]
    # unpack gqa rows -> heads: (b, hk, rows_p, dv)
    o = o[:, :, :rows].reshape(b, hk, g, sq, dv).reshape(b, h, sq, dv)
    lse = lse[:, :, :rows].reshape(b, hk, g, sq).reshape(b, h, sq)
    if sinks is not None:
        # Attention sink (reference `cute/interface.py:1149`): a virtual
        # per-head logit joining the softmax denominator only.  Applied as
        # an exact post-correction — o' = o * sigmoid(lse - sink),
        # lse' = logaddexp(lse, sink) — which composes with split-KV
        # combine and every cache variant (paged/int8/fp8) with zero
        # kernel changes.  Empty rows carry the +inf-LSE convention: their
        # whole mass goes to the sink (o stays 0, lse' = sink).
        sk_h = jnp.asarray(sinks, jnp.float32).reshape(h)[None, :, None]
        empty = jnp.isposinf(lse)
        o = o * jax.nn.sigmoid(lse - sk_h)[..., None]
        lse = jnp.where(empty, jnp.broadcast_to(sk_h, lse.shape),
                        jnp.logaddexp(lse, sk_h))
    return jnp.swapaxes(o, 1, 2).astype(q.dtype), lse


_PIPE_DEPTH = 4  # in-flight page copies (manual DMA pipeline)


def _decode_paged_pipe_kernel(
    p: DecodeParams, hk: int, d: int, dv: int, nk_max: int,
    lens_ref, leftpad_ref, cbi_ref, table_ref,
    q_ref, k_hbm, v_hbm, o_ref, lse_ref,
    kbuf, vbuf, ksem, vsem, acc_ref, m_ref, l_ref,
):
    """Paged decode with a manual multi-buffered DMA pipeline.

    The automatic Pallas pipeline keeps only one KV tile in flight, so at
    page granularity (256 rows = 512KB) the step time is DMA-*latency*
    bound (~½ of HBM bandwidth on v5e).  This kernel owns its DMAs:
    `_PIPE_DEPTH` page copies run concurrently (start page i+DEPTH, wait
    page i, compute page i), which restores bandwidth-bound streaming while
    keeping the 256-row page granularity of the serving stack — the Pallas
    analogue of the reference's TMA multi-stage pipeline
    (`hopper/sm90_pipeline_no_cluster.hpp`, `cute/pipeline.py:135`).
    """
    b = pl.program_id(0)
    s = pl.program_id(1)
    bps = p.blocks_per_split
    bk = p.block_k
    rows_n = p.lp_rows

    len_b = lens_ref[b]
    lp_b = leftpad_ref[b] if p.has_leftpad else 0
    len_eff = len_b - lp_b
    offset = len_eff - p.sq

    kg_min = lp_b // bk
    kg_max = (len_b - 1) // bk
    p0 = jnp.maximum(s * bps, kg_min)
    p1 = jnp.minimum((s + 1) * bps, kg_max + 1)
    n_my = jnp.maximum(p1 - p0, 0)

    m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
    l_ref[...] = jnp.zeros_like(l_ref)
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def page_id(i):
        kg = jnp.clip(p0 + i, 0, nk_max - 1)
        return table_ref[b, kg]

    def start(i, slot):
        pid = page_id(i)
        pltpu.make_async_copy(k_hbm.at[pid], kbuf.at[slot],
                              ksem.at[slot]).start()
        pltpu.make_async_copy(v_hbm.at[pid], vbuf.at[slot],
                              vsem.at[slot]).start()

    def wait(i, slot):
        pid = page_id(i)
        pltpu.make_async_copy(k_hbm.at[pid], kbuf.at[slot],
                              ksem.at[slot]).wait()
        pltpu.make_async_copy(v_hbm.at[pid], vbuf.at[slot],
                              vsem.at[slot]).wait()

    for t in range(_PIPE_DEPTH):
        @pl.when(t < n_my)
        def _warm(t=t):
            start(t, t)

    def compute(i, slot):
        kg = p0 + i
        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_n, bk), 0)
        pos = rows % p.sq
        cols = kg * bk + jax.lax.broadcasted_iota(
            jnp.int32, (rows_n, bk), 1) - lp_b
        mask = jnp.logical_or(cols < 0, cols >= len_eff)
        if p.has_upper:
            mask = jnp.logical_or(mask, cols > pos + offset + p.wr)
        if p.has_lower:
            mask = jnp.logical_or(mask, cols < pos + offset - p.window_left)
        if p.attention_chunk > 0:
            cc = p.attention_chunk
            mask = jnp.logical_or(mask, cols // cc != (pos + offset) // cc)
        for h in range(hk):
            q = q_ref[0, h]
            k = kbuf[slot, :, h * d:(h + 1) * d]
            v = vbuf[slot, :, h * dv:(h + 1) * dv]
            st = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            st = st * p.scale
            if p.softcap > 0.0:
                st = jnp.tanh(st / p.softcap) * p.softcap
            st = jnp.where(mask, MASK_VALUE, st)
            m_prev = m_ref[h, :, :1]
            l_prev = l_ref[h, :, :1]
            m_curr = jnp.maximum(m_prev, jnp.max(st, axis=1, keepdims=True))
            alpha = jnp.exp2((m_prev - m_curr) * LOG2E)
            pmat = jnp.exp2((st - m_curr) * LOG2E)
            pmat = jnp.where(mask, 0.0, pmat)
            l_curr = l_prev * alpha + jnp.sum(pmat, axis=1, keepdims=True)
            m_ref[h] = jnp.broadcast_to(m_curr, m_ref.shape[1:])
            l_ref[h] = jnp.broadcast_to(l_curr, l_ref.shape[1:])
            acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
                pmat.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    # chunked loop with STATIC buffer slots (a traced slot index would cost
    # a dynamic VMEM base computation inside the hot loop)
    def chunk_body(c, carry):
        base = c * _PIPE_DEPTH
        for t in range(_PIPE_DEPTH):
            i = base + t

            @pl.when(i < n_my)
            def _go(i=i, t=t):
                wait(i, t)
                compute(i, t)

                @pl.when(i + _PIPE_DEPTH < n_my)
                def _next(i=i, t=t):
                    start(i + _PIPE_DEPTH, t)

        return carry

    jax.lax.fori_loop(0, pl.cdiv(n_my, _PIPE_DEPTH), chunk_body, 0)

    l_final = l_ref[:, :, :1]
    m_final = m_ref[:, :, :1]
    empty = l_final == 0.0
    l_safe = jnp.where(empty, 1.0, l_final)
    o_ref[0, 0] = acc_ref[...] / l_safe
    lse = jnp.where(empty, jnp.inf, m_final + jnp.log(l_safe))
    lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _apply_rotary(x, cos, sin, positions, interleaved):
    """Rotary embedding at given positions.

    x: (b, s, h, d); cos/sin: (max_pos, rotary_dim // 2); positions: (b, s).
    Matches `flash_attn/layers/rotary.py:93` `apply_rotary_emb` semantics
    (non-interleaved = GPT-NeoX rotate-half on the first rotary_dim dims).
    """
    rd2 = cos.shape[-1]
    rd = rd2 * 2
    c = cos[positions]  # (b, s, rd2)
    s_ = sin[positions]
    c = c[:, :, None, :].astype(jnp.float32)
    s_ = s_[:, :, None, :].astype(jnp.float32)
    x_rot = x[..., :rd].astype(jnp.float32)
    x_pass = x[..., rd:]
    if interleaved:
        x1 = x_rot[..., 0::2]
        x2 = x_rot[..., 1::2]
        o1 = x1 * c - x2 * s_
        o2 = x1 * s_ + x2 * c
        out = jnp.stack([o1, o2], axis=-1).reshape(x_rot.shape)
    else:
        x1 = x_rot[..., :rd2]
        x2 = x_rot[..., rd2:]
        o1 = x1 * c - x2 * s_
        o2 = x1 * s_ + x2 * c
        out = jnp.concatenate([o1, o2], axis=-1)
    return jnp.concatenate([out.astype(x.dtype), x_pass], axis=-1)


def fuse_kv_cache(k_cache, v_cache):
    """Pack separate paged caches (npages, page, hk, d) into the fused
    layout (npages, 2, page, hk, d): K and V of a page in one contiguous
    slab, so decode streams each page as ONE DMA of twice the bytes.
    Pass the result as `k_cache` with `v_cache=None`."""
    if k_cache.shape != v_cache.shape:
        raise ValueError("fused layout requires k/v caches of equal shape "
                         f"(got {k_cache.shape} vs {v_cache.shape})")
    return jnp.stack([k_cache, v_cache], axis=1)


def split_kv_cache(kv_cache):
    """Inverse of `fuse_kv_cache`: (npages, 2, page, hk, d) -> (K, V)."""
    return kv_cache[:, 0], kv_cache[:, 1]


def flash_attn_with_kvcache(
    q,
    k_cache,
    v_cache,
    k=None,
    v=None,
    rotary_cos=None,
    rotary_sin=None,
    cache_seqlens=None,
    cache_batch_idx=None,
    cache_leftpad=None,
    block_table=None,
    softmax_scale=None,
    causal=False,
    window_size=(-1, -1),
    softcap=0.0,
    rotary_interleaved=False,
    alibi_slopes=None,
    num_splits=0,
    attention_chunk=0,
    k_descale=None,
    v_descale=None,
    sinks=None,
    scheduler_metadata=None,
    pack_gqa=None,
    sm_margin=0,
    return_softmax_lse=False,
    return_updated_cache=False,
    qv=None,
):
    """Decode attention with KV cache (`flash_attn_with_kvcache:1474`).

    Reference layouts: q (b, sq, h, d); k_cache/v_cache (bc, smax, hk, d),
    or paged (num_pages, page_size, hk, d) + block_table (b, pages).
    k/v: (b, snew, hk, d) new tokens appended at cache_seqlens.

    JAX is functional, so instead of in-place cache mutation pass
    `return_updated_cache=True` to get (out[, lse], (k_cache, v_cache))
    back; under jit with donated arguments the update is in-place.

    TPU extension — fused KV pages: pass `v_cache=None` with k_cache of
    shape (npages, 2, page_size, hk, d) (K at [:, 0], V at [:, 1]; build
    with `fuse_kv_cache`).  K and V of a page then stream as ONE
    contiguous DMA of twice the bytes, which roughly doubles paged-decode
    bandwidth at small page sizes on v5e (per-transfer size sets the DMA
    regime; see DESIGN.md).  With `return_updated_cache=True` the fused
    array is returned in place of the (k_cache, v_cache) tuple.
    """
    b, sq, h, d = q.shape
    fused = v_cache is None
    if fused and (block_table is None or k_cache.ndim != 5
                  or k_cache.shape[1] != 2):
        raise ValueError(
            "v_cache=None selects the fused layout: k_cache must be "
            "(npages, 2, page, hk, d) with a block_table")
    del pack_gqa, sm_margin  # accepted for signature parity; GQA packing is
    # always on and there is no SM pool to carve (see decode_attn_ref_layout)
    if scheduler_metadata is not None and not num_splits:
        # dict from get_scheduler_metadata (`flash_attn_interface.py:803`)
        num_splits = int(scheduler_metadata.get("num_splits", 0))
    _scale_was_default = softmax_scale is None
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    paged = block_table is not None
    if cache_seqlens is None:
        page_dim = k_cache.shape[2] if fused else k_cache.shape[1]
        smax = block_table.shape[1] * page_dim if paged else k_cache.shape[1]
        cache_seqlens = jnp.full((b,), smax, jnp.int32)
    elif jnp.ndim(cache_seqlens) == 0:
        cache_seqlens = jnp.full((b,), cache_seqlens, jnp.int32)
    cache_seqlens = jnp.asarray(cache_seqlens, jnp.int32)

    # The kernel consumes the reference layouts directly (whole-page DMAs,
    # kv-head loop in-kernel) — no cache transposition.
    kc, vc = k_cache, v_cache
    if paged:
        page = k_cache.shape[2] if fused else k_cache.shape[1]

    # rotary on q at the cache positions
    if rotary_cos is not None:
        q_pos = (
            cache_seqlens[:, None]
            - (cache_leftpad[:, None] if cache_leftpad is not None else 0)
            + jnp.arange(sq, dtype=jnp.int32)[None, :]
        )
        if not causal and sq == 1:
            pass  # single token: position is just the cache length
        q = _apply_rotary(q, rotary_cos, rotary_sin, q_pos, rotary_interleaved)

    quant_cache = k_cache.dtype.itemsize == 1 and not jnp.issubdtype(
        k_cache.dtype, jnp.unsignedinteger)

    def _quant_append(x, ds):
        # quantise-on-append: new tokens take the cache's existing
        # per-(batch, kv-head) descales (dequant = x_q * descale)
        hk_ = x.shape[2]
        ds = (jnp.ones((b, hk_), jnp.float32) if ds is None
              else jnp.broadcast_to(
                  jnp.asarray(ds, jnp.float32).reshape(-1, hk_), (b, hk_)))
        xs = x.astype(jnp.float32) / ds[:, None, :, None]
        if k_cache.dtype == jnp.int8:
            return jnp.clip(jnp.round(xs), -127, 127).astype(jnp.int8)
        return xs.astype(k_cache.dtype)

    new_len = cache_seqlens
    if k is not None:
        snew = k.shape[1]
        if rotary_cos is not None:
            k_pos = (
                cache_seqlens[:, None]
                - (cache_leftpad[:, None] if cache_leftpad is not None else 0)
                + jnp.arange(snew, dtype=jnp.int32)[None, :]
            )
            k = _apply_rotary(k, rotary_cos, rotary_sin, k_pos, rotary_interleaved)
        if quant_cache:
            k = _quant_append(k, k_descale)
            v = _quant_append(v, v_descale)
        bidx = (
            cache_batch_idx
            if cache_batch_idx is not None
            else jnp.arange(b, dtype=jnp.int32)
        )
        sidx = cache_seqlens[:, None] + jnp.arange(snew, dtype=jnp.int32)[None, :]
        if paged:
            pids = block_table[jnp.arange(b)[:, None], sidx // page]  # (b, snew)
            poff = sidx % page
            if fused:
                kc = kc.at[pids, 0, poff].set(k)
                kc = kc.at[pids, 1, poff].set(v)
            else:
                kc = kc.at[pids, poff].set(k)
                vc = vc.at[pids, poff].set(v)
        else:
            kc = kc.at[jnp.asarray(bidx)[:, None], sidx].set(k)
            vc = vc.at[jnp.asarray(bidx)[:, None], sidx].set(v)
        new_len = cache_seqlens + snew

    qd, kcd, vcd = q, kc, vc
    if qv is not None and fused:
        # MLA qv needs the [Kc|Vc] head-dim concat — unfuse for this call
        # (the updated fused cache is still what's returned)
        kcd, vcd = kc[:, 0], kc[:, 1]
    if qv is not None:
        kc_q, vc_q = kcd, vcd
        # FA3 qv (S = Q·Kᵀ + Qv·Vᵀ, `hopper/flash_attn_interface.py:724`):
        # fold as [Q|Qv]·[Kc|Vc]ᵀ along the head dim, after rotary/append so
        # the returned caches keep the reference layout.  Scale default is
        # 1/sqrt(d+dv) (`hopper/flash_attn_interface.py:370`) — only when
        # the caller left softmax_scale unset.
        if _scale_was_default:
            softmax_scale = 1.0 / math.sqrt(d + qv.shape[-1])
        qv_eff = qv.astype(jnp.float32)
        if quant_cache:
            # Quantised cache (int8/fp8): the kernel applies ONE descale
            # per (batch, kv head) after the fused [Q|Qv]·[Kc|Vc]ᵀ matmul
            # (kd), so fold the V half's descale mismatch into Qv instead:
            # Qv' = Qv * vd/kd gives Qv'·Vᵀ·kd == Qv·Vᵀ·vd.  The q-side
            # int8 quantiser re-normalises per (b, h), so the rescale
            # costs no range (MLA + quantised cache, the round-3 stub —
            # reference path: `hopper/flash_api.cpp:673`).
            hk_c = kc.shape[-2]
            g_q = h // hk_c

            def _ds(dsc):
                if dsc is None:
                    return jnp.ones((b, hk_c), jnp.float32)
                return jnp.broadcast_to(
                    jnp.asarray(dsc, jnp.float32).reshape(-1, hk_c),
                    (b, hk_c))

            ratio = _ds(v_descale) / jnp.maximum(_ds(k_descale), 1e-30)
            ratio_h = jnp.repeat(ratio, g_q, axis=1)       # (b, h)
            qv_eff = qv_eff * ratio_h[:, None, :, None]
            v_descale = _ds(v_descale)  # PV side keeps its own descale
        qd = jnp.concatenate([q, qv_eff.astype(q.dtype)], axis=-1)
        kcd = jnp.concatenate([kc_q, vc_q.astype(kc_q.dtype)], axis=-1)
        vcd = vc_q

    out, lse = decode_attn_ref_layout(
        qd,
        kcd,
        vcd,
        new_len,
        softmax_scale=softmax_scale,
        causal=causal,
        window_size=window_size,
        softcap=softcap,
        alibi_slopes=alibi_slopes,
        block_table=block_table,
        cache_batch_idx=cache_batch_idx,
        cache_leftpad=cache_leftpad,
        num_splits=num_splits or 1,
        attention_chunk=attention_chunk,
        k_descale=k_descale,
        v_descale=v_descale,
        sinks=sinks,
    )

    results = (out,)
    if return_softmax_lse:
        results += (lse,)
    if return_updated_cache:
        results += ((kc,) if fused else ((kc, vc),))
    return results[0] if len(results) == 1 else results
