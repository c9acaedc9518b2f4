"""Programmable attention: mask mods, score mods, block sparsity.

TPU-native counterpart of the reference's FlexAttention-style extensibility
layer in the CuTe-DSL backend (`flash_attn/cute/mask_definitions.py` mask_mod
callables, `flash_attn/cute/block_sparsity.py:21` BlockSparseTensors,
`flash_attn/cute/compute_block_sparsity.py:17` BlockSparsityKernel, score
mods `flash_attn/cute/softmax.py:331` apply_score_mod_inner).

Design (JAX-first — mods are plain traceable functions, no DSL registry):

* ``mask_mod(b, h, q_idx, kv_idx) -> bool`` and
  ``score_mod(score, b, h, q_idx, kv_idx) -> score`` are ordinary JAX
  functions evaluated *inside* the Pallas kernel on (block_q, block_k) index
  grids; anything jnp-expressible works, including closures over arrays
  (document ids, learnable biases) threaded via ``aux_tensors``-style
  closure capture of prefetched values is not needed — close over jnp
  arrays and they are streamed as kernel operands automatically? No: Pallas
  kernels cannot close over arrays, so array-reading mods take the aux
  tensor as an explicit argument via ``aux`` (gathered per block).
* ``create_block_mask`` evaluates the mask once, block-reduces it into
  *full* (every element unmasked — kernel skips mask evaluation) and
  *partial* (kernel evaluates ``mask_mod``) block index lists — the
  ``BlockMask`` here carries both directions (kv-per-q for forward,
  q-per-kv for backward), like torch FlexAttention's BlockMask.
* The kernel iterates only listed blocks: block indices are scalar-
  prefetched to SMEM and drive the K/V BlockSpec index maps, so skipped
  blocks cost neither DMA nor compute — the Pallas analogue of the
  reference's ``BlockSparseTensors`` gather loop.

The backward supports arbitrary score mods via in-kernel ``jax.vjp`` of the
mod — no hand-derived derivative needed (the reference hand-codes e.g. the
softcap derivative).  Gradients flow to q/k/v only, not to arrays closed
over by the mods.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.env import use_interpret
from flash_attn_tpu.kernels.block_sizes import cdiv, round_up

LOG2E = math.log2(math.e)
MASK_VALUE = -1e30
# Additive mask bias for the head-blocked kernel: far below the MASK_VALUE
# floor of the running max, so exp2((bias - m) * c) is exactly 0 in f32 and
# the probability pass needs no select.
_FX_BIAS = -3e38
LANES = 128
STAT_LANES = 8

MaskMod = Callable  # (b, h, q_idx, kv_idx) -> bool
ScoreMod = Callable  # (score, b, h, q_idx, kv_idx) -> score


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BlockMask:
    """Block-sparse attention structure (torch FlexAttention BlockMask /
    reference `block_sparsity.py:21` BlockSparseTensors analogue).

    All index arrays are (B, H, n_major, n_minor) int32 with counts
    (B, H, n_major); `kv_*` drive the forward (per q-block), `q_*` drive
    the backward dK/dV pass (per kv-block).  "full" blocks need no mask
    evaluation; "partial" blocks evaluate mask_mod in-kernel.
    """

    block_q: int
    block_k: int
    q_len: int
    kv_len: int
    kv_num: jnp.ndarray        # partial blocks per q block
    kv_idx: jnp.ndarray
    full_kv_num: jnp.ndarray   # full blocks per q block
    full_kv_idx: jnp.ndarray
    q_num: jnp.ndarray         # partial q blocks per kv block (bwd)
    q_idx: jnp.ndarray
    full_q_num: jnp.ndarray
    full_q_idx: jnp.ndarray

    def tree_flatten(self):
        children = (self.kv_num, self.kv_idx, self.full_kv_num,
                    self.full_kv_idx, self.q_num, self.q_idx,
                    self.full_q_num, self.full_q_idx)
        aux = (self.block_q, self.block_k, self.q_len, self.kv_len)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    @property
    def sparsity(self) -> float:
        """Fraction of block pairs computed (1.0 = dense)."""
        total = (self.kv_num + self.full_kv_num).sum()
        b_, h_, nq, nk = self.kv_idx.shape
        return float(total) / float(b_ * h_ * nq * nk)


def _pack_indices(blockmap):
    """(…, n_major, n_minor) bool -> (counts, ascending indices)."""
    n_minor = blockmap.shape[-1]
    counts = jnp.sum(blockmap, axis=-1, dtype=jnp.int32)
    order = jnp.argsort(~blockmap, axis=-1, stable=True).astype(jnp.int32)
    return counts, order


def _default_flex_block(seq_len: int) -> int:
    """Default flex tile edge: 1024 (v5e sweep at seq8k: 136 TF/s-computed
    causal at 1024x1024/bh4 vs 81 at the old 512x512/bh8 — the same
    geometry optimum as the builtin scheduled kernel), clamped for short
    sequences."""
    return min(1024, round_up(max(seq_len, 1), 128))


def create_block_mask(
    mask_mod: MaskMod,
    B: int,
    H: int,
    q_len: int,
    kv_len: int,
    *,
    block_q: int | None = None,
    block_k: int | None = None,
    q_aux=None,
    kv_aux=None,
    head_invariant: bool = False,
):
    """Evaluate `mask_mod` and build the block-sparse iteration structure.

    Mirrors torch's `create_block_mask` / the reference's
    `compute_block_sparsity.py` kernel: a block is *full* if every element
    is unmasked, *partial* if mixed, skipped if empty.  Evaluation is one
    vmapped pass over the (q_len, kv_len) index grid per (b, h) — done in
    XLA, not in a hand-written kernel (bandwidth-bound boolean reduce).
    Pass the same `q_aux`/`kv_aux` you will pass to `flex_attention`.

    `head_invariant=True` declares that `mask_mod` does not depend on `h`
    (causal, sliding window, document masks...).  The mask is evaluated
    once (h=0) and the index tables are stored with a broadcast head dim
    of 1 — this unlocks the head-blocked forward kernel, which shares K/V
    tiles and the in-kernel mask across a block of heads and software-
    pipelines their independent softmax chains (the flex analogue of the
    main kernel's block_h; without it every (b, h) walks its own serial
    QK->softmax->PV chain and the MXU idles on the VPU steps).
    """
    block_q = block_q or _default_flex_block(q_len)
    block_k = block_k or _default_flex_block(kv_len)
    q_len_p = round_up(q_len, block_q)
    kv_len_p = round_up(kv_len, block_k)
    nq, nk = q_len_p // block_q, kv_len_p // block_k

    qi = jnp.arange(q_len_p, dtype=jnp.int32)
    ki = jnp.arange(kv_len_p, dtype=jnp.int32)
    has_aux = q_aux is not None or kv_aux is not None

    def eval_bh(b, h):
        if has_aux:
            def mm(q_, k_):
                qa = q_aux[b, jnp.minimum(q_, q_aux.shape[1] - 1)] \
                    if q_aux is not None else jnp.int32(0)
                ka = kv_aux[b, jnp.minimum(k_, kv_aux.shape[1] - 1)] \
                    if kv_aux is not None else jnp.int32(0)
                return mask_mod(b, h, q_, k_, qa, ka)
        else:
            def mm(q_, k_):
                return mask_mod(b, h, q_, k_)
        m = jax.vmap(
            jax.vmap(mm, (None, 0)), (0, None)
        )(qi, ki)
        # padded rows/cols are masked out
        m = m & (qi[:, None] < q_len) & (ki[None, :] < kv_len)
        return m.reshape(nq, block_q, nk, block_k)

    bb = jnp.arange(B, dtype=jnp.int32)
    hh = jnp.arange(1 if head_invariant else H, dtype=jnp.int32)
    blocks = jax.vmap(lambda b: jax.vmap(lambda h: eval_bh(b, h))(hh))(bb)
    # (B, H, nq, bq, nk, bk) -> any/all per block
    any_ = blocks.any(axis=(3, 5))
    all_ = blocks.all(axis=(3, 5))
    # "full" additionally requires no padding in the block (padded tails
    # force in-kernel masking).
    partial = any_ & ~all_
    kv_num, kv_idx = _pack_indices(partial)
    full_kv_num, full_kv_idx = _pack_indices(all_)
    anyT = jnp.swapaxes(any_, -1, -2)
    allT = jnp.swapaxes(all_, -1, -2)
    q_num, q_idx = _pack_indices(anyT & ~allT)
    full_q_num, full_q_idx = _pack_indices(allT)
    return BlockMask(
        block_q, block_k, q_len, kv_len,
        kv_num, kv_idx, full_kv_num, full_kv_idx,
        q_num, q_idx, full_q_num, full_q_idx,
    )


def _dense_block_mask(B, H, q_len, kv_len, block_q, block_k, has_mask,
                      head_invariant=False):
    """All blocks listed; partial iff has_mask or the block is padded."""
    nq = cdiv(max(q_len, 1), block_q)
    nk = cdiv(max(kv_len, 1), block_k)
    if head_invariant:
        H = 1
    idx = jnp.broadcast_to(
        jnp.arange(nk, dtype=jnp.int32), (B, H, nq, nk)
    )
    qidx = jnp.broadcast_to(
        jnp.arange(nq, dtype=jnp.int32), (B, H, nk, nq)
    )
    zeros_k = jnp.zeros((B, H, nq), jnp.int32)
    zeros_q = jnp.zeros((B, H, nk), jnp.int32)
    if has_mask or q_len % block_q or kv_len % block_k:
        full_k = zeros_k
        part_k = zeros_k + nk
        full_q = zeros_q
        part_q = zeros_q + nq
    else:
        full_k = zeros_k + nk
        part_k = zeros_k
        full_q = zeros_q + nq
        part_q = zeros_q
    return BlockMask(
        block_q, block_k, q_len, kv_len,
        part_k, idx, full_k, idx, part_q, qidx, full_q, qidx,
    )


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _aux_args(has_aux, qa_ref, ka_ref, bq, bk):
    """Blocked aux views handed to the mods: (bq, 1) q-aux column and
    (1, bk) kv-aux row — `qa == ka` broadcasts to the score tile.

    The kv aux is streamed pre-transposed as (b, nk, 8, bk) rows so the
    kernel never pays a sublane->lane relayout (measured ~30x slowdown
    when reshaping a (bk, 1) column per grid step)."""
    if not has_aux:
        return ()
    qa = qa_ref[0, :, :1] if qa_ref is not None else None
    ka = ka_ref[0, 0, :1, :] if ka_ref is not None else None  # (1, bk)
    return (qa, ka)


def _flex_fwd_kernel(
    scale, score_mod, mask_mod, g, bq, bk, sk_real, has_aux, has_bias,
    folded, kvn_ref, kvi_ref, fn_ref, fi_ref,
    *refs,
):
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    refs = refs[3:]
    if has_aux:
        qa_ref, ka_ref = refs[:2]
        refs = refs[2:]
    else:
        qa_ref = ka_ref = None
    bias_ref = refs.pop(0) if has_bias else None
    o_ref, lse_ref, acc_ref, m_ref, l_ref = refs
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)
    aux = _aux_args(has_aux, qa_ref, ka_ref, bq, bk)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    n_full = fn_ref[b, h, qi]
    n_part = kvn_ref[b, h, qi]
    is_full = ki < n_full
    is_part = jnp.logical_and(ki >= n_full, ki < n_full + n_part)
    # actual kv block index this step loaded (mirrors the index map)
    kis = jnp.minimum(ki, jnp.maximum(n_full + n_part - 1, 0))
    kv_blk = jnp.where(
        kis < n_full, fi_ref[b, h, qi, kis],
        kvi_ref[b, h, qi, jnp.maximum(kis - n_full, 0)],
    )

    # mask-only fast path: scale*log2(e) folded into Q outside the kernel
    # (see flash_fwd.py) — exponent is exp2(s - m), no per-element multiply
    c = 1.0 if folded else LOG2E

    def _update(masked):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if not folded:
            s = s * scale
        if has_bias:
            s = s + bias_ref[0, 0].astype(jnp.float32)
        rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = kv_blk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        if score_mod is not None:
            s = score_mod(s, b, h, rows, cols, *aux)
        if masked:
            keep = cols < sk_real
            if mask_mod is not None:
                keep = jnp.logical_and(keep, mask_mod(b, h, rows, cols, *aux))
            s = jnp.where(keep, s, MASK_VALUE)
        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_curr = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp2((m_prev - m_curr) * c)
        pmat = jnp.exp2((s - m_curr) * c)
        if masked:
            pmat = jnp.where(keep, pmat, 0.0)
        l_curr = l_prev * alpha + jnp.sum(pmat, axis=1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_curr, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_curr, l_ref.shape)
        pv = jax.lax.dot_general(
            pmat.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(is_full)
    def _full():
        _update(masked=False)

    @pl.when(is_part)
    def _part():
        _update(masked=True)

    @pl.when(ki == nk - 1)
    def _finalize():
        l_final = l_ref[:, :1]
        m_final = m_ref[:, :1]
        empty = l_final == 0.0
        l_safe = jnp.where(empty, 1.0, l_final)
        o_ref[0, 0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        m_nat = m_final / LOG2E if folded else m_final
        lse = jnp.where(empty, jnp.inf, m_nat + jnp.log(l_safe))
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])




# Scheduled-grid forward flags (the BlockMask flattened into tile tables)
_FX_FIRST, _FX_LAST, _FX_PART, _FX_EMPTY = 1, 2, 4, 8


def _flex_schedule(mask: "BlockMask", nq: int, nk: int):
    """Flatten the per-(b, h, q-block) kv-block lists into (b, h, T) tile
    tables (block index, q block, flags) walked by a flat sequential grid
    — the same zero-wasted-ticks scheduling as `flash_fwd._build_schedule`
    (the rectangular grid paid a predicated no-op tick for every
    unlisted kv block: ~2x on causal block masks).  T = nq*nk (static
    worst case); the tail is EMPTY-padded and carries the last valid
    (qi, blk) so no fresh DMA or out-block transition happens."""
    n_full = mask.full_kv_num  # (b, h, nq)
    n_part = mask.kv_num
    bq_, hq_ = n_full.shape[:2]
    Lf = mask.full_kv_idx.shape[-1]
    Lp = mask.kv_idx.shape[-1]
    W = Lf + Lp
    n_tot = n_full + n_part

    jf = jnp.arange(Lf, dtype=jnp.int32)
    jp = jnp.arange(Lp, dtype=jnp.int32)
    valid_f = jf < n_full[..., None]
    valid_p = jp < n_part[..., None]
    blk = jnp.concatenate([mask.full_kv_idx, mask.kv_idx], axis=-1)
    valid = jnp.concatenate([valid_f, valid_p], axis=-1)  # (b,h,nq,W)
    part = jnp.concatenate(
        [jnp.zeros_like(valid_f), jnp.ones_like(valid_p)], axis=-1)
    # position within the (full ++ partial) run
    j_run = jnp.concatenate(
        [jnp.broadcast_to(jf, valid_f.shape),
         n_full[..., None] + jp], axis=-1)
    first = valid & (j_run == 0)
    last = valid & (j_run == n_tot[..., None] - 1)
    # q blocks with no listed kv block still need a finalize tick
    # (zero output, +inf lse)
    force = (n_tot == 0)[..., None] & (
        jnp.arange(W, dtype=jnp.int32) == 0)
    valid = valid | force
    flags = (first * _FX_FIRST + last * _FX_LAST + part * _FX_PART
             ).astype(jnp.int32)
    flags = jnp.where(force, _FX_FIRST | _FX_LAST | _FX_EMPTY, flags)
    blk = jnp.where(force, 0, blk)

    T = nq * nk
    qi_grid = jnp.broadcast_to(
        jnp.arange(nq, dtype=jnp.int32)[:, None], (nq, W))
    flat_pos = (qi_grid * W
                + jnp.arange(W, dtype=jnp.int32)[None, :]).reshape(-1)
    key = jnp.where(
        valid.reshape(*valid.shape[:2], -1), flat_pos, jnp.int32(nq * W))
    order = jnp.argsort(key, axis=-1)[..., :T]  # (b,h,T)
    okey = jnp.take_along_axis(key, order, axis=-1)
    is_real = okey < nq * W

    def gather(x):
        return jnp.take_along_axis(
            x.reshape(*x.shape[:2], -1), order, axis=-1)

    qi_tab = jnp.where(is_real, okey // W, 0)
    blk_tab = jnp.where(is_real, gather(blk), 0)
    fl_tab = jnp.where(is_real, gather(flags), jnp.int32(_FX_EMPTY))
    # pad tail carries the last real (qi, blk)
    idx = jax.lax.cummax(
        jnp.where(is_real,
                  jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32),
                                   is_real.shape), -1),
        axis=is_real.ndim - 1)
    idx = jnp.maximum(idx, 0)
    qi_tab = jnp.take_along_axis(qi_tab, idx, axis=-1).astype(jnp.int32)
    blk_tab = jnp.take_along_axis(blk_tab, idx, axis=-1).astype(jnp.int32)
    return qi_tab, blk_tab, fl_tab.astype(jnp.int32)


def _flex_fwd_sched_kernel(
    scale, score_mod, mask_mod, g, bq, bk, sk_real, has_aux, has_bias,
    folded, qi_ref, blk_ref, fl_ref,
    *refs,
):
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    refs = refs[3:]
    if has_aux:
        qa_ref, ka_ref = refs[:2]
        refs = refs[2:]
    else:
        qa_ref = ka_ref = None
    bias_ref = refs.pop(0) if has_bias else None
    o_ref, lse_ref, acc_ref, m_ref, l_ref = refs
    b = pl.program_id(0)
    h = pl.program_id(1)
    t = pl.program_id(2)
    qi = qi_ref[b, h, t]
    kv_blk = blk_ref[b, h, t]
    fl = fl_ref[b, h, t]
    first = (fl & _FX_FIRST) != 0
    last = (fl & _FX_LAST) != 0
    partial = (fl & _FX_PART) != 0
    empty = (fl & _FX_EMPTY) != 0
    aux = _aux_args(has_aux, qa_ref, ka_ref, bq, bk)
    c = 1.0 if folded else LOG2E

    @pl.when(first)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def _update(masked):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if not folded:
            s = s * scale
        if has_bias:
            s = s + bias_ref[0, 0].astype(jnp.float32)
        rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = kv_blk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        if score_mod is not None:
            s = score_mod(s, b, h, rows, cols, *aux)
        if masked:
            keep = cols < sk_real
            if mask_mod is not None:
                keep = jnp.logical_and(keep, mask_mod(b, h, rows, cols, *aux))
            s = jnp.where(keep, s, MASK_VALUE)
        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_curr = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp2((m_prev - m_curr) * c)
        pmat = jnp.exp2((s - m_curr) * c)
        if masked:
            pmat = jnp.where(keep, pmat, 0.0)
        l_curr = l_prev * alpha + jnp.sum(pmat, axis=1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_curr, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_curr, l_ref.shape)
        pv = jax.lax.dot_general(
            pmat.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(jnp.logical_and(jnp.logical_not(empty),
                             jnp.logical_not(partial)))
    def _full():
        _update(masked=False)

    @pl.when(jnp.logical_and(jnp.logical_not(empty), partial))
    def _part():
        _update(masked=True)

    @pl.when(last)
    def _finalize():
        l_final = l_ref[:, :1]
        m_final = m_ref[:, :1]
        zero = l_final == 0.0
        l_safe = jnp.where(zero, 1.0, l_final)
        o_ref[0, 0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        m_nat = m_final / LOG2E if folded else m_final
        lse = jnp.where(zero, jnp.inf, m_nat + jnp.log(l_safe))
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _flex_fwd_hb_kernel(
    scale, score_mod, mask_mod, g, bq, bk, sk_real, has_aux, has_bias,
    folded, HB, hbk, bias_b1, bias_h1, qi_ref, blk_ref, fl_ref,
    *refs,
):
    """Head-blocked scheduled flex forward (head-invariant block masks).

    One grid tick processes `HB` heads against a shared K/V tile: the
    (head) loop software-pipelines exactly as `flash_fwd._fwd_sched_kernel`
    — the QK matmul of head hh+1 overlaps the softmax/PV of head hh, so
    the MXU no longer stalls on the single-head serial chain (measured
    ~2.8x per computed block in round 2).  The in-kernel `mask_mod` is
    evaluated once per tick (h = first head of the block — the
    head_invariant contract) and shared by all heads; `score_mod` still
    runs per head with its own h index."""
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    refs = refs[3:]
    if has_aux:
        qa_ref, ka_ref = refs[:2]
        refs = refs[2:]
    else:
        qa_ref = ka_ref = None
    bias_ref = refs.pop(0) if has_bias else None
    o_ref, lse_ref, acc_ref, m_ref, l_ref = refs
    b = pl.program_id(0)
    hb = pl.program_id(1)
    t = pl.program_id(2)
    hq0 = hb * HB
    qi = qi_ref[b, t]
    kv_blk = blk_ref[b, t]
    fl = fl_ref[b, t]
    first = (fl & _FX_FIRST) != 0
    last = (fl & _FX_LAST) != 0
    partial = (fl & _FX_PART) != 0
    empty = (fl & _FX_EMPTY) != 0
    aux = _aux_args(has_aux, qa_ref, ka_ref, bq, bk)
    c = 1.0 if folded else LOG2E
    # With no score_mod the mask is applied as ONE additive f32 bias per
    # head (built once per tick, head-invariant): masked scores carry
    # _FX_BIAS, far below the running max's MASK_VALUE floor, so
    # exp2((s - m) * c) underflows to exactly 0 and the probability pass
    # needs no select (same trick as flash_fwd._fwd_sched_kernel).  With a
    # score_mod the select form is kept: the mod is an arbitrary callable
    # and masked positions must be clean even if it returns nan/inf there.
    bias_mask = score_mod is None

    @pl.when(first)
    def _init():
        m_ref[...] = jnp.full_like(
            m_ref, MASK_VALUE if bias_mask else -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def build_keep():
        rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = kv_blk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        keep = cols < sk_real
        if mask_mod is not None:
            keep = jnp.logical_and(keep, mask_mod(b, hq0, rows, cols, *aux))
        if bias_mask:
            return jnp.where(keep, 0.0, _FX_BIAS).astype(jnp.float32)
        return keep

    def qk_stage(hh, keep):
        q = q_ref[0, hh]
        k = k_ref[0, 0 if hbk == 1 else hh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if not folded:
            s = s * scale
        if has_bias:
            s = s + bias_ref[0, 0 if bias_h1 else hh].astype(jnp.float32)
        if score_mod is not None:
            rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            cols = kv_blk * bk + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 1)
            s = score_mod(s, b, hq0 + hh, rows, cols, *aux)
        if keep is not None:
            s = s + keep if bias_mask else jnp.where(keep, s, MASK_VALUE)
        return s

    def smpv_stage(hh, s, keep):
        v = v_ref[0, 0 if hbk == 1 else hh]
        m_prev = m_ref[hh, :, :1]
        l_prev = l_ref[hh, :, :1]
        m_curr = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp2((m_prev - m_curr) * c)
        pmat = jnp.exp2((s - m_curr) * c)
        if keep is not None and not bias_mask:
            pmat = jnp.where(keep, pmat, 0.0)
        l_curr = l_prev * alpha + jnp.sum(pmat, axis=1, keepdims=True)
        m_ref[hh] = jnp.broadcast_to(m_curr, m_ref.shape[1:])
        l_ref[hh] = jnp.broadcast_to(l_curr, l_ref.shape[1:])
        pv = jax.lax.dot_general(
            pmat.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[hh] = acc_ref[hh] * alpha + pv

    def run(masked):
        keep = build_keep() if masked else None
        prev = None
        for hh in range(HB):
            s = qk_stage(hh, keep)
            if prev is not None:
                smpv_stage(*prev)
            prev = (hh, s, keep)
        smpv_stage(*prev)

    @pl.when(jnp.logical_and(jnp.logical_not(empty),
                             jnp.logical_not(partial)))
    def _full():
        run(masked=False)

    @pl.when(jnp.logical_and(jnp.logical_not(empty), partial))
    def _part():
        run(masked=True)

    @pl.when(last)
    def _finalize():
        for hh in range(HB):
            l_final = l_ref[hh, :, :1]
            m_final = m_ref[hh, :, :1]
            zero = l_final == 0.0
            l_safe = jnp.where(zero, 1.0, l_final)
            o_ref[0, hh] = (acc_ref[hh] / l_safe).astype(o_ref.dtype)
            m_nat = m_final / LOG2E if folded else m_final
            lse = jnp.where(zero, jnp.inf, m_nat + jnp.log(l_safe))
            lse_ref[0, hh] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _prep_aux(aux, b, s_p, dtype_fallback=jnp.int32):
    """(b, s) aux -> (b, s_p, STAT_LANES) lane-replicated stream."""
    if aux is None:
        return None
    aux = jnp.asarray(aux)
    if aux.shape[1] != s_p:
        aux = jnp.pad(aux, ((0, 0), (0, s_p - aux.shape[1])))
    return jnp.broadcast_to(aux[..., None], (*aux.shape, STAT_LANES))


def _prep_aux_kv(aux, b, s_p, bk):
    """(b, s) kv aux -> (b, nk, 8, bk) row blocks (lane-major, so the
    kernel reads a ready (1, bk) row with no relayout)."""
    if aux is None:
        return None
    aux = jnp.asarray(aux)
    if aux.shape[1] != s_p:
        aux = jnp.pad(aux, ((0, 0), (0, s_p - aux.shape[1])))
    rows = aux.reshape(b, s_p // bk, 1, bk)
    return jnp.broadcast_to(rows, (b, s_p // bk, 8, bk))


def _prep_bias(bias, b, h, sq_p, sk_p):
    """Pad an (b|1, h|1, sq, sk) additive bias to block-multiple dims."""
    bias = jnp.asarray(bias, jnp.float32)
    pads = [(0, 0), (0, 0),
            (0, sq_p - bias.shape[2]), (0, sk_p - bias.shape[3])]
    if any(p_[1] for p_ in pads):
        bias = jnp.pad(bias, pads)
    return bias


def _flex_fwd_hb(
    q, k, v, scale, score_mod, mask_mod, g, bq, bk, sq, sk,
    sq_p, sk_p, qa, ka, bias, has_aux, qi_tab, blk_tab, fl_tab, T, hb,
):
    """Head-blocked scheduled forward launch (see _flex_fwd_hb_kernel).
    Tables are (b, T) — shared by every head."""
    b, h, _, d = q.shape
    hbk = hb if g == 1 else 1

    def q_map(b_, hb_, t, qi_r, blk_r, fl_r):
        return (b_, hb_, qi_r[b_, t], 0)

    def kv_map(b_, hb_, t, qi_r, blk_r, fl_r):
        if g == 1:
            return (b_, hb_, blk_r[b_, t], 0)
        return (b_, (hb_ * hb) // g, blk_r[b_, t], 0)

    in_specs = [
        pl.BlockSpec((1, hb, bq, d), q_map),
        pl.BlockSpec((1, hbk, bk, d), kv_map),
        pl.BlockSpec((1, hbk, bk, d), kv_map),
    ]
    inputs = [q, k, v]
    if has_aux:
        in_specs.append(pl.BlockSpec(
            (1, bq, STAT_LANES),
            lambda b_, hb_, t, qi_r, *r: (b_, qi_r[b_, t], 0)))
        in_specs.append(pl.BlockSpec(
            (1, 1, 8, bk),
            lambda b_, hb_, t, qi_r, blk_r, fl_r: (b_, blk_r[b_, t], 0, 0),
        ))
        inputs += [qa, ka]
    has_bias = bias is not None
    bias_b1 = bias_h1 = False
    if has_bias:
        bias = _prep_bias(bias, b, h, sq_p, sk_p)
        bb, bh_ = bias.shape[:2]
        bias_b1, bias_h1 = bb == 1, bh_ == 1
        in_specs.append(pl.BlockSpec(
            (1, 1 if bias_h1 else hb, bq, bk),
            lambda b_, hb_, t, qi_r, blk_r, fl_r: (
                0 if bias_b1 else b_, 0 if bias_h1 else hb_,
                qi_r[b_, t], blk_r[b_, t]),
        ))
        inputs.append(bias)

    folded = score_mod is None and not has_bias
    if folded:
        inputs[0] = (inputs[0].astype(jnp.float32) * (scale * LOG2E)
                     ).astype(inputs[0].dtype)

    kernel = functools.partial(
        _flex_fwd_hb_kernel, scale, score_mod, mask_mod, g, bq, bk, sk,
        has_aux, has_bias, folded, hb, hbk, bias_b1, bias_h1,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, h // hb, T),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, hb, bq, d), q_map),
                pl.BlockSpec((1, hb, bq, LANES), q_map),
            ],
            scratch_shapes=[
                pltpu.VMEM((hb, bq, d), jnp.float32),
                pltpu.VMEM((hb, bq, LANES), jnp.float32),
                pltpu.VMEM((hb, bq, LANES), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq_p, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=use_interpret(),
    )(qi_tab, blk_tab, fl_tab, *inputs)
    return o[:, :, :sq, :], lse[:, :, :sq, 0]


def _flex_fwd(
    q, k, v, mask: BlockMask, score_mod, mask_mod, scale,
    q_aux=None, kv_aux=None, bias=None, block_h=None,
):
    b, h, sq, d = q.shape
    _, hk, sk, _ = k.shape
    g = h // hk
    bq, bk = mask.block_q, mask.block_k
    sq_p = round_up(max(sq, bq), bq)
    sk_p = round_up(max(sk, bk), bk)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    nq = sq_p // bq
    nk = sk_p // bk
    has_aux = q_aux is not None or kv_aux is not None
    qa = _prep_aux(q_aux, b, sq_p)
    ka = _prep_aux_kv(kv_aux, b, sk_p, bk)
    if has_aux:
        if qa is None:
            qa = jnp.zeros((b, sq_p, STAT_LANES), jnp.int32)
        if ka is None:
            ka = jnp.zeros((b, sk_p // bk, 8, bk), jnp.int32)

    # scheduled grid: the BlockMask flattened into (b, h, T) tile tables
    qi_tab, blk_tab, fl_tab = _flex_schedule(mask, nq, nk)
    T = int(qi_tab.shape[-1])

    # Head-invariant block structure (tables carry a broadcast head dim of
    # 1) unlocks the head-blocked kernel: HB independent softmax chains
    # per tick share one K/V tile and software-pipeline against each other.
    head_invariant = qi_tab.shape[1] == 1
    hb_limit = h if g == 1 else g  # a head block must live in one kv group
    # v5e sweep (seq8k causal/sliding, 1024^2 tiles): bh4 is the optimum
    # (136/116 TF/s-computed vs 61/28 at bh8 — VMEM pressure collapses
    # the wider block), matching the builtin scheduled kernel's default.
    # At head dims above 192 even bh4 spills (69 vs 153 TF/s-computed at
    # d256/bh2) — same cliff as the builtin grid.
    hb_default = 4 if d <= 192 else 2
    hb = min(block_h if block_h is not None else hb_default, hb_limit)
    while hb_limit % hb:
        hb -= 1
    if head_invariant and hb > 1:
        return _flex_fwd_hb(
            q, k, v, scale, score_mod, mask_mod, g, bq, bk, sq, sk,
            sq_p, sk_p, qa, ka, bias, has_aux,
            qi_tab[:, 0], blk_tab[:, 0], fl_tab[:, 0], T, hb,
        )
    if head_invariant:
        qi_tab, blk_tab, fl_tab = (
            jnp.broadcast_to(x, (b, h, T)) for x in (qi_tab, blk_tab, fl_tab)
        )

    def q_map(b_, h_, t, qi_r, blk_r, fl_r):
        return (b_, h_, qi_r[b_, h_, t], 0)

    def kv_map(b_, h_, t, qi_r, blk_r, fl_r):
        return (b_, h_ // g, blk_r[b_, h_, t], 0)

    in_specs = [
        pl.BlockSpec((1, 1, bq, d), q_map),
        pl.BlockSpec((1, 1, bk, d), kv_map),
        pl.BlockSpec((1, 1, bk, d), kv_map),
    ]
    inputs = [q, k, v]
    if has_aux:
        in_specs.append(pl.BlockSpec(
            (1, bq, STAT_LANES),
            lambda b_, h_, t, qi_r, *r: (b_, qi_r[b_, h_, t], 0)))
        in_specs.append(pl.BlockSpec(
            (1, 1, 8, bk),
            lambda b_, h_, t, qi_r, blk_r, fl_r: (
                b_, blk_r[b_, h_, t], 0, 0),
        ))
        inputs += [qa, ka]
    has_bias = bias is not None
    if has_bias:
        bias = _prep_bias(bias, b, h, sq_p, sk_p)
        bb, bh_ = bias.shape[:2]
        in_specs.append(pl.BlockSpec(
            (1, 1, bq, bk),
            lambda b_, h_, t, qi_r, blk_r, fl_r, bb=bb, bh_=bh_: (
                jnp.minimum(b_, bb - 1), jnp.minimum(h_, bh_ - 1),
                qi_r[b_, h_, t], blk_r[b_, h_, t]),
        ))
        inputs.append(bias)

    folded = score_mod is None and not has_bias
    if folded:
        inputs[0] = (inputs[0].astype(jnp.float32) * (scale * LOG2E)
                     ).astype(inputs[0].dtype)

    kernel = functools.partial(
        _flex_fwd_sched_kernel, scale, score_mod, mask_mod, g, bq, bk, sk,
        has_aux, has_bias, folded,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, h, T),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, bq, d), q_map),
                pl.BlockSpec((1, 1, bq, LANES), q_map),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, d), jnp.float32),
                pltpu.VMEM((bq, LANES), jnp.float32),
                pltpu.VMEM((bq, LANES), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq_p, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=use_interpret(),
    )(qi_tab, blk_tab, fl_tab, *inputs)
    return o[:, :, :sq, :], lse[:, :, :sq, 0]


# ---------------------------------------------------------------------------
# Backward kernels (dQ: per q-block over kv list; dKV: per kv-block over
# q list).  Arbitrary score mods differentiate via in-kernel jax.vjp.
# ---------------------------------------------------------------------------


def _mod_score(scale, score_mod, s, b, h, rows, cols, aux, bias_blk=None):
    s = s * scale
    if bias_blk is not None:
        s = s + bias_blk
    if score_mod is not None:
        s = score_mod(s, b, h, rows, cols, *aux)
    return s


def _flex_bwd_dq_kernel(
    scale, score_mod, mask_mod, g, bq, bk, sk_real, has_aux, has_bias,
    kvn_ref, kvi_ref, fn_ref, fi_ref,
    *refs,
):
    refs = list(refs)
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = refs[:6]
    refs = refs[6:]
    if has_aux:
        qa_ref, ka_ref = refs[:2]
        refs = refs[2:]
    else:
        qa_ref = ka_ref = None
    bias_ref = refs.pop(0) if has_bias else None
    if has_bias:
        dq_ref, dbias_ref, dq_acc = refs
    else:
        dq_ref, dq_acc = refs
        dbias_ref = None
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)
    aux = _aux_args(has_aux, qa_ref, ka_ref, bq, bk)

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    n_full = fn_ref[b, h, qi]
    n_part = kvn_ref[b, h, qi]
    is_full = ki < n_full
    is_part = jnp.logical_and(ki >= n_full, ki < n_full + n_part)
    kis = jnp.minimum(ki, jnp.maximum(n_full + n_part - 1, 0))
    kv_blk = jnp.where(
        kis < n_full, fi_ref[b, h, qi, kis],
        kvi_ref[b, h, qi, jnp.maximum(kis - n_full, 0)],
    )

    def _compute(masked):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse_row = lse_ref[0, 0][:, :1]
        delta_row = delta_ref[0, 0][:, :1]
        rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = kv_blk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s_raw = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if has_bias:
            bias_blk = bias_ref[0, 0].astype(jnp.float32)
            s, mod_vjp = jax.vjp(
                lambda t, bb: _mod_score(scale, score_mod, t, b, h, rows,
                                         cols, aux, bb),
                s_raw, bias_blk,
            )
        else:
            s, mod_vjp = jax.vjp(
                lambda t: _mod_score(scale, score_mod, t, b, h, rows, cols,
                                     aux, None),
                s_raw,
            )
        if masked:
            keep = cols < sk_real
            if mask_mod is not None:
                keep = jnp.logical_and(keep, mask_mod(b, h, rows, cols, *aux))
            s = jnp.where(keep, s, MASK_VALUE)
        pmat = jnp.exp2((s - lse_row) * LOG2E)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = pmat * (dp - delta_row)
        if has_bias:
            ds, dbias_blk = mod_vjp(ds)
            dbias_ref[0, 0] = dbias_blk
        else:
            (ds,) = mod_vjp(ds)
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(is_full)
    def _full():
        _compute(masked=False)

    @pl.when(is_part)
    def _part():
        _compute(masked=True)

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def _flex_bwd_dkv_kernel(
    scale, score_mod, mask_mod, g, bq, bk, sk_real, has_aux, has_bias,
    qn_ref, qi_ref, fqn_ref, fqi_ref,
    *refs,
):
    refs = list(refs)
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = refs[:6]
    refs = refs[6:]
    if has_aux:
        qa_ref, ka_ref = refs[:2]
        refs = refs[2:]
    else:
        qa_ref = ka_ref = None
    bias_ref = refs.pop(0) if has_bias else None
    dk_ref, dv_ref, dk_acc, dv_acc = refs
    b = pl.program_id(0)
    hk_i = pl.program_id(1)
    ki = pl.program_id(2)
    t = pl.program_id(3)
    nt = pl.num_programs(3)
    nqg = nt // g if g else nt
    aux = _aux_args(has_aux, qa_ref, ka_ref, bq, bk)

    @pl.when(t == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    ti = t // g
    gi = t % g
    h = hk_i * g + gi
    n_full = fqn_ref[b, h, ki]
    n_part = qn_ref[b, h, ki]
    is_full = ti < n_full
    is_part = jnp.logical_and(ti >= n_full, ti < n_full + n_part)
    tis = jnp.minimum(ti, jnp.maximum(n_full + n_part - 1, 0))
    q_blk = jnp.where(
        tis < n_full, fqi_ref[b, h, ki, tis],
        qi_ref[b, h, ki, jnp.maximum(tis - n_full, 0)],
    )
    del nqg

    def _compute(masked):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse_row = lse_ref[0, 0][:, :1]
        delta_row = delta_ref[0, 0][:, :1]
        rows = q_blk * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s_raw = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        bias_blk = bias_ref[0, 0].astype(jnp.float32) if has_bias else None
        s, mod_vjp = jax.vjp(
            lambda t_: _mod_score(scale, score_mod, t_, b, h, rows, cols,
                                  aux, bias_blk),
            s_raw,
        )
        if masked:
            keep = cols < sk_real
            if mask_mod is not None:
                keep = jnp.logical_and(keep, mask_mod(b, h, rows, cols, *aux))
            s = jnp.where(keep, s, MASK_VALUE)
        pmat = jnp.exp2((s - lse_row) * LOG2E)
        dv_acc[...] += jax.lax.dot_general(
            pmat.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = pmat * (dp - delta_row)
        (ds,) = mod_vjp(ds)
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(is_full)
    def _full():
        _compute(masked=False)

    @pl.when(is_part)
    def _part():
        _compute(masked=True)

    @pl.when(t == nt - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _flex_bwd(
    do, q, k, v, o, lse, mask: BlockMask, score_mod, mask_mod, scale,
    q_aux=None, kv_aux=None, bias=None,
):
    b, h, sq, d = q.shape
    _, hk, sk, _ = k.shape
    g = h // hk
    bq, bk = mask.block_q, mask.block_k
    if mask.kv_num.shape[1] == 1 and h > 1:
        # head-invariant tables (broadcast head dim) — the backward grids
        # index per (b, h); expand the small int tables
        mask = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (x.shape[0], h, *x.shape[2:])),
            mask)
    sq_p = round_up(max(sq, bq), bq)
    sk_p = round_up(max(sk, bk), bk)
    nq, nk = sq_p // bq, sk_p // bk
    has_aux = q_aux is not None or kv_aux is not None
    qa = _prep_aux(q_aux, b, sq_p)
    ka = _prep_aux_kv(kv_aux, b, sk_p, bk)
    if has_aux:
        if qa is None:
            qa = jnp.zeros((b, sq_p, STAT_LANES), jnp.int32)
        if ka is None:
            ka = jnp.zeros((b, sk_p // bk, 8, bk), jnp.int32)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    def pad_s(x, target, fill=0.0):
        if x.shape[2] == target:
            return x
        padw = [(0, 0)] * x.ndim
        padw[2] = (0, target - x.shape[2])
        return jnp.pad(x, padw, constant_values=fill)

    q, do, o = (pad_s(x, sq_p) for x in (q, do, o))
    k, v = (pad_s(x, sk_p) for x in (k, v))
    lse = pad_s(lse, sq_p, fill=jnp.inf)
    delta = pad_s(delta, sq_p)
    lse_r = jnp.broadcast_to(lse[..., None], (*lse.shape, STAT_LANES))
    delta_r = jnp.broadcast_to(delta[..., None], (*delta.shape, STAT_LANES))

    # ---- dQ: grid (b, h, nq, nk) over the kv block lists ----
    def q_map(b_, h_, qi, ki, *refs):
        return (b_, h_, qi, 0)

    def kv_blk_of(b_, h_, qi, ki, kvn_ref, kvi_ref, fn_ref, fi_ref):
        n_full = fn_ref[b_, h_, qi]
        n_part = kvn_ref[b_, h_, qi]
        kis = jnp.minimum(ki, jnp.maximum(n_full + n_part - 1, 0))
        return jnp.where(
            kis < n_full, fi_ref[b_, h_, qi, kis],
            kvi_ref[b_, h_, qi, jnp.maximum(kis - n_full, 0)],
        )

    def kv_map(b_, h_, qi, ki, *refs):
        return (b_, h_ // g, kv_blk_of(b_, h_, qi, ki, *refs), 0)

    in_specs = [
        pl.BlockSpec((1, 1, bq, d), q_map),
        pl.BlockSpec((1, 1, bk, d), kv_map),
        pl.BlockSpec((1, 1, bk, d), kv_map),
        pl.BlockSpec((1, 1, bq, d), q_map),
        pl.BlockSpec((1, 1, bq, STAT_LANES), q_map),
        pl.BlockSpec((1, 1, bq, STAT_LANES), q_map),
    ]
    inputs = [q, k, v, do, lse_r, delta_r]
    has_bias = bias is not None
    if has_bias:
        bias = _prep_bias(bias, b, h, sq_p, sk_p)
        bb, bh_ = bias.shape[:2]
    if has_aux:
        in_specs.append(pl.BlockSpec(
            (1, bq, STAT_LANES), lambda b_, h_, qi, ki, *r: (b_, qi, 0)))
        in_specs.append(pl.BlockSpec(
            (1, 1, 8, bk),
            lambda b_, h_, qi, ki, *r: (
                b_, kv_blk_of(b_, h_, qi, ki, *r), 0, 0),
        ))
        inputs += [qa, ka]
    if has_bias:
        in_specs.append(pl.BlockSpec(
            (1, 1, bq, bk),
            lambda b_, h_, qi, ki, *r: (
                jnp.minimum(b_, bb - 1), jnp.minimum(h_, bh_ - 1), qi,
                kv_blk_of(b_, h_, qi, ki, *r)),
        ))
        inputs.append(bias)

    out_specs_dq = pl.BlockSpec((1, 1, bq, d), q_map)
    out_shape_dq = jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype)
    if has_bias:
        def dbias_map(b_, h_, qi, ki, *refs):
            return (b_, h_, qi, kv_blk_of(b_, h_, qi, ki, *refs))

        out_specs_dq = [out_specs_dq,
                        pl.BlockSpec((1, 1, bq, bk), dbias_map)]
        out_shape_dq = [out_shape_dq,
                        jax.ShapeDtypeStruct((b, h, sq_p, sk_p),
                                             jnp.float32)]
    dq_out = pl.pallas_call(
        functools.partial(
            _flex_bwd_dq_kernel, scale, score_mod, mask_mod, g, bq, bk, sk,
            has_aux, has_bias,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b, h, nq, nk),
            in_specs=in_specs,
            out_specs=out_specs_dq,
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        ),
        out_shape=out_shape_dq,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=use_interpret(),
    )(mask.kv_num, mask.kv_idx, mask.full_kv_num, mask.full_kv_idx, *inputs)
    if has_bias:
        dq, dbias_full = dq_out
        # blocks never visited were never written: zero them via the
        # block lists (their true dbias is 0 — p vanishes there)
        L = mask.kv_idx.shape[-1]
        Lf = mask.full_kv_idx.shape[-1]
        valid_p = jnp.arange(L) < mask.kv_num[..., None]
        valid_f = jnp.arange(Lf) < mask.full_kv_num[..., None]
        vis = jnp.zeros((b, h, nq, nk), bool)
        vis = vis | jnp.any(
            jax.nn.one_hot(mask.kv_idx, nk, dtype=bool)
            & valid_p[..., None], axis=-2)
        vis = vis | jnp.any(
            jax.nn.one_hot(mask.full_kv_idx, nk, dtype=bool)
            & valid_f[..., None], axis=-2)
        vis_el = jnp.repeat(jnp.repeat(vis, bq, axis=2), bk, axis=3)
        dbias_full = jnp.where(vis_el, dbias_full, 0.0)
    else:
        dq = dq_out
        dbias_full = None

    # ---- dKV: grid (b, hk, nk, nq * g) over the q block lists ----
    def q_blk_of(b_, hk_, ki, t, qn_ref, qi_ref, fqn_ref, fqi_ref):
        ti = t // g
        gi = t % g
        h_ = hk_ * g + gi
        n_full = fqn_ref[b_, h_, ki]
        n_part = qn_ref[b_, h_, ki]
        tis = jnp.minimum(ti, jnp.maximum(n_full + n_part - 1, 0))
        blk = jnp.where(
            tis < n_full, fqi_ref[b_, h_, ki, tis],
            qi_ref[b_, h_, ki, jnp.maximum(tis - n_full, 0)],
        )
        return h_, blk

    def qhead_map(b_, hk_, ki, t, *refs):
        h_, blk = q_blk_of(b_, hk_, ki, t, *refs)
        return (b_, h_, blk, 0)

    def kvb_map(b_, hk_, ki, t, *refs):
        return (b_, hk_, ki, 0)

    in_specs2 = [
        pl.BlockSpec((1, 1, bq, d), qhead_map),
        pl.BlockSpec((1, 1, bk, d), kvb_map),
        pl.BlockSpec((1, 1, bk, d), kvb_map),
        pl.BlockSpec((1, 1, bq, d), qhead_map),
        pl.BlockSpec((1, 1, bq, STAT_LANES), qhead_map),
        pl.BlockSpec((1, 1, bq, STAT_LANES), qhead_map),
    ]
    inputs2 = [q, k, v, do, lse_r, delta_r]
    if has_aux:
        in_specs2.append(pl.BlockSpec(
            (1, bq, STAT_LANES),
            lambda b_, hk_, ki, t, *r: (b_, q_blk_of(b_, hk_, ki, t, *r)[1], 0),
        ))
        in_specs2.append(pl.BlockSpec(
            (1, 1, 8, bk), lambda b_, hk_, ki, t, *r: (b_, ki, 0, 0)))
        inputs2 += [qa, ka]
    if has_bias:
        def bias_map2(b_, hk_, ki, t, *r):
            h_, blk = q_blk_of(b_, hk_, ki, t, *r)
            return (jnp.minimum(b_, bb - 1), jnp.minimum(h_, bh_ - 1),
                    blk, ki)
        in_specs2.append(pl.BlockSpec((1, 1, bq, bk), bias_map2))
        inputs2.append(bias)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flex_bwd_dkv_kernel, scale, score_mod, mask_mod, g, bq, bk, sk,
            has_aux, has_bias,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b, hk, nk, nq * g),
            in_specs=in_specs2,
            out_specs=[
                pl.BlockSpec((1, 1, bk, d), kvb_map),
                pl.BlockSpec((1, 1, bk, d), kvb_map),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk, d), jnp.float32),
                pltpu.VMEM((bk, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, hk, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b, hk, sk_p, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=use_interpret(),
    )(mask.q_num, mask.q_idx, mask.full_q_num, mask.full_q_idx, *inputs2)
    dbias = None
    if has_bias:
        dbias = dbias_full[:, :, :sq, :sk]
        # reduce over broadcast dims back to the bias's own shape
        if bb == 1:
            dbias = jnp.sum(dbias, axis=0, keepdims=True)
        if bh_ == 1:
            dbias = jnp.sum(dbias, axis=1, keepdims=True)
    return dq[:, :, :sq, :], dk[:, :, :sk, :], dv[:, :, :sk, :], dbias


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def flex_attention(
    q,
    k,
    v,
    *,
    score_mod: Optional[ScoreMod] = None,
    mask_mod: Optional[MaskMod] = None,
    block_mask: Optional[BlockMask] = None,
    softmax_scale: Optional[float] = None,
    q_aux=None,
    kv_aux=None,
    attn_bias=None,
    block_q: int | None = None,
    block_k: int | None = None,
    block_h: Optional[int] = None,
    head_invariant: bool = False,
    return_lse: bool = False,
):
    """Programmable flash attention, (b, s, h, d) layout.

    `score_mod(score, b, h, q_idx, kv_idx)` rewrites scaled attention
    scores elementwise; `mask_mod(b, h, q_idx, kv_idx) -> bool` keeps
    (True) or masks (False) positions.  Pass a `block_mask` from
    `create_block_mask` to skip masked-out blocks entirely (block
    sparsity); otherwise every block is visited and `mask_mod` is applied
    in-kernel.  Fully differentiable, including through arbitrary
    `score_mod`s (in-kernel jax.vjp).

    Mods that read per-position data (document ids, per-token biases —
    the reference's `aux_tensors`, `cute/interface.py:114`) take it via
    `q_aux`/`kv_aux`: (b, seqlen) arrays streamed to the kernel block-
    aligned; the mods then receive two extra arguments — the (block_q, 1)
    q-aux column and the (1, block_k) kv-aux row, e.g.
    ``lambda b, h, qi, ki, qa, ka: qa == ka`` for document masking.
    Gradients do not flow into aux arrays.

    `attn_bias`: additive (b|1, h|1, sq, sk) score bias streamed block-wise
    (the role of the legacy Triton FA's bias support,
    `flash_attn/flash_attn_triton.py`); applied after scaling, before the
    mods.  Fully differentiable: d(loss)/d(attn_bias) is computed by the
    backward (broadcast dims are sum-reduced), matching the Triton FA's
    dbias.

    `head_invariant=True` declares the `mask_mod` independent of `h`
    (see `create_block_mask`), enabling the head-blocked kernel even
    without a precomputed block mask.  `block_h` caps the heads per grid
    tick on that path (default 4 — the v5e optimum at 1024^2 tiles).
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    scale = float(softmax_scale)
    if block_mask is None:
        block_mask = _dense_block_mask(
            b, h, sq, sk,
            block_q or _default_flex_block(sq),
            block_k or _default_flex_block(sk),
            mask_mod is not None,
            head_invariant=head_invariant or mask_mod is None,
        )
    qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    has_qa = q_aux is not None
    has_ka = kv_aux is not None
    has_bias = attn_bias is not None
    aux_list = [x for x in (q_aux, kv_aux) if x is not None]
    if has_bias:
        aux_list.append(jnp.asarray(attn_bias))

    def unpack_aux(auxes):
        it = iter(auxes)
        return (next(it) if has_qa else None,
                next(it) if has_ka else None,
                next(it) if has_bias else None)

    @jax.custom_vjp
    def core(qt, kt, vt, bm, *auxes):
        qa, ka, bias = unpack_aux(auxes)
        return _flex_fwd(qt, kt, vt, bm, score_mod, mask_mod, scale,
                         q_aux=qa, kv_aux=ka, bias=bias, block_h=block_h)

    def core_fwd(qt, kt, vt, bm, *auxes):
        o, lse = core(qt, kt, vt, bm, *auxes)
        return (o, lse), (qt, kt, vt, o, lse, bm, auxes)

    def core_bwd(res, cts):
        import numpy as np

        do, _dlse = cts
        qt, kt, vt, o, lse, bm, auxes = res
        qa, ka, bias = unpack_aux(auxes)
        dq, dk, dv, dbias = _flex_bwd(
            do, qt, kt, vt, o, lse, bm, score_mod, mask_mod, scale,
            q_aux=qa, kv_aux=ka, bias=bias,
        )

        def zero_ct(x):
            if jnp.issubdtype(x.dtype, jnp.inexact):
                return jnp.zeros_like(x)
            return np.zeros(x.shape, jax.dtypes.float0)

        dbm = jax.tree_util.tree_map(zero_ct, bm)
        dauxes = [zero_ct(jnp.asarray(a)) for a in auxes]
        if has_bias and dbias is not None:
            # the bias rides last in aux_list; return its real gradient
            dauxes[-1] = dbias.astype(jnp.asarray(auxes[-1]).dtype)
        return (dq, dk, dv, dbm, *dauxes)

    core.defvjp(core_fwd, core_bwd)
    o, lse = core(qt, kt, vt, block_mask, *aux_list)
    o = jnp.swapaxes(o, 1, 2)
    if return_lse:
        return o, lse
    return o
