"""Packed (true-varlen) attention over cu_seqlens token streams.

The library's default varlen path re-gathers packed tokens into a padded
(batch, max_seqlen) layout (`interface.py` — cheap, fully general).  This
module is the *packed-native* alternative: tokens never leave the
(total_tokens, nheads, head_dim) stream — the role of the reference's
cu_seqlens pointer arithmetic (`csrc/flash_attn/src/block_info.h:13`,
FA3 `hopper/seqlen.h` SeqlenInfo) — built on the flex kernel:

* each token gets one int32 aux word packing (segment_id << 16 |
  position_from_sequence_END); the in-kernel mask is then pure vector
  compares: same segment, and `k_from_end >= q_from_end` IS bottom-right
  causal (col <= row + len_k - len_q), with sliding windows as
  `|k_from_end - q_from_end| <= window`.
* the block-sparse structure comes from *interval* logic on cu_seqlens at
  block granularity (O(nq*nk), no elementwise mask evaluation): a (q, kv)
  block pair is needed iff their segment ranges intersect, full iff both
  blocks lie in one segment with no mask cut.

Compute scales with total_tokens (cross-sequence blocks are skipped), not
batch * max_seqlen**2.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from flash_attn_tpu.kernels.block_sizes import cdiv, round_up
from flash_attn_tpu.kernels.flex import BlockMask, _pack_indices, flex_attention

_POS_BITS = 16
_POS_MASK = (1 << _POS_BITS) - 1


def _segment_aux(cu_seqlens, total, total_p):
    """(total_p,) int32: (segment << 16) | position_from_segment_end.

    Padding tokens get segment 0x7FFF (matches nothing real)."""
    idx = jnp.arange(total_p, dtype=jnp.int32)
    seg = jnp.searchsorted(cu_seqlens, idx, side="right").astype(jnp.int32) - 1
    nseq = cu_seqlens.shape[0] - 1
    seg = jnp.clip(seg, 0, nseq - 1)
    seq_end = cu_seqlens[seg + 1]
    from_end = jnp.clip(seq_end - 1 - idx, 0, _POS_MASK)
    aux = (seg << _POS_BITS) | from_end
    return jnp.where(idx < total, aux, jnp.int32(0x7FFF) << _POS_BITS)


def make_varlen_mask_mod(causal: bool, window_size=(-1, -1)):
    """mask_mod over the packed aux words (see module docstring)."""
    wl, wr = int(window_size[0]), int(window_size[1])

    def mod(b, h, q_idx, kv_idx, qa, ka):
        seg_q = jax.lax.shift_right_logical(qa, _POS_BITS)
        seg_k = jax.lax.shift_right_logical(ka, _POS_BITS)
        eq = (seg_q == seg_k) & (seg_q < 0x7FFF)
        pq = qa & _POS_MASK  # positions from the segment END
        pk = ka & _POS_MASK
        if causal or wr >= 0:
            w = 0 if causal else wr
            eq = eq & (pk >= pq - w)
        if wl >= 0:
            eq = eq & (pk <= pq + wl)
        return eq

    return mod


def varlen_block_mask(
    cu_seqlens_q, cu_seqlens_k, total_q_p, total_k_p, *,
    causal: bool, window_size=(-1, -1), block_q: int, block_k: int,
    nheads: int,
):
    """Block structure from interval logic on cu_seqlens (O(nq*nk))."""
    nq = total_q_p // block_q
    nk = total_k_p // block_k
    nseq = cu_seqlens_q.shape[0] - 1

    def seg_of(pos, cu):
        s = jnp.searchsorted(cu, pos, side="right").astype(jnp.int32) - 1
        return jnp.clip(s, 0, nseq - 1)

    q0 = jnp.arange(nq, dtype=jnp.int32) * block_q
    q1 = q0 + block_q - 1
    k0 = jnp.arange(nk, dtype=jnp.int32) * block_k
    k1 = k0 + block_k - 1
    total_q = cu_seqlens_q[-1]
    total_k = cu_seqlens_k[-1]
    # clamp block ends into the real token range
    q1c = jnp.minimum(q1, total_q - 1)
    k1c = jnp.minimum(k1, total_k - 1)
    qs0, qs1 = seg_of(q0, cu_seqlens_q), seg_of(q1c, cu_seqlens_q)
    ks0, ks1 = seg_of(k0, cu_seqlens_k), seg_of(k1c, cu_seqlens_k)
    q_in_range = q0 < total_q
    k_in_range = k0 < total_k

    inter = (
        (qs0[:, None] <= ks1[None, :]) & (ks0[None, :] <= qs1[:, None])
        & q_in_range[:, None] & k_in_range[None, :]
    )

    # "full" candidates: both blocks inside ONE segment, block fully real
    one_seg = (qs0 == qs1)[:, None] & (ks0 == ks1)[None, :] & (
        qs0[:, None] == ks0[None, :]
    )
    blocks_real = (q1[:, None] < total_q) & (k1[None, :] < total_k)
    full = inter & one_seg & blocks_real
    wl, wr = int(window_size[0]), int(window_size[1])
    if causal or wr >= 0:
        # from-end coordinates of block corners within the segment
        q_end = cu_seqlens_q[qs0 + 1]
        k_end = cu_seqlens_k[ks0 + 1]
        pq_last = q_end[:, None] - 1 - q1[:, None]  # smallest q from-end
        pk_last = k_end[None, :] - 1 - k1[None, :]  # smallest k from-end
        w = 0 if causal else wr
        # full iff even the worst pair is allowed: pk_min >= pq_max? use
        # pk_last (min over block) >= pq_first... conservative: require
        # pk_last >= (q_end - 1 - q0) - w  (largest q from-end)
        pq_first = q_end[:, None] - 1 - q0[:, None]
        full = full & (pk_last >= pq_first - w)
    if wl >= 0:
        q_end = cu_seqlens_q[qs0 + 1]
        k_end = cu_seqlens_k[ks0 + 1]
        pk_first = k_end[None, :] - 1 - k0[None, :]
        pq_last2 = q_end[:, None] - 1 - q1[:, None]
        full = full & (pk_first <= pq_last2 + wl)

    partial = inter & ~full
    kv_num, kv_idx = _pack_indices(partial[None, None])
    full_kv_num, full_kv_idx = _pack_indices(full[None, None])
    pT = jnp.swapaxes(partial, 0, 1)[None, None]
    fT = jnp.swapaxes(full, 0, 1)[None, None]
    q_num, q_idx = _pack_indices(pT)
    full_q_num, full_q_idx = _pack_indices(fT)

    def bh(x):  # broadcast to (1, nheads, ...)
        return jnp.broadcast_to(x, (1, nheads) + x.shape[2:])

    return BlockMask(
        block_q, block_k, int(total_q_p), int(total_k_p),
        bh(kv_num), bh(kv_idx), bh(full_kv_num), bh(full_kv_idx),
        bh(q_num), bh(q_idx), bh(full_q_num), bh(full_q_idx),
    )


def flash_attn_varlen_packed_func(
    q,
    k,
    v,
    cu_seqlens_q,
    cu_seqlens_k,
    max_seqlen_q=None,
    max_seqlen_k=None,
    *,
    softmax_scale=None,
    causal: bool = False,
    window_size=(-1, -1),
    block_q: int = 1024,
    block_k: int = 1024,
):
    """True packed varlen attention: q (total_q, h, d), k/v (total_k, hk, d).

    Tokens stay packed end to end; cross-sequence blocks are skipped via
    the interval block mask.  cu_seqlens must be concrete (host) values or
    consistent traced arrays — the block structure is data-dependent, so
    under jit the cu_seqlens arrays are traced and the structure is
    computed on device.
    """
    total_q, h, d = q.shape
    total_k = k.shape[0]
    nseq = int(cu_seqlens_q.shape[0]) - 1
    if nseq >= 0x7FFF:
        raise ValueError("packed varlen supports < 32767 sequences per call")
    # Per-sequence length must fit the 16 position bits of the aux word —
    # beyond that from-end positions saturate and the causal/window mask
    # silently admits future tokens.  Check statically via max_seqlen when
    # given, else via concrete cu_seqlens; traced cu_seqlens without a
    # max_seqlen bound cannot be validated, so refuse them.
    for name, ms, cu in (("q", max_seqlen_q, cu_seqlens_q),
                         ("k", max_seqlen_k, cu_seqlens_k)):
        if ms is not None:
            if int(ms) > _POS_MASK:
                raise ValueError(
                    f"packed varlen supports per-sequence lengths up to "
                    f"{_POS_MASK}; max_seqlen_{name}={int(ms)} exceeds it "
                    f"(use the padded flash_attn_varlen_func path)"
                )
        elif not isinstance(cu, jax.core.Tracer):
            import numpy as np

            lens = np.diff(np.asarray(cu))
            if lens.size and int(lens.max()) > _POS_MASK:
                raise ValueError(
                    f"packed varlen supports per-sequence lengths up to "
                    f"{_POS_MASK}; got a length-{int(lens.max())} sequence "
                    f"(use the padded flash_attn_varlen_func path)"
                )
        else:
            raise ValueError(
                "packed varlen needs max_seqlen_q/max_seqlen_k when "
                "cu_seqlens are traced (cannot validate the 16-bit "
                "position limit)"
            )
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    cu_q = jnp.asarray(cu_seqlens_q, jnp.int32)
    cu_k = jnp.asarray(cu_seqlens_k, jnp.int32)

    tq_p = round_up(max(total_q, block_q), block_q)
    tk_p = round_up(max(total_k, block_k), block_k)

    def pad_tokens(x, t):
        return jnp.pad(x, ((0, t - x.shape[0]), (0, 0), (0, 0))) \
            if x.shape[0] != t else x

    q_p = pad_tokens(q, tq_p)[None]   # (1, total_q_p, h, d)
    k_p = pad_tokens(k, tk_p)[None]
    v_p = pad_tokens(v, tk_p)[None]

    qa = _segment_aux(cu_q, total_q, tq_p)[None]   # (1, total_q_p)
    ka = _segment_aux(cu_k, total_k, tk_p)[None]

    bm = varlen_block_mask(
        cu_q, cu_k, tq_p, tk_p, causal=causal, window_size=window_size,
        block_q=block_q, block_k=block_k, nheads=h,
    )
    mod = make_varlen_mask_mod(causal, window_size)
    out = flex_attention(
        q_p, k_p, v_p, mask_mod=mod, block_mask=bm, q_aux=qa, kv_aux=ka,
        softmax_scale=float(softmax_scale),
    )
    return out[0, :total_q]
