"""Public flash-attention API.

TPU-native counterpart of `flash_attn/flash_attn_interface.py` (reference
functions `flash_attn_qkvpacked_func:1008`, `flash_attn_kvpacked_func:1067`,
`flash_attn_func:1145`, varlen triple `:1222/:1288/:1380`,
`flash_attn_with_kvcache:1474`).  Instead of torch custom ops +
autograd.Function, differentiation is wired with `jax.custom_vjp` over the
Pallas forward/backward kernels; everything is jit-compatible.

Layouts follow the reference: dense inputs are (batch, seqlen, nheads,
head_dim); varlen inputs are (total_tokens, nheads, head_dim) with
`cu_seqlens` prefix sums.  Internally kernels run on (b, h, s, d).

Notes vs the reference:
* `deterministic` is accepted and ignored — the TPU backward is always
  deterministic (no atomics; see `kernels/flash_bwd.py`).
* attention dropout runs inside the kernels via a counter-based keep-mask
  hashed from absolute positions (`kernels/flash_fwd.py` dropout_keep, the
  Philox role of `csrc/flash_attn/src/dropout.h`); pass an explicit
  `dropout_seed` (JAX has no global RNG state).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.kernels.flash_bwd import flash_attn_bwd_bhsd
from flash_attn_tpu.kernels.flash_fwd import flash_attn_fwd_bhsd

__all__ = [
    "flash_attn_func",
    "flash_attn_qkvpacked_func",
    "flash_attn_kvpacked_func",
    "flash_attn_varlen_func",
    "flash_attn_varlen_qkvpacked_func",
    "flash_attn_varlen_kvpacked_func",
    "flash_attn_with_kvcache",
    "fuse_kv_cache",
    "split_kv_cache",
]


@functools.lru_cache(maxsize=None)
def _make_core(scale, causal, window, softcap, has_alibi, block_q, block_k,
               dropout_p, attention_chunk=0, has_sinks=False,
               full_lengths=False, need_lse=True):
    """Build a custom_vjp-wrapped core for one static config.

    The cache plays the role of the reference's per-config kernel dispatch
    (`BOOL_SWITCH` specialization tree, `flash_fwd_launch_template.h:71-99`).

    `need_lse=False` builds the inference-fast variant: the *primal* (the
    function JAX runs when no gradient flows) skips the LSE HBM write
    entirely (`emit_lse=False` — it is 2x the output's bytes at hdim128);
    under differentiation JAX runs `core_fwd` instead, which always emits
    LSE for the backward's residuals, so grads are unaffected.
    """
    kw = dict(
        softmax_scale=scale,
        causal=causal,
        window_size=window,
        softcap=softcap,
        block_q=block_q,
        block_k=block_k,
        dropout_p=dropout_p,
        attention_chunk=attention_chunk,
    )
    fwd_kw = dict(kw, full_lengths=full_lengths)

    @jax.custom_vjp
    def core(q, k, v, slopes, sinks, seqused_q, seqused_k, dropout_seed):
        o, lse = flash_attn_fwd_bhsd(
            q, k, v, seqused_q, seqused_k, alibi_slopes=slopes, sinks=sinks,
            dropout_seed=dropout_seed, emit_lse=need_lse, **fwd_kw
        )
        return (o, lse) if need_lse else o

    def core_fwd(q, k, v, slopes, sinks, seqused_q, seqused_k, dropout_seed):
        o, lse = flash_attn_fwd_bhsd(
            q, k, v, seqused_q, seqused_k, alibi_slopes=slopes, sinks=sinks,
            dropout_seed=dropout_seed, **fwd_kw
        )
        out = (o, lse) if need_lse else o
        return out, (q, k, v, o, lse, slopes, sinks, seqused_q,
                     seqused_k, dropout_seed)

    def core_bwd(res, cts):
        do, dlse = cts if need_lse else (cts, None)
        (q, k, v, o, lse, slopes, sinks, seqused_q, seqused_k,
         dropout_seed) = res
        # With an attention sink the saved LSE already includes the sink
        # logit, so p_ij = exp(s_ij - lse_i) is the correct (sub-unit)
        # probability and the standard dq/dk/dv recompute is unchanged.
        dq, dk, dv = flash_attn_bwd_bhsd(
            do, q, k, v, o, lse, seqused_q, seqused_k, alibi_slopes=slopes,
            dlse=dlse, dropout_seed=dropout_seed,
            full_lengths=full_lengths, **kw
        )
        dsinks = None
        if has_sinks:
            # dL/dsink_h = sum_{b,i} p_sink (dlse_i - delta_i),
            # p_sink = exp(sink_h - lse_{b,h,i})
            delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                            axis=-1)  # (b, h, sq)
            p_sink = jnp.exp(
                jnp.asarray(sinks, jnp.float32)[None, :, None] - lse
            )
            ct = -delta if dlse is None else (dlse.astype(jnp.float32)
                                              - delta)
            dsinks = jnp.sum(p_sink * ct, axis=(0, 2)).astype(
                jnp.asarray(sinks).dtype)
        return dq, dk, dv, None, dsinks, None, None, None

    core.defvjp(core_fwd, core_bwd)
    return core


def _attn_bhsd(
    q, k, v, *, softmax_scale, causal, window_size, softcap, alibi_slopes,
    seqused_q, seqused_k, block_q=None, block_k=None, return_lse=False,
    dropout_p=0.0, dropout_seed=None, attention_chunk=0, sinks=None,
    full_lengths=False,
):
    if dropout_p > 0.0 and block_q is None:
        # shared fwd/bwd tiling is not required (the keep mask hashes
        # absolute positions) but a moderate tile keeps the extra VPU hash
        # work overlapped
        block_q, block_k = 1024, 1024
    core = _make_core(
        float(softmax_scale), bool(causal),
        (int(window_size[0]), int(window_size[1])), float(softcap),
        alibi_slopes is not None, block_q, block_k, float(dropout_p),
        int(attention_chunk), sinks is not None, bool(full_lengths),
        need_lse=bool(return_lse),
    )
    seed = jnp.asarray(0 if dropout_seed is None else dropout_seed, jnp.int32)
    out = core(q, k, v, alibi_slopes, sinks, seqused_q, seqused_k, seed)
    return out if return_lse else (out, None)


def _check_dropout(dropout_p):
    if not 0.0 <= dropout_p < 1.0:
        raise ValueError(f"dropout_p must be in [0, 1), got {dropout_p}")


def _is_fp8(x):
    return jnp.issubdtype(x.dtype, jnp.floating) and x.dtype.itemsize == 1


def _attn_probs_dmask(q, k, lse, *, softmax_scale, causal, window_size,
                      softcap, alibi_slopes, attention_chunk, dropout_p,
                      dropout_seed):
    """Debug-grade S_dmask reconstruction (reference FA2 `return_attn_probs`
    S_dmask, `flash_attn_interface.py:474`): post-softmax probabilities with
    the dropout encoding — kept entries hold P/(1-p), dropped entries hold
    -P (so `S_dmask >= 0` recovers the keep mask, the reference
    `convert_flash_attn_S_to_softmax` contract,
    `tests/test_flash_attn.py:411`).

    The kernel's dropout is a stateless position hash (`dropout_keep`), so
    the exact keep mask is reproducible host-side from (seed, b, h, row,
    col) — no kernel side-channel needed.  O(b*h*sq*sk) memory: debug only.
    """
    from flash_attn_tpu.kernels.flash_fwd import dropout_keep

    b, sq, h, d = q.shape
    sk, hk = k.shape[1], k.shape[2]
    g = h // hk
    kf = jnp.repeat(k, g, axis=2) if g > 1 else k
    s = jnp.einsum("bihd,bjhd->bhij", q.astype(jnp.float32),
                   kf.astype(jnp.float32)) * softmax_scale
    if softcap > 0.0:
        s = jnp.tanh(s / softcap) * softcap
    rows = jnp.arange(sq, dtype=jnp.int32)[:, None]
    cols = jnp.arange(sk, dtype=jnp.int32)[None, :]
    offset = sk - sq  # bottom-right aligned (kernel convention)
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(-1, h)
        slopes = jnp.broadcast_to(slopes, (b, h))
        s = s - slopes[:, :, None, None] * jnp.abs(
            rows + offset - cols).astype(jnp.float32)[None, None]
    wl, wr = window_size
    if causal:
        wr = 0
    mask = jnp.zeros((sq, sk), bool)
    if causal or wr >= 0:
        mask = mask | (cols > rows + offset + max(wr, 0))
    if wl >= 0:
        mask = mask | (cols < rows + offset - wl)
    if attention_chunk and attention_chunk > 0:
        mask = mask | (cols // attention_chunk
                       != (rows + offset) // attention_chunk)
    p_mat = jnp.where(mask[None, None], 0.0,
                      jnp.exp(s - lse[:, :, :, None]))
    seed = jnp.asarray(0 if dropout_seed is None else dropout_seed,
                       jnp.int32)
    bi = jnp.arange(b, dtype=jnp.int32)[:, None, None, None]
    hi = jnp.arange(h, dtype=jnp.int32)[None, :, None, None]
    keep = dropout_keep(seed, bi, hi, rows[None, None], cols[None, None],
                        dropout_p)
    return jnp.where(keep, p_mat / (1.0 - dropout_p), -p_mat)


def flash_attn_func(
    q,
    k,
    v,
    dropout_p=0.0,
    softmax_scale=None,
    causal=False,
    window_size=(-1, -1),
    softcap=0.0,
    alibi_slopes=None,
    deterministic=False,
    return_attn_probs=False,
    q_descale=None,
    k_descale=None,
    v_descale=None,
    sinks=None,
    dropout_seed=None,
    attention_chunk=0,
    qv=None,
):
    """Multi-head attention, (b, s, h, d) layout (`flash_attn_func:1145`).

    Supports MQA/GQA (nheads divisible by nheads_k), causal, sliding window,
    ALiBi, softcapping.  Returns out, or (out, softmax_lse, S_dmask) when
    `return_attn_probs`; S_dmask (dropout_p > 0 only, else None) is the
    debug-grade probability matrix with the reference's dropout encoding —
    kept entries P/(1-p), dropped entries -P (see `_attn_probs_dmask`).

    FP8: float8_e4m3fn q/k/v with (b, nheads_k) float32 `{q,k,v}_descale`
    run the dequantising forward kernel (FA3 FP8 semantics,
    `hopper/flash_attn_interface.py` descale args); forward-only, bf16 out.

    `sinks`: (nheads,) learnable attention-sink logits (softmax denominator
    only; `cute/interface.py:1149`).  Fully differentiable, including
    d(loss)/d(sinks).

    `qv`: (b, s, h, dv) extra query against V — scores become
    Q·Kᵀ + Qv·Vᵀ (FA3 gemm_qv accumulating into S,
    `hopper/mainloop_fwd_sm90_tma_gmma_ws.hpp:1147`; default scale
    1/sqrt(d+dv), `hopper/flash_attn_interface.py:276`).  On TPU this is
    one bigger MXU matmul, [Q|Qv]·[K|V]ᵀ, so it folds by concatenation
    along the head dim — and unlike the reference (fwd-only) the backward
    (dq, dqv, dk, dv) falls out of the concat's vjp.
    """
    _check_dropout(dropout_p)
    if qv is not None:
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(q.shape[-1] + qv.shape[-1])
        q = jnp.concatenate([q, qv.astype(q.dtype)], axis=-1)
        k = jnp.concatenate([k, v.astype(k.dtype)], axis=-1)
    del deterministic  # always deterministic on TPU
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    seqused_q = jnp.full((b,), sq, jnp.int32)
    seqused_k = jnp.full((b,), sk, jnp.int32)
    if _is_fp8(q):
        # Forward-only (the reference FP8 kernel has no backward either).
        if dropout_p > 0.0:
            raise NotImplementedError(
                "dropout_p > 0 is not supported with fp8 inputs"
            )
        from flash_attn_tpu.kernels.flash_fwd import flash_attn_fwd_bhsd

        o, lse = flash_attn_fwd_bhsd(
            qt, kt, vt, seqused_q, seqused_k,
            softmax_scale=float(softmax_scale), causal=causal,
            window_size=window_size, softcap=softcap,
            alibi_slopes=alibi_slopes,
            attention_chunk=attention_chunk,
            q_descale=q_descale, k_descale=k_descale, v_descale=v_descale,
            sinks=sinks, emit_lse=bool(return_attn_probs),
        )
    else:
        o, lse = _attn_bhsd(
            qt, kt, vt, softmax_scale=softmax_scale, causal=causal,
            window_size=window_size, softcap=softcap,
            alibi_slopes=alibi_slopes,
            seqused_q=seqused_q, seqused_k=seqused_k,
            return_lse=return_attn_probs,
            dropout_p=dropout_p, dropout_seed=dropout_seed,
            attention_chunk=attention_chunk, sinks=sinks,
            full_lengths=True,
        )
    o = jnp.swapaxes(o, 1, 2)
    if return_attn_probs:
        s_dmask = None
        if dropout_p > 0.0 and lse is not None:
            s_dmask = _attn_probs_dmask(
                q, k, lse, softmax_scale=softmax_scale, causal=causal,
                window_size=window_size, softcap=softcap,
                alibi_slopes=alibi_slopes, attention_chunk=attention_chunk,
                dropout_p=dropout_p, dropout_seed=dropout_seed)
        return o, lse, s_dmask
    return o


def flash_attn_qkvpacked_func(
    qkv,
    dropout_p=0.0,
    softmax_scale=None,
    causal=False,
    window_size=(-1, -1),
    softcap=0.0,
    alibi_slopes=None,
    deterministic=False,
    return_attn_probs=False,
):
    """qkv: (b, s, 3, h, d) (`flash_attn_qkvpacked_func:1008`)."""
    return flash_attn_func(
        qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
        dropout_p, softmax_scale, causal, window_size, softcap,
        alibi_slopes, deterministic, return_attn_probs,
    )


def flash_attn_kvpacked_func(
    q,
    kv,
    dropout_p=0.0,
    softmax_scale=None,
    causal=False,
    window_size=(-1, -1),
    softcap=0.0,
    alibi_slopes=None,
    deterministic=False,
    return_attn_probs=False,
):
    """kv: (b, s, 2, hk, d) (`flash_attn_kvpacked_func:1067`)."""
    return flash_attn_func(
        q, kv[:, :, 0], kv[:, :, 1],
        dropout_p, softmax_scale, causal, window_size, softcap,
        alibi_slopes, deterministic, return_attn_probs,
    )


# ---------------------------------------------------------------------------
# Varlen: packed (total, h, d) tokens + cu_seqlens.
#
# TPU kernels need static shapes, so the packed stream is regathered into a
# (batch, max_seqlen) padded layout (a cheap HBM-bandwidth gather that XLA
# fuses), the kernel masks with per-batch `seqused`, and outputs are
# scattered back.  This replaces the reference's cu_seqlens pointer
# arithmetic (`block_info.h:13`).  Gather/scatter are jit-compatible and
# differentiable, so varlen autodiff falls out of the dense custom_vjp.
# ---------------------------------------------------------------------------


def _varlen_to_padded(x, cu_seqlens, max_seqlen):
    total = x.shape[0]
    bsz = cu_seqlens.shape[0] - 1
    idx = cu_seqlens[:-1, None] + jnp.arange(max_seqlen, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(idx, total - 1)
    return x[idx]  # (b, max_seqlen, h, d)


def _padded_to_varlen(xp, cu_seqlens, total):
    seg = (
        jnp.searchsorted(
            cu_seqlens, jnp.arange(total, dtype=jnp.int32), side="right"
        ).astype(jnp.int32)
        - 1
    )
    seg = jnp.clip(seg, 0, cu_seqlens.shape[0] - 2)
    pos = jnp.arange(total, dtype=jnp.int32) - cu_seqlens[seg]
    pos = jnp.clip(pos, 0, xp.shape[1] - 1)
    return xp[seg, pos]


def flash_attn_varlen_func(
    q,
    k,
    v,
    cu_seqlens_q,
    cu_seqlens_k,
    max_seqlen_q,
    max_seqlen_k,
    dropout_p=0.0,
    softmax_scale=None,
    causal=False,
    window_size=(-1, -1),
    softcap=0.0,
    alibi_slopes=None,
    deterministic=False,
    return_attn_probs=False,
    seqused_q=None,
    seqused_k=None,
    block_table=None,
    dropout_seed=None,
    q_descale=None,
    k_descale=None,
    v_descale=None,
    qv=None,
):
    """Varlen attention over packed tokens (`flash_attn_varlen_func:1380`).

    q: (total_q, h, d); k/v: (total_k, hk, d); cu_seqlens_*: (b+1,) int32.
    `seqused_k` limits the used keys per sequence (reference `seqused_k`
    semantics).  `block_table` (paged KV) is handled by the decode path.

    FP8: float8_e4m3fn q/k/v with per-(seq, nheads_k) `{q,k,v}_descale`
    (reference fp8-varlen scenario `standalone/src/test_fp8_varlen.cpp`,
    descale plumbing `hopper/flash_api.cpp:673-707`).  TPU design: the
    descales are folded into the packed streams *outside* the kernel —
    q is dequantised per token with its own segment's qk-descale, k/v are
    cast, and the v-descale rides the output as a per-row post-scale
    (every key a row attends to shares its segment).  In-kernel byte->
    bf16 slab casts measured ~8x slower on v5e than this folded form;
    both varlen routes then run the bf16 kernels unchanged.  Forward-only,
    bf16 out (like the dense fp8 path).
    """
    _check_dropout(dropout_p)
    del deterministic
    if qv is not None:
        # FA3 qv (S = Q·Kᵀ + Qv·Vᵀ): fold by [Q|Qv]·[K|V]ᵀ concat — see
        # flash_attn_func.  Packed streams concat the same way.
        if _is_fp8(q):
            raise NotImplementedError("qv is not supported with fp8 inputs")
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(q.shape[-1] + qv.shape[-1])
        q = jnp.concatenate([q, qv.astype(q.dtype)], axis=-1)
        k = jnp.concatenate([k, v.astype(k.dtype)], axis=-1)
    if _is_fp8(q) and block_table is None:
        if dropout_p > 0.0:
            raise NotImplementedError(
                "dropout_p > 0 is not supported with fp8 inputs")
        total_q, h, _ = q.shape
        hk = k.shape[1]
        g = h // hk
        b_ = cu_seqlens_q.shape[0] - 1

        def _norm_ds(ds):
            return (jnp.ones((b_, hk), jnp.float32) if ds is None else
                    jnp.broadcast_to(
                        jnp.asarray(ds, jnp.float32).reshape(-1, hk),
                        (b_, hk)))

        qd, kd, vd = _norm_ds(q_descale), _norm_ds(k_descale), _norm_ds(
            v_descale)
        seg_q = jnp.clip(
            jnp.searchsorted(jnp.asarray(cu_seqlens_q, jnp.int32),
                             jnp.arange(total_q, dtype=jnp.int32),
                             side="right").astype(jnp.int32) - 1,
            0, b_ - 1)
        deq = jnp.repeat((qd * kd)[seg_q], g, axis=1)  # (total_q, h)
        q_bf = (q.astype(jnp.float32) * deq[..., None]).astype(jnp.bfloat16)
        out = flash_attn_varlen_func(
            q_bf, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            cu_seqlens_q, cu_seqlens_k, max_seqlen_q, max_seqlen_k,
            0.0, softmax_scale, causal, window_size, softcap, alibi_slopes,
            True, return_attn_probs, seqused_q, seqused_k, None, None,
        )
        out, rest = (out[0], out[1:]) if return_attn_probs else (out, ())
        vscale = jnp.repeat(vd[seg_q], g, axis=1)      # (total_q, h)
        out = (out.astype(jnp.float32) * vscale[..., None]).astype(
            jnp.bfloat16)
        out = jax.lax.stop_gradient(out)
        return (out, *rest) if rest else out
    if block_table is not None:
        # Paged-KV varlen prefill (chunked prefill against a paged cache;
        # reference `hopper/flash_api.cpp:673-707` page_table in varlen
        # fwd).  k/v are the paged caches (npages, page, hk, d).
        if dropout_p > 0.0:
            raise NotImplementedError(
                "paged varlen prefill supports dropout_p=0 (inference path)")
        return _varlen_paged_prefill(
            q, k, v, cu_seqlens_q, max_seqlen_q, block_table,
            seqused_k=seqused_k, cu_seqlens_k=cu_seqlens_k,
            softmax_scale=softmax_scale, causal=causal,
            window_size=window_size, softcap=softcap,
            alibi_slopes=alibi_slopes, return_lse=return_attn_probs,
        )
    d = q.shape[-1]
    b = cu_seqlens_q.shape[0] - 1
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    # Multi-sequence batches route to the packed scheduled-grid path
    # (tokens never padded; the host-built tile schedule walks exactly the
    # needed block pairs — `kernels/varlen_sched.py`).  Router crossover
    # measured on v5e (benchmarks/sweep_varlen_router.py, 1024/1024/bh4
    # tiles + additive-bias mask): the scheduled kernel beats the
    # pad->dense-kernel->unpack path at EVERY padding ratio, including
    # perfectly uniform (causal 6.1 vs 9.7 ms; dense 8.3 vs 11.3 ms at
    # b8xs4096h16d128) — the pad/unpad HBM round-trip costs more than the
    # scheduled grid's per-tile deficit.  Dropout hashes its keep mask on
    # packed-stream coordinates; the backward reproduces it via
    # per-sequence offsets (flash_bwd packed_dropout).  The packed aux
    # word keeps 16 position bits per token, so longer sequences stay
    # padded.
    routable = (seqused_q is None and seqused_k is None
                and not return_attn_probs)
    fits_packed = max(max_seqlen_q, max_seqlen_k) <= 0xFFFF
    if routable and fits_packed and b > 1:
        from flash_attn_tpu.kernels.varlen_sched import (
            flash_attn_varlen_sched_func,
        )

        return flash_attn_varlen_sched_func(
            q, k, v, cu_seqlens_q, cu_seqlens_k,
            max_seqlen_q, max_seqlen_k,
            softmax_scale=float(softmax_scale), causal=causal,
            window_size=window_size, softcap=softcap,
            alibi_slopes=alibi_slopes, dropout_p=dropout_p,
            dropout_seed=dropout_seed,
        )
    lens_q = cu_seqlens_q[1:] - cu_seqlens_q[:-1]
    lens_k = cu_seqlens_k[1:] - cu_seqlens_k[:-1]
    used_q = lens_q if seqused_q is None else jnp.asarray(seqused_q, jnp.int32)
    used_k = lens_k if seqused_k is None else jnp.asarray(seqused_k, jnp.int32)

    qp = _varlen_to_padded(q, cu_seqlens_q, max_seqlen_q)
    kp = _varlen_to_padded(k, cu_seqlens_k, max_seqlen_k)
    vp = _varlen_to_padded(v, cu_seqlens_k, max_seqlen_k)

    o, lse = _attn_bhsd(
        jnp.swapaxes(qp, 1, 2), jnp.swapaxes(kp, 1, 2), jnp.swapaxes(vp, 1, 2),
        softmax_scale=softmax_scale, causal=causal, window_size=window_size,
        softcap=softcap, alibi_slopes=alibi_slopes,
        seqused_q=used_q, seqused_k=used_k,
        return_lse=return_attn_probs,
        dropout_p=dropout_p, dropout_seed=dropout_seed,
    )
    o = jnp.swapaxes(o, 1, 2)  # (b, max_sq, h, d)
    # Zero rows beyond each sequence's used length (they hold garbage from
    # the padded compute), then scatter back to the packed layout.
    row_valid = (
        jnp.arange(max_seqlen_q, dtype=jnp.int32)[None, :] < used_q[:, None]
    )
    o = jnp.where(row_valid[:, :, None, None], o, 0)
    out = _padded_to_varlen(o, cu_seqlens_q, q.shape[0])
    if return_attn_probs:
        return out, lse, None
    return out


def _varlen_paged_prefill(
    q, k_cache, v_cache, cu_seqlens_q, max_seqlen_q, block_table, *,
    seqused_k, cu_seqlens_k, softmax_scale, causal, window_size,
    alibi_slopes, softcap=0.0, return_lse=False,
):
    """Chunked prefill against a paged KV cache.

    Strategy: LEFT-pad each sequence's queries to `max_seqlen_q` so every
    real row sits at the bottom of its padded block — the bottom-right
    causal offset (`len_k - sq`) is then exact per sequence — and run the
    paged split-KV decode kernel (`kernels/flash_decode.py`), which
    already streams pages via the scalar-prefetched block table.  Garbage
    rows (the left padding) are discarded on the scatter back.
    """
    from flash_attn_tpu.kernels.flash_decode import decode_attn_ref_layout

    total_q, h, d = q.shape
    b = cu_seqlens_q.shape[0] - 1
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    lens_q = cu_seqlens_q[1:] - cu_seqlens_q[:-1]
    if seqused_k is not None:
        lens_k = jnp.asarray(seqused_k, jnp.int32)
    else:
        lens_k = cu_seqlens_k[1:] - cu_seqlens_k[:-1]

    # left-pad gather: padded row r holds token (r - (max_sq - len_q))
    r = jnp.arange(max_seqlen_q, dtype=jnp.int32)[None, :]
    src = cu_seqlens_q[:-1, None] + r - (max_seqlen_q - lens_q[:, None])
    valid = src >= cu_seqlens_q[:-1, None]
    qp = q[jnp.clip(src, 0, total_q - 1)]  # (b, max_sq, h, d)

    o, lse = decode_attn_ref_layout(
        qp, k_cache, v_cache, lens_k,
        softmax_scale=float(softmax_scale), causal=causal,
        window_size=window_size, softcap=softcap,
        alibi_slopes=alibi_slopes,
        block_table=block_table,
    )
    o = jnp.where(valid[:, :, None, None], o, 0)
    # scatter back: token t of sequence i is padded row
    # (max_sq - len_q[i]) + (t - cu[i])
    seg = jnp.clip(
        jnp.searchsorted(cu_seqlens_q, jnp.arange(total_q, dtype=jnp.int32),
                         side="right").astype(jnp.int32) - 1,
        0, b - 1,
    )
    pos = (jnp.arange(total_q, dtype=jnp.int32) - cu_seqlens_q[seg]
           + max_seqlen_q - lens_q[seg])
    out = o[seg, jnp.clip(pos, 0, max_seqlen_q - 1)]
    if return_lse:
        # Right-align the LSE rows to match the padded varlen path's
        # (b, h, max_seqlen_q) convention (token t of sequence i at row t).
        t = jnp.arange(max_seqlen_q, dtype=jnp.int32)[None, :]
        src_row = jnp.clip(t + (max_seqlen_q - lens_q[:, None]),
                           0, max_seqlen_q - 1)
        lse_r = jnp.take_along_axis(lse, src_row[:, None, :], axis=2)
        # padding rows carry +inf, matching the padded varlen path and the
        # reference's fully-masked-row convention (flash_fwd.py:1098) —
        # 0.0 is a legitimate LSE value and would break isinf detection
        lse_r = jnp.where((t < lens_q[:, None])[:, None, :], lse_r, jnp.inf)
        return out, lse_r, None
    return out


def flash_attn_varlen_qkvpacked_func(
    qkv,
    cu_seqlens,
    max_seqlen,
    dropout_p=0.0,
    softmax_scale=None,
    causal=False,
    window_size=(-1, -1),
    softcap=0.0,
    alibi_slopes=None,
    deterministic=False,
    return_attn_probs=False,
):
    """qkv: (total, 3, h, d) (`flash_attn_varlen_qkvpacked_func:1222`)."""
    return flash_attn_varlen_func(
        qkv[:, 0], qkv[:, 1], qkv[:, 2],
        cu_seqlens, cu_seqlens, max_seqlen, max_seqlen,
        dropout_p, softmax_scale, causal, window_size, softcap,
        alibi_slopes, deterministic, return_attn_probs,
    )


def flash_attn_varlen_kvpacked_func(
    q,
    kv,
    cu_seqlens_q,
    cu_seqlens_k,
    max_seqlen_q,
    max_seqlen_k,
    dropout_p=0.0,
    softmax_scale=None,
    causal=False,
    window_size=(-1, -1),
    softcap=0.0,
    alibi_slopes=None,
    deterministic=False,
    return_attn_probs=False,
):
    """kv: (total_k, 2, hk, d) (`flash_attn_varlen_kvpacked_func:1288`)."""
    return flash_attn_varlen_func(
        q, kv[:, 0], kv[:, 1],
        cu_seqlens_q, cu_seqlens_k, max_seqlen_q, max_seqlen_k,
        dropout_p, softmax_scale, causal, window_size, softcap,
        alibi_slopes, deterministic, return_attn_probs,
    )


def flash_attn_with_kvcache(*args, **kwargs):
    """Decode-path attention with KV cache; see `kernels/flash_decode.py`."""
    from flash_attn_tpu.kernels.flash_decode import flash_attn_with_kvcache as f

    return f(*args, **kwargs)


def fuse_kv_cache(k_cache, v_cache):
    """Pack paged K/V caches into the fused (npages, 2, page, hk, d)
    layout (one DMA per page covering K and V; TPU extension)."""
    from flash_attn_tpu.kernels.flash_decode import fuse_kv_cache as f

    return f(k_cache, v_cache)


def split_kv_cache(kv_cache):
    """Inverse of `fuse_kv_cache`."""
    from flash_attn_tpu.kernels.flash_decode import split_kv_cache as f

    return f(kv_cache)


def flash_attn_combine(out_partial, lse_partial, out=None, out_dtype=None):
    """Combine split-attention partials (`hopper/flash_attn_interface.py:636`).

    out_partial: (num_splits, b, s, h, d) per-split normalised outputs;
    lse_partial: (num_splits, b, h, s) natural-log LSEs (+inf = empty).
    Returns (out (b, s, h, d), lse (b, h, s)).  `out` is accepted for
    signature parity but ignored (JAX is functional).
    """
    from flash_attn_tpu.kernels.combine import combine_attn_partials

    del out
    op = jnp.swapaxes(jnp.asarray(out_partial), 2, 3)  # -> (ns, b, h, s, d)
    o, lse = combine_attn_partials(op, jnp.asarray(lse_partial), axis=0)
    o = jnp.swapaxes(o, 1, 2)  # -> (b, s, h, d)
    if out_dtype is not None:
        o = o.astype(out_dtype)
    return o, lse


def get_scheduler_metadata(
    batch_size,
    max_seqlen_q,
    max_seqlen_k,
    num_heads_q,
    num_heads_kv,
    headdim,
    cache_seqlens=None,
    qkv_dtype=jnp.bfloat16,
    headdim_v=None,
    cu_seqlens_q=None,
    cu_seqlens_k_new=None,
    cache_leftpad=None,
    page_size=None,
    max_seqlen_k_new=0,
    causal=False,
    window_size=(-1, -1),
    attention_chunk=0,
    has_softcap=False,
    num_splits=0,
    pack_gqa=None,
    sm_margin=0,
):
    """Decode-scheduling metadata (`hopper/flash_attn_interface.py:803`).

    The reference computes per-batch split counts on-device for its
    persistent-kernel scheduler; the TPU analogue is the host-side split/
    pack heuristic that shapes the Pallas decode grid.  Returns a dict you
    can pass to tune `flash_attn_with_kvcache` (`num_splits`) or inspect.
    """
    from flash_attn_tpu.kernels.block_sizes import fwd_block_sizes

    if headdim_v is None:
        headdim_v = headdim
    g = num_heads_q // max(num_heads_kv, 1)
    # pack GQA q-heads into the M dimension when the q tile would otherwise
    # be mostly padding (reference heuristics.h:9 should_pack_gqa)
    if pack_gqa is None:
        pack_gqa = max_seqlen_q * g <= 512 and g > 1
    bs = fwd_block_sizes(max(max_seqlen_q, 1), max_seqlen_k, headdim,
                         boundary_heavy=causal)
    if num_splits <= 0:
        # TPU split heuristic: one split per ~4k cached tokens once the
        # (batch x kv-head) grid alone cannot fill the core pipeline
        # (role of num_splits_heuristic, csrc/flash_attn/flash_api.cpp:263).
        # When concrete per-batch lengths are available (host-side planning,
        # the flash_prepare_scheduler.cu:50 role), plan from the actual
        # longest sequence rather than the cache extent — the Pallas grid's
        # clamped index maps make the shorter batches' extra ticks nearly
        # free, so only the longest sequence needs splitting.
        eff_k = max_seqlen_k
        if cache_seqlens is not None:
            try:
                eff_k = int(np.max(np.asarray(cache_seqlens)))
            except Exception:
                pass  # traced under jit: fall back to the static bound
        parallelism = batch_size * num_heads_kv
        if parallelism >= 8 or eff_k <= 4096:
            num_splits = 1
        else:
            num_splits = min(8, max(1, eff_k // 4096))
    return dict(
        num_splits=int(num_splits),
        pack_gqa=bool(pack_gqa),
        block_q=bs.block_q,
        block_k=bs.block_k,
        block_k_sub=bs.block_k_sub,
        page_size=page_size,
    )
