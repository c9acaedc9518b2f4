"""Pure-JAX attention oracle + varlen fixtures.

Port of the reference's test oracle semantics (`tests/test_util.py:185`
`attention_ref`, `construct_local_mask:151`, `generate_qkv:31`,
`generate_random_padding_mask:8`; alibi bias from
`tests/test_flash_attn.py:29`).  Everything computes in fp32 ("upcast") and
reconstructs masks explicitly; kernels are accepted when their error vs this
oracle is <= ~2x the error of the same computation run in low precision
(the reference's tolerance rule, used throughout `tests/test_flash_attn.py`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.utils.padding import pad_input, unpad_input

INF = float("inf")


def generate_random_padding_mask(
    max_seqlen, batch_size, mode="random", zero_lengths=False, rng=None
):
    rng = np.random.default_rng(0) if rng is None else rng
    if mode == "full":
        lengths = np.full((batch_size, 1), max_seqlen, dtype=np.int32)
    elif mode == "random":
        low = max(0 if zero_lengths else 1, max_seqlen - 20)
        lengths = rng.integers(low, max_seqlen + 1, (batch_size, 1))
    elif mode == "third":
        lengths = rng.integers(max_seqlen // 3, max_seqlen + 1, (batch_size, 1))
    else:
        raise ValueError(mode)
    if zero_lengths:
        for i in range(batch_size):
            if i % 5 == 0:
                lengths[i] = 0
        lengths[-1] = 0
    padding_mask = np.arange(max_seqlen)[None, :] < lengths
    return jnp.asarray(padding_mask)


def construct_local_mask(
    seqlen_q,
    seqlen_k,
    window_size=(-1, -1),
    query_padding_mask=None,
    key_padding_mask=None,
    key_leftpad=None,
):
    """True where masked OUT.  Bottom-right aligned (reference semantics)."""
    # the reference C++ API normalises a one-sided window to unbounded on
    # the -1 side (`flash_api.cpp:141-142`); its python test oracle never
    # sees that case, so normalise here to match the kernels
    if window_size[0] >= 0 and window_size[1] < 0:
        window_size = (window_size[0], seqlen_k)
    elif window_size[1] >= 0 and window_size[0] < 0:
        window_size = (seqlen_k, window_size[1])
    row_idx = jnp.arange(seqlen_q, dtype=jnp.int32)[:, None]
    col_idx = jnp.arange(seqlen_k, dtype=jnp.int32)
    if key_leftpad is not None:
        key_leftpad = jnp.reshape(key_leftpad, (-1, 1, 1, 1))
        col_idx = jnp.broadcast_to(
            col_idx, (key_leftpad.shape[0], 1, 1, seqlen_k)
        )
        col_idx = jnp.where(col_idx >= key_leftpad, col_idx - key_leftpad, 2**30)
    sk = (
        seqlen_k
        if key_padding_mask is None
        else jnp.reshape(key_padding_mask.sum(-1), (-1, 1, 1, 1))
    )
    sq = (
        seqlen_q
        if query_padding_mask is None
        else jnp.reshape(query_padding_mask.sum(-1), (-1, 1, 1, 1))
    )
    if window_size[0] < 0:
        return col_idx > row_idx + sk - sq + window_size[1]
    else:
        if key_padding_mask is None:
            sk = jnp.full_like(col_idx, seqlen_k)
        return jnp.logical_or(
            col_idx > jnp.minimum(row_idx + sk - sq + window_size[1], sk),
            col_idx < row_idx + sk - sq - window_size[0],
        )


def attn_bias_from_alibi_slopes(
    slopes,
    seqlen_q,
    seqlen_k,
    query_padding_mask=None,
    key_padding_mask=None,
    causal=False,
    key_leftpad=None,
):
    """(batch or 1, nheads) slopes -> additive bias, `tests/test_flash_attn.py:29`."""
    batch, nheads = slopes.shape
    slopes = jnp.reshape(slopes, (batch, nheads, 1, 1))
    if causal:
        return (
            jnp.arange(-seqlen_k + 1, 1, dtype=jnp.float32) * slopes
        )
    row_idx = jnp.arange(seqlen_q, dtype=jnp.int32)[:, None]
    col_idx = jnp.arange(seqlen_k, dtype=jnp.int32)
    if key_leftpad is not None:
        key_leftpad = jnp.reshape(key_leftpad, (-1, 1, 1, 1))
        col_idx = jnp.broadcast_to(col_idx, (key_leftpad.shape[0], 1, 1, seqlen_k))
        col_idx = jnp.where(col_idx >= key_leftpad, col_idx - key_leftpad, 2**30)
    sk = (
        seqlen_k
        if key_padding_mask is None
        else jnp.reshape(key_padding_mask.sum(-1), (-1, 1, 1, 1))
    )
    sq = (
        seqlen_q
        if query_padding_mask is None
        else jnp.reshape(query_padding_mask.sum(-1), (-1, 1, 1, 1))
    )
    relative_pos = jnp.abs(row_idx + sk - sq - col_idx)
    return -slopes * relative_pos.astype(jnp.float32)


def attention_ref(
    q,
    k,
    v,
    query_padding_mask=None,
    key_padding_mask=None,
    attn_bias=None,
    dropout_p=0.0,
    dropout_mask=None,
    causal=False,
    window_size=(-1, -1),
    softcap=0.0,
    upcast=True,
    reorder_ops=False,
    key_leftpad=None,
    softmax_scale=None,
):
    """Reference attention, mirroring `tests/test_util.py:185`.

    q: (b, sq, h, d); k/v: (b, sk, hk, d).  Returns (out, attention) where
    out is (b, sq, h, d) in q.dtype and attention is the post-dropout
    probability matrix (b, h, sq, sk).
    """
    if causal:
        window_size = (window_size[0], 0)
    dtype_og = q.dtype
    if upcast:
        q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    seqlen_q, seqlen_k = q.shape[1], k.shape[1]
    g = q.shape[2] // k.shape[2]
    k = jnp.repeat(k, g, axis=2)
    v = jnp.repeat(v, g, axis=2)
    d = q.shape[-1]
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(d)
    if not reorder_ops:
        scores = jnp.einsum("bthd,bshd->bhts", q * scale, k)
    else:
        scores = jnp.einsum("bthd,bshd->bhts", q, k * scale)
    if softcap > 0:
        scores = jnp.tanh(scores / softcap) * softcap
    if key_padding_mask is not None:
        scores = jnp.where(
            jnp.reshape(~key_padding_mask, (key_padding_mask.shape[0], 1, 1, -1)),
            -INF,
            scores,
        )
    local_mask = None
    if window_size[0] >= 0 or window_size[1] >= 0:
        local_mask = construct_local_mask(
            seqlen_q,
            seqlen_k,
            window_size,
            query_padding_mask,
            key_padding_mask,
            key_leftpad=key_leftpad,
        )
        scores = jnp.where(local_mask, -INF, scores)
    if attn_bias is not None:
        scores = scores + attn_bias
    attention = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    # Fully-masked rows produce NaN from softmax(-inf row); zero them.
    if local_mask is not None:
        attention = jnp.where(
            jnp.all(local_mask, axis=-1, keepdims=True), 0.0, attention
        )
    attention = jnp.where(jnp.isnan(attention), 0.0, attention)
    if query_padding_mask is not None:
        attention = jnp.where(
            jnp.reshape(~query_padding_mask, (query_padding_mask.shape[0], 1, -1, 1)),
            0.0,
            attention,
        )
    dropout_scaling = 1.0 / (1 - dropout_p)
    if dropout_mask is not None:
        attention_drop = jnp.where(dropout_mask, attention, 0.0)
    else:
        attention_drop = attention
    output = jnp.einsum("bhts,bshd->bthd", attention_drop, v * dropout_scaling)
    if query_padding_mask is not None:
        output = jnp.where(
            jnp.reshape(
                ~query_padding_mask, (query_padding_mask.shape[0], -1, 1, 1)
            ),
            0.0,
            output,
        )
    if key_padding_mask is not None:
        output = jnp.where(
            jnp.reshape(
                ~jnp.any(key_padding_mask, axis=1), (key_padding_mask.shape[0], 1, 1, 1)
            ),
            0.0,
            output,
        )
    return output.astype(dtype_og), attention.astype(dtype_og)


def generate_qkv(
    q, k, v, query_padding_mask=None, key_padding_mask=None,
    kvpacked=False, qkvpacked=False,
):
    """Varlen fixtures: build packed/unpadded views (`tests/test_util.py:31`)."""
    assert not (kvpacked and qkvpacked)
    batch_size, seqlen_q, nheads, d = q.shape
    _, seqlen_k, nheads_k, _ = k.shape

    if query_padding_mask is not None:
        q_unpad, indices_q, cu_seqlens_q, max_seqlen_q, seqused_q = unpad_input(
            q, query_padding_mask
        )
        output_pad_fn = lambda o: pad_input(o, indices_q, batch_size, seqlen_q)
    else:
        q_unpad = jnp.reshape(q, (batch_size * seqlen_q, nheads, d))
        cu_seqlens_q = jnp.arange(
            0, (batch_size + 1) * seqlen_q, seqlen_q, dtype=jnp.int32
        )
        seqused_q = None
        max_seqlen_q = seqlen_q
        output_pad_fn = lambda o: jnp.reshape(o, (batch_size, seqlen_q, nheads, d))

    if key_padding_mask is not None:
        k_unpad, indices_k, cu_seqlens_k, max_seqlen_k, seqused_k = unpad_input(
            k, key_padding_mask
        )
        v_unpad, *_ = unpad_input(v, key_padding_mask)
    else:
        k_unpad = jnp.reshape(k, (batch_size * seqlen_k, nheads_k, d))
        v_unpad = jnp.reshape(v, (batch_size * seqlen_k, nheads_k, d))
        cu_seqlens_k = jnp.arange(
            0, (batch_size + 1) * seqlen_k, seqlen_k, dtype=jnp.int32
        )
        seqused_k = None
        max_seqlen_k = seqlen_k

    if qkvpacked:
        assert nheads == nheads_k
        qkv_unpad = jnp.stack([q_unpad, k_unpad, v_unpad], axis=1)
        qkv = jnp.stack([q, k, v], axis=2)
        return qkv_unpad, cu_seqlens_q, max_seqlen_q, qkv, output_pad_fn
    elif kvpacked:
        kv_unpad = jnp.stack([k_unpad, v_unpad], axis=1)
        kv = jnp.stack([k, v], axis=2)
        return (
            q_unpad, kv_unpad, cu_seqlens_q, cu_seqlens_k,
            max_seqlen_q, max_seqlen_k, q, kv, output_pad_fn,
        )
    return (
        q_unpad, k_unpad, v_unpad,
        cu_seqlens_q, cu_seqlens_k, seqused_q, seqused_k,
        max_seqlen_q, max_seqlen_k, output_pad_fn,
    )


def check_close(out, out_ref, out_pt, mult=2.0, atol_floor=1e-5, label="out"):
    """The reference tolerance rule: |out-ref| <= mult*|pt-ref| + floor."""
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - out_ref.astype(jnp.float32))))
    err_pt = float(
        jnp.max(jnp.abs(out_pt.astype(jnp.float32) - out_ref.astype(jnp.float32)))
    )
    assert err <= mult * err_pt + atol_floor, (
        f"{label}: err {err:.3e} > {mult} * low-precision err {err_pt:.3e} + {atol_floor}"
    )
    return err, err_pt
