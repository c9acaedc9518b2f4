"""Varlen edge cases: zero-length sequences, dropout through the padded
path, the packed path's 16-bit position guard, and packed-vs-padded
routing (model: reference varlen sweeps in `tests/test_flash_attn.py:1172`
which include zero-length rows, plus the ADVICE round-1 findings)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_varlen_func
from flash_attn_tpu.kernels.varlen_packed import flash_attn_varlen_packed_func
from flash_attn_tpu.utils.testing import attention_ref, check_close


def _pack(rng, lens, h, d, dtype=jnp.bfloat16):
    total = sum(lens)
    cu = jnp.asarray(np.cumsum([0] + lens), jnp.int32)
    x = jnp.asarray(rng.standard_normal((max(total, 1), h, d)), dtype)
    return x, cu, total


def _ref_per_seq(q, k, v, cu_q, cu_k, causal, **kw):
    """Per-sequence oracle; returns (fp32-ref, low-precision-ref) outputs."""
    outs, outs_pt = [], []
    cq = np.asarray(cu_q)
    ck = np.asarray(cu_k)
    for i in range(len(cq) - 1):
        qi = q[cq[i]:cq[i + 1]][None]
        ki = k[ck[i]:ck[i + 1]][None]
        vi = v[ck[i]:ck[i + 1]][None]
        if qi.shape[1] == 0:
            continue
        if ki.shape[1] == 0:
            outs.append(jnp.zeros_like(qi[0]))
            outs_pt.append(jnp.zeros_like(qi[0]))
            continue
        o, _ = attention_ref(qi, ki, vi, causal=causal, **kw)
        o_pt, _ = attention_ref(qi, ki, vi, causal=causal, upcast=False,
                                reorder_ops=True, **kw)
        outs.append(o[0])
        outs_pt.append(o_pt[0])
    if not outs:
        return q[:0], q[:0]
    return jnp.concatenate(outs, axis=0), jnp.concatenate(outs_pt, axis=0)


@pytest.mark.parametrize("causal", [False, True])
def test_zero_length_sequences(causal):
    """Batches containing empty sequences (cu_seqlens with repeated
    entries) must produce correct outputs for the non-empty ones."""
    rng = np.random.default_rng(0)
    lens = [33, 0, 57, 0, 0, 24]
    h, d = 2, 64
    q, cu, total = _pack(rng, lens, h, d)
    k, _, _ = _pack(rng, lens, h, d)
    v, _, _ = _pack(rng, lens, h, d)
    out = flash_attn_varlen_func(q, k, v, cu, cu, max(lens), max(lens),
                                 causal=causal)
    ref, ref_pt = _ref_per_seq(q, k, v, cu, cu, causal)
    check_close(out, ref, ref_pt, atol_floor=8e-3)


def test_zero_length_keys_nonzero_query():
    """seqlen_k == 0 for one sequence: its rows get zero output (+inf LSE
    convention), no NaN."""
    rng = np.random.default_rng(1)
    lens_q = [16, 8]
    lens_k = [32, 0]
    h, d = 2, 64
    q, cu_q, _ = _pack(rng, lens_q, h, d)
    k, cu_k, _ = _pack(rng, lens_k, h, d)
    v, _, _ = _pack(rng, lens_k, h, d)
    out = flash_attn_varlen_func(q, k, v, cu_q, cu_k, max(lens_q),
                                 max(lens_k), causal=False)
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))
    assert bool(jnp.all(out[16:] == 0))
    ref, ref_pt = _ref_per_seq(q[:16], k, v, jnp.asarray([0, 16]),
                               jnp.asarray([0, 32]), False)
    check_close(out[:16], ref, ref_pt, atol_floor=8e-3)


def test_varlen_dropout_applied():
    """dropout_p > 0 through the varlen padded path must actually drop
    (round-1 ADVICE: it was silently ignored)."""
    rng = np.random.default_rng(2)
    lens = [64, 48]
    h, d = 2, 64
    q, cu, _ = _pack(rng, lens, h, d)
    k, _, _ = _pack(rng, lens, h, d)
    v, _, _ = _pack(rng, lens, h, d)
    out0 = flash_attn_varlen_func(q, k, v, cu, cu, 64, 64, causal=True)
    outd = flash_attn_varlen_func(q, k, v, cu, cu, 64, 64, causal=True,
                                  dropout_p=0.5, dropout_seed=11)
    assert not np.array_equal(np.asarray(out0), np.asarray(outd))
    # deterministic in the seed
    outd2 = flash_attn_varlen_func(q, k, v, cu, cu, 64, 64, causal=True,
                                   dropout_p=0.5, dropout_seed=11)
    np.testing.assert_array_equal(np.asarray(outd), np.asarray(outd2))


def test_packed_position_limit_raises():
    """Per-sequence lengths beyond 16 bits must be rejected by the packed
    path (round-1 ADVICE high: silent causality violation)."""
    rng = np.random.default_rng(3)
    h, d = 1, 64
    q = jnp.zeros((8, h, d), jnp.bfloat16)
    cu = jnp.asarray([0, 8], jnp.int32)
    with pytest.raises(ValueError, match="16-bit|per-sequence lengths"):
        flash_attn_varlen_packed_func(
            q, q, q, cu, cu, 70000, 70000, causal=True
        )


def test_router_falls_back_for_long_sequences():
    """flash_attn_varlen_func with max_seqlen > 65535 must not route to
    the packed path (it would be silently non-causal) — the padded path
    handles it."""
    rng = np.random.default_rng(4)
    # keep actual data tiny; only max_seqlen crosses the limit
    lens = [128, 16, 16, 16]
    h, d = 1, 64
    q, cu, _ = _pack(rng, lens, h, d)
    k, _, _ = _pack(rng, lens, h, d)
    v, _, _ = _pack(rng, lens, h, d)
    out = flash_attn_varlen_func(q, k, v, cu, cu, 70000, 70000, causal=True)
    ref, ref_pt = _ref_per_seq(q, k, v, cu, cu, True)
    check_close(out, ref, ref_pt, atol_floor=8e-3)


def test_packed_matches_padded_on_ragged():
    rng = np.random.default_rng(5)
    lens = [200, 32, 96, 8]
    h, d = 2, 64
    q, cu, _ = _pack(rng, lens, h, d)
    k, _, _ = _pack(rng, lens, h, d)
    v, _, _ = _pack(rng, lens, h, d)
    out_packed = flash_attn_varlen_packed_func(
        q, k, v, cu, cu, max(lens), max(lens), causal=True,
        block_q=128, block_k=128,
    )
    ref, ref_pt = _ref_per_seq(q, k, v, cu, cu, True)
    check_close(out_packed, ref, ref_pt, atol_floor=8e-3)


@pytest.mark.parametrize("causal,softcap", [(True, 0.0), (False, 0.0),
                                            (True, 30.0), (False, 30.0)])
def test_varlen_paged_prefill(causal, softcap):
    """block_table in flash_attn_varlen_func (chunked prefill against a
    paged cache; reference `hopper/flash_api.cpp:673-707`, incl. softcap)."""
    rng = np.random.default_rng(6)
    h, hk, d, page = 4, 2, 64, 64
    lens_q = [48, 96, 17]          # new-chunk lengths
    lens_k = [160, 96, 65]         # total keys (cache incl. the chunk)
    b = len(lens_q)
    npages = 3
    cu_q = jnp.asarray(np.cumsum([0] + lens_q), jnp.int32)
    total_q = sum(lens_q)
    q = jnp.asarray(rng.standard_normal((total_q, h, d)), jnp.bfloat16)

    # linear per-seq K/V, scattered into shuffled pages
    k_lin = [rng.standard_normal((lens_k[i], hk, d)) for i in range(b)]
    v_lin = [rng.standard_normal((lens_k[i], hk, d)) for i in range(b)]
    total_pages = b * npages + 2
    perm = rng.permutation(total_pages)[: b * npages]
    table = jnp.asarray(perm.reshape(b, npages), jnp.int32)
    k_pages = np.zeros((total_pages, page, hk, d), np.float32)
    v_pages = np.zeros((total_pages, page, hk, d), np.float32)
    for i in range(b):
        for j in range(npages):
            lo, hi = j * page, min((j + 1) * page, lens_k[i])
            if lo < lens_k[i]:
                k_pages[perm[i * npages + j], : hi - lo] = k_lin[i][lo:hi]
                v_pages[perm[i * npages + j], : hi - lo] = v_lin[i][lo:hi]
    kq = jnp.asarray(k_pages, jnp.bfloat16)
    vq = jnp.asarray(v_pages, jnp.bfloat16)

    out, lse, s_dmask = flash_attn_varlen_func(
        q, kq, vq, cu_q, None, max(lens_q), max(lens_k),
        causal=causal, softcap=softcap, block_table=table,
        seqused_k=jnp.asarray(lens_k, jnp.int32),
        return_attn_probs=True,
    )
    assert out.shape == (total_q, h, d)
    assert lse.shape == (b, h, max(lens_q)) and s_dmask is None
    assert bool(jnp.all(jnp.isfinite(lse[0, :, : lens_q[0]])))
    # padding rows carry the +inf sentinel (padded-path convention)
    for i in range(b):
        assert bool(jnp.all(jnp.isinf(lse[i, :, lens_q[i]:])))

    # oracle: per-sequence bottom-right-causal attention over the full keys
    cq = np.asarray(cu_q)
    scale = 1.0 / math.sqrt(d)
    for i in range(b):
        qi = q[cq[i]:cq[i + 1]][None]
        ki = jnp.asarray(k_lin[i], jnp.bfloat16)[None]
        vi = jnp.asarray(v_lin[i], jnp.bfloat16)[None]
        ref, _ = attention_ref(qi, ki, vi, causal=causal, softcap=softcap)
        ref_pt, _ = attention_ref(qi, ki, vi, causal=causal, softcap=softcap,
                                  upcast=False, reorder_ops=True)
        check_close(out[cq[i]:cq[i + 1]], ref[0], ref_pt[0],
                    atol_floor=8e-3, label=f"seq{i}")
        # LSE values against an fp32 oracle (guards the right-alignment
        # gather: an off-by-one there shifts whole rows)
        s = np.einsum(
            "qhd,khd->hqk",
            np.asarray(qi[0], np.float32),
            np.asarray(ki[0], np.float32).repeat(h // hk, axis=1),
        ) * scale
        if softcap > 0.0:
            s = np.tanh(s / softcap) * softcap
        if causal:
            row = np.arange(lens_q[i])[:, None] + lens_k[i] - lens_q[i]
            col = np.arange(lens_k[i])[None, :]
            s = np.where(col[None] > row[None], -np.inf, s)
        m = s.max(axis=-1, keepdims=True)
        ref_lse = (np.log(np.exp(s - m).sum(axis=-1)) + m[..., 0])
        np.testing.assert_allclose(
            np.asarray(lse[i, :, : lens_q[i]], np.float32), ref_lse,
            atol=5e-2, rtol=1e-3, err_msg=f"lse seq{i}")
