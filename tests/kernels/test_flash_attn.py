"""Kernel unit tests vs the fp32 oracle.

Model: reference `tests/test_flash_attn.py` (e.g. `test_flash_attn_output:943`,
`test_flash_attn_varlen_output:1172`, `test_flash_attn_race_condition:2199`).
Acceptance: kernel error <= 2x the error of the same computation run in low
precision through plain einsum attention ("pt" reference), plus grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_func, flash_attn_qkvpacked_func, flash_attn_varlen_func
from flash_attn_tpu.utils.testing import (
    attention_ref,
    attn_bias_from_alibi_slopes,
    check_close,
    generate_qkv,
    generate_random_padding_mask,
)


def make_qkv(b, sq, sk, h, hk, d, dtype, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, sk, hk, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, sk, hk, d)), dtype)
    return q, k, v


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "sq,sk", [(128, 128), (128, 256), (256, 128), (113, 203), (208, 1)][:4]
)
@pytest.mark.parametrize("d", [64, 128])
def test_flash_attn_output(sq, sk, d, causal, dtype):
    b, h, hk = 2, 4, 4
    q, k, v = make_qkv(b, sq, sk, h, hk, d, dtype)
    out = flash_attn_func(q, k, v, causal=causal)
    out_ref, _ = attention_ref(q, k, v, causal=causal)
    out_pt, _ = attention_ref(q, k, v, causal=causal, upcast=False, reorder_ops=True)
    check_close(out, out_ref, out_pt)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("local", [False, True])
def test_flash_attn_gqa(causal, local):
    b, h, hk, sq, sk, d = 2, 8, 2, 192, 256, 64
    window = (37, 13) if local else (-1, -1)
    q, k, v = make_qkv(b, sq, sk, h, hk, d, jnp.bfloat16)
    out = flash_attn_func(q, k, v, causal=causal, window_size=window)
    out_ref, _ = attention_ref(q, k, v, causal=causal, window_size=window)
    out_pt, _ = attention_ref(
        q, k, v, causal=causal, window_size=window, upcast=False, reorder_ops=True
    )
    check_close(out, out_ref, out_pt)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_alibi(causal):
    b, h, hk, sq, sk, d = 2, 4, 4, 160, 160, 64
    q, k, v = make_qkv(b, sq, sk, h, hk, d, jnp.bfloat16)
    rng = np.random.default_rng(1)
    slopes = jnp.asarray(rng.random((b, h)) * 0.3, jnp.float32)
    bias = attn_bias_from_alibi_slopes(slopes, sq, sk, causal=causal)
    out = flash_attn_func(q, k, v, causal=causal, alibi_slopes=slopes)
    out_ref, _ = attention_ref(q, k, v, attn_bias=bias, causal=causal)
    out_pt, _ = attention_ref(
        q, k, v, attn_bias=bias, causal=causal, upcast=False, reorder_ops=True
    )
    check_close(out, out_ref, out_pt)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_softcap(causal):
    b, h, hk, sq, sk, d = 2, 4, 4, 192, 192, 64
    softcap = 30.0
    q, k, v = make_qkv(b, sq, sk, h, hk, d, jnp.bfloat16)
    out = flash_attn_func(q, k, v, causal=causal, softcap=softcap)
    out_ref, _ = attention_ref(q, k, v, causal=causal, softcap=softcap)
    out_pt, _ = attention_ref(
        q, k, v, causal=causal, softcap=softcap, upcast=False, reorder_ops=True
    )
    check_close(out, out_ref, out_pt)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("d", [64, 128])
def test_flash_attn_backward(causal, d):
    b, h, hk, sq, sk = 2, 4, 2, 160, 192
    q, k, v = make_qkv(b, sq, sk, h, hk, d, jnp.bfloat16, seed=3)
    g = jnp.asarray(
        np.random.default_rng(4).standard_normal((b, sq, h, d)), jnp.bfloat16
    )

    def loss_flash(q, k, v):
        return jnp.sum(flash_attn_func(q, k, v, causal=causal).astype(jnp.float32)
                       * g.astype(jnp.float32))

    def loss_ref(q, k, v, upcast=True, reorder_ops=False):
        out, _ = attention_ref(q, k, v, causal=causal, upcast=upcast,
                               reorder_ops=reorder_ops)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    dq, dk, dv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    dq_ref, dk_ref, dv_ref = jax.grad(
        lambda *a: loss_ref(*a), argnums=(0, 1, 2)
    )(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    dq_pt, dk_pt, dv_pt = jax.grad(
        lambda *a: loss_ref(*a, upcast=False, reorder_ops=True), argnums=(0, 1, 2)
    )(q, k, v)
    check_close(dq, dq_ref, dq_pt, label="dq")
    check_close(dk, dk_ref, dk_pt, label="dk")
    check_close(dv, dv_ref, dv_pt, label="dv")


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_backward_alibi_softcap(causal):
    b, h, hk, sq, sk, d = 1, 4, 4, 128, 160, 64
    q, k, v = make_qkv(b, sq, sk, h, hk, d, jnp.bfloat16, seed=5)
    rng = np.random.default_rng(6)
    slopes = jnp.asarray(rng.random((b, h)) * 0.3, jnp.float32)
    bias = attn_bias_from_alibi_slopes(slopes, sq, sk, causal=causal)
    g = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    softcap = 25.0

    def loss_flash(q, k, v):
        out = flash_attn_func(
            q, k, v, causal=causal, alibi_slopes=slopes, softcap=softcap
        )
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    def loss_ref(q, k, v, upcast=True, reorder_ops=False):
        out, _ = attention_ref(
            q, k, v, attn_bias=bias, causal=causal, softcap=softcap,
            upcast=upcast, reorder_ops=reorder_ops,
        )
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    dq, dk, dv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    dq_ref, dk_ref, dv_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    dq_pt, dk_pt, dv_pt = jax.grad(
        lambda *a: loss_ref(*a, upcast=False, reorder_ops=True), argnums=(0, 1, 2)
    )(q, k, v)
    check_close(dq, dq_ref, dq_pt, label="dq")
    check_close(dk, dk_ref, dk_pt, label="dk")
    check_close(dv, dv_ref, dv_pt, label="dv")


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_varlen_output(causal):
    b, h, hk, sq, sk, d = 3, 4, 2, 130, 171, 64
    q, k, v = make_qkv(b, sq, sk, h, hk, d, jnp.bfloat16, seed=7)
    rng = np.random.default_rng(8)
    query_padding_mask = generate_random_padding_mask(sq, b, mode="random", rng=rng)
    key_padding_mask = generate_random_padding_mask(sk, b, mode="random", rng=rng)
    (
        q_unpad, k_unpad, v_unpad, cu_q, cu_k, seqused_q, seqused_k,
        max_sq, max_sk, output_pad_fn,
    ) = generate_qkv(q, k, v, query_padding_mask, key_padding_mask)
    out_unpad = flash_attn_varlen_func(
        q_unpad, k_unpad, v_unpad, cu_q, cu_k, max_sq, max_sk, causal=causal
    )
    out = output_pad_fn(out_unpad)
    out_ref, _ = attention_ref(
        q, k, v, query_padding_mask, key_padding_mask, causal=causal
    )
    out_pt, _ = attention_ref(
        q, k, v, query_padding_mask, key_padding_mask, causal=causal,
        upcast=False, reorder_ops=True,
    )
    check_close(out, out_ref, out_pt)


def test_flash_attn_varlen_backward():
    b, h, hk, sq, sk, d, causal = 2, 4, 4, 120, 140, 64, True
    q, k, v = make_qkv(b, sq, sk, h, hk, d, jnp.bfloat16, seed=9)
    rng = np.random.default_rng(10)
    query_padding_mask = generate_random_padding_mask(sq, b, mode="third", rng=rng)
    key_padding_mask = generate_random_padding_mask(sk, b, mode="third", rng=rng)
    (
        q_unpad, k_unpad, v_unpad, cu_q, cu_k, _, _, max_sq, max_sk, output_pad_fn,
    ) = generate_qkv(q, k, v, query_padding_mask, key_padding_mask)
    g_unpad = jnp.asarray(
        rng.standard_normal(q_unpad.shape), jnp.bfloat16
    )

    def loss_flash(qu, ku, vu):
        out = flash_attn_varlen_func(qu, ku, vu, cu_q, cu_k, max_sq, max_sk,
                                     causal=causal)
        return jnp.sum(out.astype(jnp.float32) * g_unpad.astype(jnp.float32))

    dq_u, dk_u, dv_u = jax.grad(loss_flash, argnums=(0, 1, 2))(
        q_unpad, k_unpad, v_unpad
    )
    assert not bool(jnp.any(jnp.isnan(dq_u)))
    assert not bool(jnp.any(jnp.isnan(dk_u)))

    # Dense-path padded reference for the same loss.
    g_pad = output_pad_fn(g_unpad)

    def loss_ref(q, k, v, upcast=True, reorder_ops=False):
        out, _ = attention_ref(
            q, k, v, query_padding_mask, key_padding_mask, causal=causal,
            upcast=upcast, reorder_ops=reorder_ops,
        )
        return jnp.sum(out.astype(jnp.float32) * g_pad.astype(jnp.float32))

    dq_ref, dk_ref, dv_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    dq_pt, dk_pt, dv_pt = jax.grad(
        lambda *a: loss_ref(*a, upcast=False, reorder_ops=True), argnums=(0, 1, 2)
    )(q, k, v)

    from flash_attn_tpu.utils.padding import pad_input

    # Repad kernel grads into dense layout; re-derive indices from masks.
    qmask = np.asarray(query_padding_mask)
    kmask = np.asarray(key_padding_mask)
    idx_q = jnp.asarray(np.nonzero(qmask.reshape(-1))[0], jnp.int32)
    idx_k = jnp.asarray(np.nonzero(kmask.reshape(-1))[0], jnp.int32)
    dq = pad_input(dq_u, idx_q, b, sq)
    dk = pad_input(dk_u, idx_k, b, sk)
    dv = pad_input(dv_u, idx_k, b, sk)
    # The reference grads are already zero in padded positions.
    check_close(dq, dq_ref, dq_pt, label="dq")
    check_close(dk, dk_ref, dk_pt, label="dk")
    check_close(dv, dv_ref, dv_pt, label="dv")


def test_flash_attn_qkvpacked():
    b, s, h, d = 2, 160, 4, 64
    rng = np.random.default_rng(11)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3, h, d)), jnp.bfloat16)
    out = flash_attn_qkvpacked_func(qkv, causal=True)
    out_ref, _ = attention_ref(
        qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], causal=True
    )
    out_pt, _ = attention_ref(
        qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], causal=True,
        upcast=False, reorder_ops=True,
    )
    check_close(out, out_ref, out_pt)


def test_flash_attn_deterministic():
    """Bitwise determinism across runs (reference
    `test_flash_attn_race_condition:2199` runs 30x; our kernels have no
    atomics so 3x suffices to catch scheduling nondeterminism)."""
    b, h, sq, sk, d = 2, 4, 256, 256, 64
    q, k, v = make_qkv(b, sq, sk, h, h, d, jnp.bfloat16, seed=12)
    g = jnp.asarray(np.random.default_rng(13).standard_normal((b, sq, h, d)),
                    jnp.bfloat16)

    def run():
        def loss(q, k, v):
            return jnp.sum(
                flash_attn_func(q, k, v, causal=True).astype(jnp.float32)
                * g.astype(jnp.float32)
            )
        out = flash_attn_func(q, k, v, causal=True)
        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return out, grads

    out0, grads0 = run()
    for _ in range(2):
        out, grads = run()
        assert bool(jnp.all(out == out0))
        for a, b_ in zip(grads, grads0):
            assert bool(jnp.all(a == b_))


def test_flash_attn_seqlen_one():
    """Decode-shaped dense call (sq=1)."""
    b, h, hk, sk, d = 2, 8, 2, 257, 64
    q, k, v = make_qkv(b, 1, sk, h, hk, d, jnp.bfloat16, seed=14)
    out = flash_attn_func(q, k, v, causal=True)
    out_ref, _ = attention_ref(q, k, v, causal=True)
    out_pt, _ = attention_ref(q, k, v, causal=True, upcast=False, reorder_ops=True)
    check_close(out, out_ref, out_pt)


def _quantize_e4m3(x, axis_head):
    """Per-(batch, head) symmetric quantisation to float8_e4m3fn.

    Returns (x_fp8, descale) with descale shaped (b, h) — the FA3 FP8
    calling convention (`hopper/flash_api.cpp:694-696`).
    """
    amax = jnp.max(jnp.abs(x), axis=tuple(
        i for i in range(x.ndim) if i not in (0, axis_head)
    ))
    scale = 448.0 / jnp.maximum(amax, 1e-12)  # e4m3 max normal = 448
    shape = [1] * x.ndim
    shape[0], shape[axis_head] = x.shape[0], x.shape[axis_head]
    xq = (x * scale.reshape(shape)).astype(jnp.float8_e4m3fn)
    return xq, (1.0 / scale).astype(jnp.float32)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("d", [64, 128])
def test_flash_attn_fp8(d, causal):
    """FP8 fwd with per-head descale (reference FP8 gate:
    `hopper/test_flash_attn.py` fp8 parametrisation — output compared to the
    fp32 oracle run on the dequantised inputs, tolerance relative to the
    quantisation-induced error)."""
    b, h, hk, sq, sk = 2, 8, 4, 256, 288
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, sk, hk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, sk, hk, d)), jnp.float32)
    # GQA: q descale must be per kv-head -> quantise q per kv-head group
    qg = q.reshape(b, sq, hk, h // hk * d)
    qq, q_descale = _quantize_e4m3(qg, 2)
    qq = qq.reshape(b, sq, h, d)
    kq, k_descale = _quantize_e4m3(k, 2)
    vq, v_descale = _quantize_e4m3(v, 2)

    out = flash_attn_func(
        qq, kq, vq, causal=causal,
        q_descale=q_descale, k_descale=k_descale, v_descale=v_descale,
    )
    assert out.dtype == jnp.bfloat16

    # Oracle on the dequantised values (exactly what the kernel sees).
    qd = qq.astype(jnp.float32) * jnp.repeat(q_descale, h // hk, 1)[:, None, :, None]
    kd = kq.astype(jnp.float32) * k_descale[:, None, :, None]
    vd = vq.astype(jnp.float32) * v_descale[:, None, :, None]
    out_ref, _ = attention_ref(qd, kd, vd, causal=causal)
    out_pt, _ = attention_ref(
        qd.astype(jnp.bfloat16), kd.astype(jnp.bfloat16),
        vd.astype(jnp.bfloat16), causal=causal, upcast=False, reorder_ops=True,
    )
    check_close(out, out_ref, out_pt)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_mla_headdims(causal):
    """hdim_qk != hdim_v (DeepSeek/MLA shapes; FA3 hdim_v support,
    `hopper/flash_api.cpp:673`, cute `(192, 128)` Blackwell shape)."""
    b, h, hk, sq, sk = 2, 4, 2, 224, 256
    d, dv = 192, 128
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, sk, hk, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, sk, hk, dv)), jnp.bfloat16)
    out = flash_attn_func(q, k, v, causal=causal)
    assert out.shape == (b, sq, h, dv)
    out_ref, _ = attention_ref(q, k, v, causal=causal)
    out_pt, _ = attention_ref(q, k, v, causal=causal, upcast=False,
                              reorder_ops=True)
    check_close(out, out_ref, out_pt)

    # grads
    g = jnp.asarray(rng.standard_normal(out.shape), out.dtype)

    def lf(q, k, v):
        o = flash_attn_func(q, k, v, causal=causal)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    def lr(q, k, v, up=True, ro=False):
        o = attention_ref(q, k, v, causal=causal, upcast=up, reorder_ops=ro)[0]
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    df = jax.grad(lf, (0, 1, 2))(q, k, v)
    dr = jax.grad(lr, (0, 1, 2))(q, k, v)
    dp = jax.grad(lambda q, k, v: lr(q, k, v, up=False, ro=True), (0, 1, 2))(q, k, v)
    for a, r, p in zip(df, dr, dp):
        check_close(a, r, p)


def test_flash_attn_sinks():
    """Learnable attention sink joins the softmax denominator
    (`cute/interface.py:1149`)."""
    from flash_attn_tpu.kernels.flash_fwd import flash_attn_fwd_bhsd

    b, h, s, d = 2, 4, 192, 64
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    sinks = jnp.asarray(rng.standard_normal(h), jnp.float32)
    su = jnp.full((b,), s, jnp.int32)
    scale = d ** -0.5

    for causal in (False, True):
        o, lse = flash_attn_fwd_bhsd(
            q, k, v, su, su, softmax_scale=scale, causal=causal, sinks=sinks
        )
        # reference: append a virtual logit column = sink, no value
        sc = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
        if causal:
            mask = jnp.tril(jnp.ones((s, s), bool))
            sc = jnp.where(mask, sc, -jnp.inf)
        sc_aug = jnp.concatenate(
            [sc, jnp.broadcast_to(sinks[None, :, None, None], (b, h, s, 1))],
            axis=-1,
        )
        p_aug = jax.nn.softmax(sc_aug, axis=-1)
        o_ref = jnp.einsum("bhqk,bhkd->bhqd", p_aug[..., :-1],
                           v.astype(jnp.float32))
        lse_ref = jax.nn.logsumexp(sc_aug, axis=-1)
        assert float(jnp.abs(o.astype(jnp.float32) - o_ref).max()) < 2e-2
        assert float(jnp.abs(lse - lse_ref).max()) < 5e-3


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_dropout(causal):
    """Kernel dropout must equal a dense reference using the *same*
    counter-based keep mask — exact, not statistical (reference pattern:
    `tests/test_flash_attn.py` extracts S_dmask and rebuilds the mask)."""
    from flash_attn_tpu.kernels.flash_fwd import dropout_keep

    b, h, sq, sk, d = 2, 3, 192, 224, 64
    p_drop, seed = 0.3, 1234
    q, k, v = make_qkv(b, sq, sk, h, h, d, jnp.bfloat16, seed=9)

    out = flash_attn_func(q, k, v, dropout_p=p_drop, causal=causal,
                          dropout_seed=seed)

    # rebuild the exact keep mask
    rows = jnp.arange(sq, dtype=jnp.int32)[:, None]
    cols = jnp.arange(sk, dtype=jnp.int32)[None, :]
    keep = jnp.stack([
        jnp.stack([
            dropout_keep(jnp.int32(seed), jnp.int32(b_), jnp.int32(h_),
                         rows, cols, p_drop)
            for h_ in range(h)
        ])
        for b_ in range(b)
    ])  # (b, h, sq, sk)

    def dense(q, k, v, dtype):
        qf, kf, vf = (x.astype(dtype) for x in (q, k, v))
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * (d ** -0.5)
        if causal:
            m = (cols - (sk - sq)) <= rows
            s = jnp.where(m, s, -jnp.inf)
        pm = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        pd = jnp.where(keep, pm, 0.0) / (1.0 - p_drop)
        return jnp.einsum("bhqk,bkhd->bqhd", pd.astype(dtype), vf)

    out_ref = dense(q, k, v, jnp.float32)
    out_pt = dense(q, k, v, jnp.bfloat16)
    check_close(out, out_ref, out_pt)

    # determinism: same seed -> bitwise equal; different seed -> different
    out2 = flash_attn_func(q, k, v, dropout_p=p_drop, causal=causal,
                           dropout_seed=seed)
    assert jnp.array_equal(out, out2)
    out3 = flash_attn_func(q, k, v, dropout_p=p_drop, causal=causal,
                           dropout_seed=seed + 1)
    assert not jnp.array_equal(out, out3)

    # grads vs the same-mask dense reference
    g = jnp.asarray(np.random.default_rng(3).standard_normal(out.shape),
                    out.dtype)

    def lf(q, k, v):
        o = flash_attn_func(q, k, v, dropout_p=p_drop, causal=causal,
                            dropout_seed=seed)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    def lr(q, k, v, dtype=jnp.float32):
        return jnp.sum(dense(q, k, v, dtype).astype(jnp.float32)
                       * g.astype(jnp.float32))

    df = jax.grad(lf, (0, 1, 2))(q, k, v)
    dr = jax.grad(lr, (0, 1, 2))(q, k, v)
    dp_ = jax.grad(lambda q, k, v: lr(q, k, v, jnp.bfloat16), (0, 1, 2))(q, k, v)
    for a, r, pt in zip(df, dr, dp_):
        check_close(a, r, pt)


def test_flash_attn_attention_chunk():
    """Chunked attention (`hopper/flash_api.cpp:701` attention_chunk):
    each query attends only within its own chunk, combined with causal."""
    b, h, sq, sk, d, chunk = 2, 4, 256, 256, 64, 64
    q, k, v = make_qkv(b, sq, sk, h, h, d, jnp.bfloat16, seed=13)
    out = flash_attn_func(q, k, v, causal=True, attention_chunk=chunk)
    qi = jnp.arange(sq)[:, None]
    ki = jnp.arange(sk)[None, :]
    keep = (ki <= qi) & (ki // chunk == qi // chunk)
    bias = jnp.where(keep, 0.0, -jnp.inf)
    out_ref, _ = attention_ref(q, k, v, attn_bias=bias)
    out_pt, _ = attention_ref(q, k, v, attn_bias=bias, upcast=False,
                              reorder_ops=True)
    check_close(out, out_ref, out_pt)

    # grads
    g = jnp.asarray(np.random.default_rng(14).standard_normal(out.shape),
                    out.dtype)

    def lf(q, k, v):
        o = flash_attn_func(q, k, v, causal=True, attention_chunk=chunk)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    def lr(q, k, v, up=True, ro=False):
        o = attention_ref(q, k, v, attn_bias=bias, upcast=up,
                          reorder_ops=ro)[0]
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    df = jax.grad(lf, (0, 1, 2))(q, k, v)
    dr = jax.grad(lr, (0, 1, 2))(q, k, v)
    dp = jax.grad(lambda q, k, v: lr(q, k, v, False, True), (0, 1, 2))(q, k, v)
    for a, r, pt in zip(df, dr, dp):
        check_close(a, r, pt)


def test_kvcache_attention_chunk():
    from flash_attn_tpu import flash_attn_with_kvcache

    b, h, d, cache, chunk = 2, 4, 64, 512, 128
    rng = np.random.default_rng(15)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((b, cache, h, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((b, cache, h, d)), jnp.bfloat16)
    lens = jnp.asarray([cache, cache - 100], jnp.int32)
    out = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=lens, causal=True,
                                  attention_chunk=chunk)
    # oracle: query position is lens-1; attends [pos//chunk*chunk, pos]
    for bi in range(b):
        pos = int(lens[bi]) - 1
        lo = pos // chunk * chunk
        sc = jnp.einsum("hd,khd->hk",
                        q[bi, 0].astype(jnp.float32),
                        kc[bi, lo:pos + 1].astype(jnp.float32)) * d ** -0.5
        p_ = jax.nn.softmax(sc, -1)
        ref = jnp.einsum("hk,khd->hd", p_, vc[bi, lo:pos + 1].astype(jnp.float32))
        err = float(jnp.abs(out[bi, 0].astype(jnp.float32) - ref).max())
        assert err < 2e-2, (bi, err)


def test_flash_attn_sinks_grad():
    """Gradients flow to q/k/v AND the learnable sink logits."""
    b, h, s, d = 2, 4, 128, 64
    rng = np.random.default_rng(16)
    q, k, v = make_qkv(b, s, s, h, h, d, jnp.bfloat16, seed=16)
    sinks = jnp.asarray(rng.standard_normal(h), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)

    def lf(q, k, v, sinks):
        o = flash_attn_func(q, k, v, causal=True, sinks=sinks)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    def lr(q, k, v, sinks):
        sc = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * d ** -0.5
        mask = jnp.tril(jnp.ones((s, s), bool))
        sc = jnp.where(mask, sc, -jnp.inf)
        sc_aug = jnp.concatenate(
            [sc, jnp.broadcast_to(sinks[None, :, None, None], (b, h, s, 1))],
            axis=-1)
        p_ = jax.nn.softmax(sc_aug, -1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p_[..., :-1], v.astype(jnp.float32))
        return jnp.sum(o * g.astype(jnp.float32))

    df = jax.grad(lf, (0, 1, 2, 3))(q, k, v, sinks)
    dr = jax.grad(lr, (0, 1, 2, 3))(q, k, v, sinks)
    for name, a, r in zip(["dq", "dk", "dv", "dsinks"], df, dr):
        err = float(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)).max())
        scale = float(jnp.abs(r.astype(jnp.float32)).max()) + 1e-6
        assert err / scale < 0.05, (name, err, scale)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_varlen_packed(causal):
    """True-packed varlen (no padding/gather) must match the padded varlen
    path and the oracle (reference `block_info.h:13` role)."""
    from flash_attn_tpu.kernels.varlen_packed import (
        flash_attn_varlen_packed_func,
    )

    b, h, hk, sq, sk, d = 3, 4, 2, 130, 171, 64
    q, k, v = make_qkv(b, sq, sk, h, hk, d, jnp.bfloat16, seed=31)
    rng = np.random.default_rng(32)
    query_padding_mask = generate_random_padding_mask(sq, b, mode="random", rng=rng)
    key_padding_mask = generate_random_padding_mask(sk, b, mode="random", rng=rng)
    (
        q_unpad, k_unpad, v_unpad, cu_q, cu_k, seqused_q, seqused_k,
        max_sq, max_sk, output_pad_fn,
    ) = generate_qkv(q, k, v, query_padding_mask, key_padding_mask)

    out_unpad = flash_attn_varlen_packed_func(
        q_unpad, k_unpad, v_unpad, cu_q, cu_k, causal=causal,
        block_q=128, block_k=128,
    )
    out = output_pad_fn(out_unpad)
    out_ref, _ = attention_ref(
        q, k, v, query_padding_mask, key_padding_mask, causal=causal
    )
    out_pt, _ = attention_ref(
        q, k, v, query_padding_mask, key_padding_mask, causal=causal,
        upcast=False, reorder_ops=True,
    )
    check_close(out, out_ref, out_pt)

    # grads flow through the packed path
    g = jnp.asarray(rng.standard_normal(q_unpad.shape), q_unpad.dtype)

    def lf(qu, ku, vu):
        o = flash_attn_varlen_packed_func(
            qu, ku, vu, cu_q, cu_k, causal=causal, block_q=128, block_k=128)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    dq, dk, dv = jax.grad(lf, (0, 1, 2))(q_unpad, k_unpad, v_unpad)
    assert all(bool(jnp.all(jnp.isfinite(x.astype(jnp.float32))))
               for x in (dq, dk, dv))


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_s_dmask(causal):
    """`return_attn_probs` S_dmask (reference FA2 debug return,
    `flash_attn_interface.py:474`): kept entries P/(1-p), dropped -P.
    Validates (a) the encoding recovers the exact keep mask, (b) the
    dropout fraction is statistically right (reference
    `tests/test_flash_attn.py` dropout-fraction checks), and (c) the
    kernel output equals S_dmask's non-negative part @ V."""
    b, h, sq, sk, d = 2, 3, 192, 224, 64
    p_drop, seed = 0.25, 77
    q, k, v = make_qkv(b, sq, sk, h, h, d, jnp.bfloat16, seed=11)

    out, lse, s_dmask = flash_attn_func(
        q, k, v, dropout_p=p_drop, causal=causal, dropout_seed=seed,
        return_attn_probs=True)
    assert s_dmask is not None and s_dmask.shape == (b, h, sq, sk)

    rows = jnp.arange(sq, dtype=jnp.int32)[:, None]
    cols = jnp.arange(sk, dtype=jnp.int32)[None, :]
    valid = jnp.ones((sq, sk), bool)
    if causal:
        valid = (cols - (sk - sq)) <= rows
    # (b) dropout fraction among in-mask entries with nonzero P
    nz = jnp.abs(s_dmask) > 0
    dropped = (s_dmask < 0) & valid[None, None]
    frac = float(dropped.sum() / (nz | dropped)[..., valid].sum())
    assert abs(frac - p_drop) < 0.03, frac

    # (c) out == relu(S_dmask) @ v
    p_d = jnp.maximum(s_dmask, 0.0)
    out_ref = jnp.einsum("bhqk,bkhd->bqhd", p_d,
                         v.astype(jnp.float32))
    assert float(jnp.abs(out.astype(jnp.float32) - out_ref).max()) < 2e-2

    # (a) keep mask from the encoding matches dropout_keep exactly
    from flash_attn_tpu.kernels.flash_fwd import dropout_keep
    keep_hash = dropout_keep(
        jnp.int32(seed),
        jnp.arange(b, dtype=jnp.int32)[:, None, None, None],
        jnp.arange(h, dtype=jnp.int32)[None, :, None, None],
        rows[None, None], cols[None, None], p_drop)
    has_p = jnp.abs(s_dmask) > 1e-9
    enc_keep = s_dmask > 0
    assert bool(jnp.all(jnp.where(has_p, enc_keep == keep_hash, True)))


@pytest.mark.parametrize("causal,window", [
    (True, (-1, -1)), (True, (128, -1)), (False, (192, 0))])
@pytest.mark.parametrize("with_sinks", [False, True])
def test_flash_attn_causal_split(causal, window, with_sinks):
    """Interior/diagonal split-call path (`_build_split_schedules` +
    split-KV combine merge) vs the single scheduled call and the oracle.
    The reference analogue is the masked/unmasked mainloop specialisation
    (`csrc/flash_attn/src/flash_fwd_kernel.h:52` n_masking_steps)."""
    from flash_attn_tpu.kernels.flash_fwd import flash_attn_fwd_bhsd

    b, h, hk, s, d = 2, 8, 2, 640, 64
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, hk, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, hk, s, d)), jnp.bfloat16)
    su = jnp.full((b,), s, jnp.int32)
    sinks = (jnp.asarray(rng.standard_normal((h,)), jnp.float32)
             if with_sinks else None)
    kw = dict(softmax_scale=d ** -0.5, causal=causal, window_size=window,
              full_lengths=True, sinks=sinks,
              block_q=256, block_k=512, block_h=2)
    o0, l0 = flash_attn_fwd_bhsd(q, k, v, su, su, **kw)
    o1, l1 = flash_attn_fwd_bhsd(q, k, v, su, su, split_diag=(128, 4), **kw)
    assert float(jnp.max(jnp.abs(
        o0.astype(jnp.float32) - o1.astype(jnp.float32)))) < 2e-2
    lmask = jnp.where(jnp.isinf(l0) & jnp.isinf(l1), 0.0, jnp.abs(l0 - l1))
    assert float(jnp.max(lmask)) < 1e-3
