"""FA3 `qv` argument: scores become Q·Kᵀ + Qv·Vᵀ (reference
`hopper/flash_attn_interface.py:724` qv arg;
`hopper/mainloop_fwd_sm90_tma_gmma_ws.hpp:1147` gemm_qv accumulating
into S; default scale 1/sqrt(d+dv) at `flash_attn_interface.py:276`).

The TPU design folds qv as one bigger MXU matmul [Q|Qv]·[K|V]ᵀ, so the
oracle here computes the un-fused form explicitly in fp32.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import (
    flash_attn_func,
    flash_attn_varlen_func,
    flash_attn_with_kvcache,
)


def _qv_ref(q, k, v, qv, softmax_scale=None, causal=False):
    """fp32 oracle: S = scale*(QKᵀ + QvVᵀ), softmax, @V. MQA/GQA aware."""
    b, sq, h, d = q.shape
    sk, hk, dv = k.shape[1], k.shape[2], v.shape[-1]
    g = h // hk
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d + qv.shape[-1])
    qf = np.asarray(q, np.float32)
    kf = np.repeat(np.asarray(k, np.float32), g, axis=2)
    vf = np.repeat(np.asarray(v, np.float32), g, axis=2)
    qvf = np.asarray(qv, np.float32)
    s = np.einsum("bihd,bjhd->bhij", qf, kf) + np.einsum(
        "bihd,bjhd->bhij", qvf, vf)
    s = s * softmax_scale
    if causal:
        mask = np.tril(np.ones((sq, sk), bool), k=sk - sq)
        s = np.where(mask[None, None], s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhij,bjhd->bihd", p, vf)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("hk", [8, 2])
def test_qv_dense(causal, hk):
    rng = np.random.default_rng(0)
    b, sq, sk, h, d, dv = 2, 128, 128, 8, 64, 64
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, sk, hk, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, sk, hk, dv)), jnp.bfloat16)
    qv = jnp.asarray(rng.standard_normal((b, sq, h, dv)), jnp.bfloat16)
    out = flash_attn_func(q, k, v, causal=causal, qv=qv)
    ref = _qv_ref(q, k, v, qv, causal=causal)
    assert np.allclose(np.asarray(out, np.float32), ref, atol=2e-2), (
        np.abs(np.asarray(out, np.float32) - ref).max())


def test_qv_explicit_scale():
    # A user-provided softmax_scale must be used as-is (not re-defaulted).
    rng = np.random.default_rng(1)
    b, s, h, d = 1, 64, 4, 64
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    qv = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    out = flash_attn_func(q, k, v, softmax_scale=0.05, qv=qv)
    ref = _qv_ref(q, k, v, qv, softmax_scale=0.05)
    assert np.allclose(np.asarray(out, np.float32), ref, atol=2e-2)


def test_qv_grads():
    # Beyond the reference: qv is differentiable (concat vjp).
    rng = np.random.default_rng(2)
    b, s, h, d = 1, 64, 2, 32
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    qv = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32) * 0.3

    def loss(q, k, v, qv):
        return (flash_attn_func(q, k, v, causal=True, qv=qv) ** 2).sum()

    def loss_ref(q, k, v, qv):
        g = h // k.shape[2]
        kf = jnp.repeat(k, g, axis=2)
        vf = jnp.repeat(v, g, axis=2)
        scale = 1.0 / math.sqrt(d + qv.shape[-1])
        s = (jnp.einsum("bihd,bjhd->bhij", q, kf)
             + jnp.einsum("bihd,bjhd->bhij", qv, vf)) * scale
        mask = jnp.tril(jnp.ones((s.shape[-2], s.shape[-1]), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return (jnp.einsum("bhij,bjhd->bihd", p, vf) ** 2).sum()

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, qv)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, qv)
    for g1, g2, name in zip(grads, grads_ref, "q k v qv".split()):
        assert np.allclose(np.asarray(g1), np.asarray(g2),
                           atol=1e-3, rtol=1e-3), name


def test_qv_varlen():
    rng = np.random.default_rng(3)
    h, d = 4, 64
    lens = [37, 128, 5]
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    tot = int(cu[-1])
    q = jnp.asarray(rng.standard_normal((tot, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((tot, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((tot, h, d)), jnp.bfloat16)
    qv = jnp.asarray(rng.standard_normal((tot, h, d)), jnp.bfloat16)
    out = flash_attn_varlen_func(
        q, k, v, cu, cu, max(lens), max(lens), causal=True, qv=qv)
    out = np.asarray(out, np.float32)
    for i, L in enumerate(lens):
        sl = slice(int(cu[i]), int(cu[i + 1]))
        ref = _qv_ref(q[None, sl], k[None, sl], v[None, sl], qv[None, sl],
                      causal=True)[0]
        assert np.allclose(out[sl], ref, atol=2e-2), f"seq {i}"


def test_qv_kvcache():
    rng = np.random.default_rng(4)
    b, sq, h, hk, d, smax = 2, 1, 8, 2, 64, 192
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((b, smax, hk, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((b, smax, hk, d)), jnp.bfloat16)
    qv = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    lens = jnp.asarray([67, 150], jnp.int32)
    out = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=lens, causal=True, qv=qv)
    out = np.asarray(out, np.float32)
    for i in range(b):
        L = int(lens[i])
        ref = _qv_ref(q[i:i + 1], kc[i:i + 1, :L], vc[i:i + 1, :L],
                      qv[i:i + 1], causal=True)[0]
        assert np.allclose(out[i], ref, atol=2e-2), f"batch {i}"


def test_qv_kvcache_int8():
    """MLA qv + quantised (int8) KV cache in one path (reference:
    `hopper/flash_api.cpp:673` — qv through the same kvcache dispatch).
    The V half's descale mismatch folds into Qv (see flash_decode.py);
    oracle = dequantised-cache run of the same qv path."""
    rng = np.random.default_rng(11)
    b, sq, h, hk, d, smax = 2, 1, 8, 2, 64, 192
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((b, smax, hk, d)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, smax, hk, d)), jnp.float32)
    qv = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    lens = jnp.asarray([67, 150], jnp.int32)

    def quant(x, spread):
        # deliberately different k/v magnitudes so kd != vd exercises the
        # Qv rescale
        x = x * spread
        amax = jnp.max(jnp.abs(x), axis=(1, 3))
        scale = jnp.maximum(amax, 1e-9) / 127.0
        xq = jnp.clip(jnp.round(x / scale[:, None, :, None]),
                      -127, 127).astype(jnp.int8)
        return xq, scale.astype(jnp.float32)

    # spread on K (not V): kd != vd exercises the Qv rescale without
    # amplifying the PV probability-quantisation noise by |v|
    kq, kd = quant(kc, 3.0)
    vq, vd = quant(vc, 1.0)
    out_i8 = flash_attn_with_kvcache(
        q, kq, vq, cache_seqlens=lens, causal=True, qv=qv,
        k_descale=kd, v_descale=vd)
    kcd = (kq.astype(jnp.float32) * kd[:, None, :, None]).astype(jnp.bfloat16)
    vcd = (vq.astype(jnp.float32) * vd[:, None, :, None]).astype(jnp.bfloat16)
    out_ref = flash_attn_with_kvcache(
        q, kcd, vcd, cache_seqlens=lens, causal=True, qv=qv)
    err = float(jnp.abs(out_i8.astype(jnp.float32)
                        - out_ref.astype(jnp.float32)).max())
    assert err < 6e-2, err
    # and against the fp32 un-fused oracle
    for i in range(b):
        L = int(lens[i])
        ref = _qv_ref(q[i:i + 1], kcd[i:i + 1, :L], vcd[i:i + 1, :L],
                      qv[i:i + 1], causal=True)[0]
        assert np.allclose(np.asarray(out_i8, np.float32)[i], ref,
                           atol=8e-2), f"batch {i}"
