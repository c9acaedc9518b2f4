"""KV-cache decode tests (model: reference `tests/test_flash_attn.py:1907`
`test_flash_attn_kvcache` — append, rotary, paged, leftpad, batch_idx,
split-KV)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_with_kvcache
from flash_attn_tpu.kernels.flash_decode import _apply_rotary
from flash_attn_tpu.utils.testing import attention_ref, check_close


def setup(b=2, h=8, hk=2, d=64, smax=256, sq=1, seed=0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), dtype)
    k_cache = jnp.asarray(rng.standard_normal((b, smax, hk, d)), dtype)
    v_cache = jnp.asarray(rng.standard_normal((b, smax, hk, d)), dtype)
    cache_seqlens = jnp.asarray(
        rng.integers(16, smax - sq - 1, (b,)), jnp.int32
    )
    knew = jnp.asarray(rng.standard_normal((b, sq, hk, d)), dtype)
    vnew = jnp.asarray(rng.standard_normal((b, sq, hk, d)), dtype)
    return rng, q, k_cache, v_cache, cache_seqlens, knew, vnew


def ref_decode(q, k_cache, v_cache, cache_seqlens, knew=None, vnew=None,
               causal=True, window_size=(-1, -1)):
    b, smax = k_cache.shape[0], k_cache.shape[1]
    kfull, vfull = k_cache, v_cache
    lens = np.asarray(cache_seqlens)
    if knew is not None:
        kfull = np.asarray(kfull).copy()
        vfull = np.asarray(vfull).copy()
        for i in range(b):
            kfull[i, lens[i]:lens[i] + knew.shape[1]] = np.asarray(knew[i])
            vfull[i, lens[i]:lens[i] + vnew.shape[1]] = np.asarray(vnew[i])
        kfull, vfull = jnp.asarray(kfull), jnp.asarray(vfull)
        lens = lens + knew.shape[1]
    mask = jnp.asarray(np.arange(smax)[None, :] < lens[:, None])
    out_ref, _ = attention_ref(q, kfull, vfull, None, mask, causal=causal,
                               window_size=window_size)
    out_pt, _ = attention_ref(q, kfull, vfull, None, mask, causal=causal,
                              window_size=window_size, upcast=False,
                              reorder_ops=True)
    return out_ref, out_pt


@pytest.mark.parametrize("sq", [1, 4])
@pytest.mark.parametrize("causal", [True, False])
def test_kvcache_basic(sq, causal):
    _, q, kc, vc, lens, _, _ = setup(sq=sq)
    out = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=lens, causal=causal)
    out_ref, out_pt = ref_decode(q, kc, vc, lens, causal=causal)
    check_close(out, out_ref, out_pt)


def test_kvcache_append():
    _, q, kc, vc, lens, knew, vnew = setup(sq=3)
    out, (kc2, vc2) = flash_attn_with_kvcache(
        q, kc, vc, knew, vnew, cache_seqlens=lens, causal=True,
        return_updated_cache=True,
    )
    out_ref, out_pt = ref_decode(q, kc, vc, lens, knew, vnew, causal=True)
    check_close(out, out_ref, out_pt)
    # cache rows actually updated
    lens_np = np.asarray(lens)
    for i in range(q.shape[0]):
        got = np.asarray(kc2[i, lens_np[i]:lens_np[i] + 3])
        np.testing.assert_array_equal(got, np.asarray(knew[i]))


def test_kvcache_window():
    _, q, kc, vc, lens, _, _ = setup(sq=1)
    out = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=lens, causal=True, window_size=(17, 0)
    )
    out_ref, out_pt = ref_decode(q, kc, vc, lens, causal=True,
                                 window_size=(17, 0))
    check_close(out, out_ref, out_pt)


def test_kvcache_splits_match():
    _, q, kc, vc, lens, _, _ = setup(smax=512)
    out1 = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=lens, causal=True,
                                   num_splits=1)
    out2 = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=lens, causal=True,
                                   num_splits=3)
    ref, pt = ref_decode(q, kc, vc, lens, causal=True)
    check_close(out2, ref, pt)
    assert float(jnp.abs(out1.astype(jnp.float32) - out2.astype(jnp.float32)).max()) < 1e-2


def test_kvcache_paged():
    b, h, hk, d, page, npages_per_seq = 2, 8, 2, 64, 128, 3
    rng, q, kc, vc, lens, knew, vnew = setup(
        b=b, h=h, hk=hk, d=d, smax=page * npages_per_seq, sq=1
    )
    smax = page * npages_per_seq
    # scatter the linear cache into shuffled pages
    total_pages = b * npages_per_seq + 2
    perm = rng.permutation(total_pages)[: b * npages_per_seq]
    block_table = jnp.asarray(perm.reshape(b, npages_per_seq), jnp.int32)
    k_pages = np.zeros((total_pages, page, hk, d), np.float32)
    v_pages = np.zeros((total_pages, page, hk, d), np.float32)
    for i in range(b):
        for j in range(npages_per_seq):
            k_pages[perm[i * npages_per_seq + j]] = np.asarray(
                kc[i, j * page:(j + 1) * page], np.float32
            )
            v_pages[perm[i * npages_per_seq + j]] = np.asarray(
                vc[i, j * page:(j + 1) * page], np.float32
            )
    k_pages = jnp.asarray(k_pages, kc.dtype)
    v_pages = jnp.asarray(v_pages, vc.dtype)

    out = flash_attn_with_kvcache(
        q, k_pages, v_pages, knew, vnew, cache_seqlens=lens,
        block_table=block_table, causal=True,
    )
    out_ref, out_pt = ref_decode(q, kc, vc, lens, knew, vnew, causal=True)
    check_close(out, out_ref, out_pt)


def test_kvcache_rotary():
    b, h, hk, d, smax, sq = 2, 4, 4, 64, 192, 1
    _, q, kc, vc, lens, knew, vnew = setup(b=b, h=h, hk=hk, d=d, smax=smax, sq=sq)
    pos = np.arange(smax)
    inv = 1.0 / (10000 ** (np.arange(0, d, 2) / d))
    ang = np.outer(pos, inv)
    cos = jnp.asarray(np.cos(ang), jnp.float32)
    sin = jnp.asarray(np.sin(ang), jnp.float32)

    out = flash_attn_with_kvcache(
        q, kc, vc, knew, vnew, rotary_cos=cos, rotary_sin=sin,
        cache_seqlens=lens, causal=True,
    )
    # oracle: rotate q/knew at the right positions, then run plain decode ref
    posq = lens[:, None] + jnp.arange(sq)[None, :]
    q_rot = _apply_rotary(q, cos, sin, posq, False)
    k_rot = _apply_rotary(knew, cos, sin, posq, False)
    out_ref, out_pt = ref_decode(q_rot, kc, vc, lens, k_rot, vnew, causal=True)
    check_close(out, out_ref, out_pt)


def test_kvcache_batch_idx():
    b, bc = 2, 4
    rng, q, _, _, lens, _, _ = setup(b=b)
    kc = jnp.asarray(rng.standard_normal((bc, 256, 2, 64)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((bc, 256, 2, 64)), jnp.bfloat16)
    cbi = jnp.asarray([3, 1], jnp.int32)
    out = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=lens, cache_batch_idx=cbi, causal=True
    )
    out_ref, out_pt = ref_decode(q, kc[cbi], vc[cbi], lens, causal=True)
    check_close(out, out_ref, out_pt)


def test_kvcache_leftpad():
    b = 2
    _, q, kc, vc, lens, _, _ = setup(b=b)
    leftpad = jnp.asarray([5, 0], jnp.int32)
    out = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=lens, cache_leftpad=leftpad, causal=True
    )
    # oracle: valid keys are [leftpad, lens)
    smax = kc.shape[1]
    ar = np.arange(smax)[None, :]
    mask = jnp.asarray(
        (ar >= np.asarray(leftpad)[:, None]) & (ar < np.asarray(lens)[:, None])
    )
    out_ref, _ = attention_ref(q, kc, vc, None, mask, causal=True,
                               key_leftpad=leftpad)
    out_pt, _ = attention_ref(q, kc, vc, None, mask, causal=True,
                              key_leftpad=leftpad, upcast=False,
                              reorder_ops=True)
    check_close(out, out_ref, out_pt)


def test_kvcache_fp8():
    """FP8 (e4m3) KV-cache decode with per-kv-head descale (quantised-cache
    serving; FA3 FP8 semantics `hopper/flash_api.cpp:694-696`)."""
    from flash_attn_tpu import flash_attn_with_kvcache

    b, h, hk, d, cache = 2, 8, 4, 64, 384
    rng = np.random.default_rng(40)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((b, cache, hk, d)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, cache, hk, d)), jnp.float32)
    lens = jnp.asarray([cache, cache - 77], jnp.int32)

    # per-kv-head symmetric quantisation
    def quant(x):
        amax = jnp.max(jnp.abs(x), axis=(1, 3))  # (b, hk)
        scale = 448.0 / jnp.maximum(amax, 1e-12)
        xq = (x * scale[:, None, :, None]).astype(jnp.float8_e4m3fn)
        return xq, (1.0 / scale).astype(jnp.float32)

    kq, kd = quant(kc)
    vq, vd = quant(vc)

    out_fp8 = flash_attn_with_kvcache(
        q, kq, vq, cache_seqlens=lens, causal=True,
        k_descale=kd, v_descale=vd,
    )
    # reference on the dequantised cache
    kcd = kq.astype(jnp.float32) * kd[:, None, :, None]
    vcd = vq.astype(jnp.float32) * vd[:, None, :, None]
    out_ref = flash_attn_with_kvcache(
        q, kcd.astype(jnp.bfloat16), vcd.astype(jnp.bfloat16),
        cache_seqlens=lens, causal=True,
    )
    err = float(jnp.abs(out_fp8.astype(jnp.float32)
                        - out_ref.astype(jnp.float32)).max())
    assert err < 2e-2, err


def test_kvcache_int8():
    """INT8 KV-cache decode: native int8 MXU matmuls with per-kv-head
    descale — the v5e-native quantised cache (2x bf16 MXU rate, half the
    HBM traffic)."""
    from flash_attn_tpu import flash_attn_with_kvcache

    b, h, hk, d, cache = 2, 8, 4, 64, 384
    rng = np.random.default_rng(41)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((b, cache, hk, d)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, cache, hk, d)), jnp.float32)
    lens = jnp.asarray([cache, cache - 77], jnp.int32)

    def quant(x):
        amax = jnp.max(jnp.abs(x), axis=(1, 3))  # (b, hk)
        scale = jnp.maximum(amax, 1e-9) / 127.0
        xq = jnp.clip(jnp.round(x / scale[:, None, :, None]),
                      -127, 127).astype(jnp.int8)
        return xq, scale.astype(jnp.float32)

    kq, kd = quant(kc)
    vq, vd = quant(vc)
    out_i8 = flash_attn_with_kvcache(
        q, kq, vq, cache_seqlens=lens, causal=True,
        k_descale=kd, v_descale=vd,
    )
    kcd = kq.astype(jnp.float32) * kd[:, None, :, None]
    vcd = vq.astype(jnp.float32) * vd[:, None, :, None]
    out_ref = flash_attn_with_kvcache(
        q, kcd.astype(jnp.bfloat16), vcd.astype(jnp.bfloat16),
        cache_seqlens=lens, causal=True,
    )
    err = float(jnp.abs(out_i8.astype(jnp.float32)
                        - out_ref.astype(jnp.float32)).max())
    assert err < 3e-2, err


@pytest.mark.parametrize("cache_dtype", ["int8", "fp8"])
def test_kvcache_quantised_append(cache_dtype):
    """Quantise-on-append: new bf16 tokens land in the int8/fp8 cache via
    the existing per-head descales (round-1 gap: NotImplementedError)."""
    from flash_attn_tpu import flash_attn_with_kvcache

    b, h, hk, d, cache, snew = 2, 4, 2, 64, 256, 3
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((b, snew, h, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((b, cache, hk, d)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, cache, hk, d)), jnp.float32)
    knew = jnp.asarray(rng.standard_normal((b, snew, hk, d)), jnp.bfloat16)
    vnew = jnp.asarray(rng.standard_normal((b, snew, hk, d)), jnp.bfloat16)
    lens = jnp.asarray([100, 180], jnp.int32)

    def quant(x):
        amax = jnp.max(jnp.abs(x), axis=(1, 3))
        if cache_dtype == "int8":
            scale = jnp.maximum(amax, 1e-9) / 127.0
            xq = jnp.clip(jnp.round(x / scale[:, None, :, None]),
                          -127, 127).astype(jnp.int8)
        else:
            scale = jnp.maximum(amax, 1e-9) / 448.0
            xq = (x / scale[:, None, :, None]).astype(jnp.float8_e4m3fn)
        return xq, scale.astype(jnp.float32)

    kq, kd = quant(kc)
    vq, vd = quant(vc)
    out, (kc2, vc2) = flash_attn_with_kvcache(
        q, kq, vq, knew, vnew, cache_seqlens=lens, causal=True,
        k_descale=kd, v_descale=vd, return_updated_cache=True,
    )
    assert kc2.dtype == kq.dtype
    # appended rows dequantise back to ~knew
    lens_np = np.asarray(lens)
    for i in range(b):
        got = np.asarray(kc2[i, lens_np[i]:lens_np[i] + snew],
                         np.float32) * np.asarray(kd)[i, None, :, None]
        # e4m3 keeps 3 mantissa bits (~6% relative); int8 ~0.8%
        np.testing.assert_allclose(got, np.asarray(knew[i], np.float32),
                                   atol=3e-2 if cache_dtype == "int8"
                                   else 2.5e-1)
    # output matches bf16 decode on the dequantised+appended cache
    kcd = (kq.astype(jnp.float32) * kd[:, None, :, None]).astype(jnp.bfloat16)
    vcd = (vq.astype(jnp.float32) * vd[:, None, :, None]).astype(jnp.bfloat16)
    out_ref = flash_attn_with_kvcache(
        q, kcd, vcd, knew, vnew, cache_seqlens=lens, causal=True,
    )
    err = float(jnp.abs(out.astype(jnp.float32)
                        - out_ref.astype(jnp.float32)).max())
    assert err < (4e-2 if cache_dtype == "int8" else 1.5e-1), err


@pytest.mark.parametrize("sq", [1, 4])
@pytest.mark.parametrize("num_splits", [1, 3])
def test_kvcache_sinks(sq, num_splits):
    """Attention sinks at decode (`cute/interface.py:1149`): the per-head
    sink logit joins the softmax denominator only, across split-KV."""
    import jax

    _, q, kc, vc, lens, _, _ = setup(sq=sq, smax=320)
    b, _, h, d = q.shape
    hk = kc.shape[2]
    rng = np.random.default_rng(3)
    sinks = jnp.asarray(rng.standard_normal(h), jnp.float32)
    scale = d ** -0.5

    out, lse = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=lens, causal=True, sinks=sinks,
        num_splits=num_splits, return_softmax_lse=True,
    )

    # fp32 reference with a virtual sink logit column (no value row)
    smax = kc.shape[1]
    g = h // hk
    kf = jnp.repeat(kc.astype(jnp.float32), g, axis=2)  # (b, smax, h, d)
    vf = jnp.repeat(vc.astype(jnp.float32), g, axis=2)
    sc = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), kf) * scale
    lens_np = np.asarray(lens)
    cols = np.arange(smax)[None, None, None, :]
    pos = np.arange(sq)[None, None, :, None] + (
        lens_np[:, None, None, None] - sq)
    valid = (cols < lens_np[:, None, None, None]) & (cols <= pos)
    sc = jnp.where(jnp.asarray(valid), sc, -jnp.inf)
    sc_aug = jnp.concatenate(
        [sc, jnp.broadcast_to(sinks[None, :, None, None], (b, h, sq, 1))],
        axis=-1)
    p_aug = jax.nn.softmax(sc_aug, axis=-1)
    o_ref = jnp.einsum("bhqk,bkhd->bqhd", p_aug[..., :-1], vf)
    lse_ref = jax.nn.logsumexp(sc_aug, axis=-1)
    assert float(jnp.abs(out.astype(jnp.float32) - o_ref).max()) < 2e-2
    assert float(jnp.abs(lse - lse_ref).max()) < 5e-3
