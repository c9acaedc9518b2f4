"""Fused KV-page decode tests (TPU extension: K and V of a page in one
contiguous slab, `fuse_kv_cache` / `v_cache=None`).

The fused layout must be bit-identical to the separate paged layout for
every cache variant — it only changes how pages stream from HBM (one DMA
of 2x the bytes per page instead of two)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import (
    flash_attn_with_kvcache,
    fuse_kv_cache,
    split_kv_cache,
)


def paged_setup(b=2, h=8, hk=2, d=64, page=64, npp=4, sq=1, seed=0,
                dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    total = b * npp + 2
    kc = jnp.asarray(rng.standard_normal((total, page, hk, d)), dtype)
    vc = jnp.asarray(rng.standard_normal((total, page, hk, d)), dtype)
    table = jnp.asarray(
        rng.permutation(total)[: b * npp].reshape(b, npp).astype(np.int32))
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), dtype)
    lens = jnp.asarray(
        rng.integers(16, page * npp - sq - 1, (b,)), jnp.int32)
    return rng, q, kc, vc, table, lens


def _d(a, b_):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                 b_.astype(jnp.float32))))


@pytest.mark.parametrize("sq", [1, 3])
@pytest.mark.parametrize("causal", [True, False])
def test_fused_matches_separate(sq, causal):
    rng, q, kc, vc, table, lens = paged_setup(sq=sq)
    o_sep = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=lens, block_table=table, causal=causal)
    kv = fuse_kv_cache(kc, vc)
    o_fus = flash_attn_with_kvcache(
        q, kv, None, cache_seqlens=lens, block_table=table, causal=causal)
    assert _d(o_sep, o_fus) == 0.0


def test_fused_window_and_splits():
    rng, q, kc, vc, table, lens = paged_setup()
    kv = fuse_kv_cache(kc, vc)
    o_sep = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=lens, block_table=table, causal=True,
        window_size=(37, -1))
    o_fus = flash_attn_with_kvcache(
        q, kv, None, cache_seqlens=lens, block_table=table, causal=True,
        window_size=(37, -1))
    assert _d(o_sep, o_fus) == 0.0
    o_spl = flash_attn_with_kvcache(
        q, kv, None, cache_seqlens=lens, block_table=table, causal=True,
        window_size=(37, -1), num_splits=2)
    assert _d(o_sep, o_spl) < 2e-6


def test_fused_append_updates_cache():
    rng, q, kc, vc, table, lens = paged_setup()
    b, hk, d = q.shape[0], kc.shape[2], kc.shape[3]
    kn = jnp.asarray(rng.standard_normal((b, 2, hk, d)), kc.dtype)
    vn = jnp.asarray(rng.standard_normal((b, 2, hk, d)), vc.dtype)
    o_sep, (kc2, vc2) = flash_attn_with_kvcache(
        q, kc, vc, k=kn, v=vn, cache_seqlens=lens, block_table=table,
        causal=True, return_updated_cache=True)
    kv = fuse_kv_cache(kc, vc)
    o_fus, kv2 = flash_attn_with_kvcache(
        q, kv, None, k=kn, v=vn, cache_seqlens=lens, block_table=table,
        causal=True, return_updated_cache=True)
    k2f, v2f = split_kv_cache(kv2)
    assert _d(o_sep, o_fus) == 0.0
    assert _d(kc2, k2f) == 0.0
    assert _d(vc2, v2f) == 0.0


@pytest.mark.parametrize("cache_dtype", ["int8", "fp8"])
def test_fused_quantised(cache_dtype):
    rng, q, kc, vc, table, lens = paged_setup()
    b, hk = q.shape[0], kc.shape[2]
    if cache_dtype == "int8":
        qt, lo, hi = jnp.int8, -127, 127
    else:
        qt = jnp.float8_e4m3fn
    scale = 0.05
    if cache_dtype == "int8":
        kq = jnp.clip(jnp.round(kc.astype(jnp.float32) / scale), lo,
                      hi).astype(qt)
        vq = jnp.clip(jnp.round(vc.astype(jnp.float32) / scale), lo,
                      hi).astype(qt)
    else:
        kq = (kc.astype(jnp.float32) / scale).astype(qt)
        vq = (vc.astype(jnp.float32) / scale).astype(qt)
    dsc = jnp.full((b, hk), scale, jnp.float32)
    o_sep = flash_attn_with_kvcache(
        q, kq, vq, cache_seqlens=lens, block_table=table, causal=True,
        k_descale=dsc, v_descale=dsc)
    o_fus = flash_attn_with_kvcache(
        q, fuse_kv_cache(kq, vq), None, cache_seqlens=lens,
        block_table=table, causal=True, k_descale=dsc, v_descale=dsc)
    assert _d(o_sep, o_fus) == 0.0


def test_fused_gqa_packed_rows():
    # several q heads per kv head and sq>1 exercise the packed-row path
    rng, q, kc, vc, table, lens = paged_setup(h=8, hk=1, sq=2)
    kv = fuse_kv_cache(kc, vc)
    o_sep = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=lens, block_table=table, causal=True)
    o_fus = flash_attn_with_kvcache(
        q, kv, None, cache_seqlens=lens, block_table=table, causal=True)
    assert _d(o_sep, o_fus) == 0.0


def test_fused_requires_paged():
    rng, q, kc, vc, table, lens = paged_setup()
    with pytest.raises(ValueError):
        flash_attn_with_kvcache(q, fuse_kv_cache(kc, vc), None,
                                cache_seqlens=lens, causal=True)
    with pytest.raises(ValueError):
        # wrong fused shape (no `2` axis)
        flash_attn_with_kvcache(q, kc, None, cache_seqlens=lens,
                                block_table=table, causal=True)


def test_fuse_split_roundtrip():
    rng, q, kc, vc, table, lens = paged_setup()
    k2, v2 = split_kv_cache(fuse_kv_cache(kc, vc))
    assert _d(kc, k2) == 0.0 and _d(vc, v2) == 0.0
    with pytest.raises(ValueError):
        fuse_kv_cache(kc, vc[:, : kc.shape[1] // 2])
