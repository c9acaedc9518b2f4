"""Decode throughput matrix: {separate, fused} x {bf16, int8} x page size.

All data generated on device (host->device transfers ride a slow tunnel
in this environment).  Loop-invariant operands are passed as consts —
closures inline them into the HLO as literals.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import flash_attn_tpu as fa
from flash_attn_tpu.utils.benchmark import benchmark_chained


def main():
    key = jax.random.PRNGKey(0)
    b, h, hk, d = 8, 32, 8, 128
    cache_len = 16384
    lens = jnp.full((b,), cache_len, jnp.int32)
    q = jax.random.normal(key, (b, 1, h, d), jnp.bfloat16)
    bts = 2 * b * cache_len * hk * d * 2
    dsc = jnp.full((b, hk), 0.03, jnp.float32)

    def q8(x):
        return jnp.clip(jnp.round(x.astype(jnp.float32) / 0.03),
                        -127, 127).astype(jnp.int8)

    for page in (256, 512):
        npp = cache_len // page
        kc = jax.random.normal(key, (b * npp, page, hk, d), jnp.bfloat16)
        vc = jax.random.normal(key, (b * npp, page, hk, d), jnp.bfloat16)
        table = jnp.arange(b * npp, dtype=jnp.int32).reshape(b, npp)

        def sep(qq, kcx, vcx, table, lens, **kw):
            o = fa.flash_attn_with_kvcache(
                qq, kcx, vcx, cache_seqlens=lens, block_table=table,
                causal=True, **kw)
            return qq + o.astype(qq.dtype) * 1e-3

        def fus(qq, kvx, table, lens, **kw):
            o = fa.flash_attn_with_kvcache(
                qq, kvx, None, cache_seqlens=lens, block_table=table,
                causal=True, **kw)
            return qq + o.astype(qq.dtype) * 1e-3

        dt = benchmark_chained(sep, q, kc, vc, table, lens,
                               iters=32, reps=3, agg="min")
        print(f"sep   bf16 p{page}: {b/dt:8.0f} tok/s "
              f"{bts/dt/1e9:6.1f} GB/s", flush=True)
        kv = fa.fuse_kv_cache(kc, vc)
        dtf = benchmark_chained(fus, q, kv, table, lens,
                                iters=32, reps=3, agg="min")
        print(f"fused bf16 p{page}: {b/dtf:8.0f} tok/s "
              f"{bts/dtf/1e9:6.1f} GB/s", flush=True)
        kq, vq = q8(kc), q8(vc)
        dt8 = benchmark_chained(
            lambda qq, kcx, vcx, t, l: sep(qq, kcx, vcx, t, l,
                                           k_descale=dsc, v_descale=dsc),
            q, kq, vq, table, lens, iters=32, reps=3, agg="min")
        print(f"sep   int8 p{page}: {b/dt8:8.0f} tok/s "
              f"{bts/2/dt8/1e9:6.1f} GB/s  ({dt/dt8:4.2f}x bf16)",
              flush=True)
        kv8 = fa.fuse_kv_cache(kq, vq)
        dtf8 = benchmark_chained(
            lambda qq, kvx, t, l: fus(qq, kvx, t, l,
                                      k_descale=dsc, v_descale=dsc),
            q, kv8, table, lens, iters=32, reps=3, agg="min")
        print(f"fused int8 p{page}: {b/dtf8:8.0f} tok/s "
              f"{bts/2/dtf8/1e9:6.1f} GB/s  ({dt/dtf8:4.2f}x bf16)",
              flush=True)

    # non-paged
    kc = jax.random.normal(key, (b, cache_len, hk, d), jnp.bfloat16)
    vc = jax.random.normal(key, (b, cache_len, hk, d), jnp.bfloat16)

    def sepnp(qq, kcx, vcx, lens, **kw):
        o = fa.flash_attn_with_kvcache(
            qq, kcx, vcx, cache_seqlens=lens, causal=True, **kw)
        return qq + o.astype(qq.dtype) * 1e-3

    dt = benchmark_chained(sepnp, q, kc, vc, lens, iters=32, reps=3,
                           agg="min")
    print(f"nonpaged bf16  : {b/dt:8.0f} tok/s {bts/dt/1e9:6.1f} GB/s",
          flush=True)
    kq, vq = q8(kc), q8(vc)
    dt8 = benchmark_chained(
        lambda qq, kcx, vcx, l: sepnp(qq, kcx, vcx, l, k_descale=dsc,
                                      v_descale=dsc),
        q, kq, vq, lens, iters=32, reps=3, agg="min")
    print(f"nonpaged int8  : {b/dt8:8.0f} tok/s "
          f"{bts/2/dt8/1e9:6.1f} GB/s  ({dt/dt8:4.2f}x bf16)", flush=True)


if __name__ == "__main__":
    main()
