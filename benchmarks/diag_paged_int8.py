"""Diagnose paged int8 decode: why does the 2x int8 win (non-paged)
disappear on the paged path at page 256?

Compares, at the bench.py Llama-3-8B decode shape (b8 h32 hk8 d128
cache 16k):
  paged bf16/int8 at page {256, 512, 1024}  x  bundle override
  non-paged bf16/int8
reporting tok/s and effective KV-stream GB/s (bytes actually moved).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import flash_attn_tpu as fa
from flash_attn_tpu.utils.benchmark import benchmark_chained


def main():
    rng = np.random.default_rng(0)
    b, h, hk, d = 8, 32, 8, 128
    cache_len = 16384

    def quant(x):
        xs = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xs), axis=(1, 3)) if x.ndim == 4 else None
        # per-(seq-or-page-group, head) scale: use global per-head for diag
        amax = jnp.max(jnp.abs(xs))
        scale = amax / 127.0
        xq = jnp.clip(jnp.round(xs / scale), -127, 127).astype(jnp.int8)
        return xq, scale

    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
    lens = jnp.full((b,), cache_len, jnp.int32)

    for page in (256, 512, 1024):
        npp = cache_len // page
        kc = jnp.asarray(
            rng.standard_normal((b * npp, page, hk, d)), jnp.bfloat16)
        vc = jnp.asarray(
            rng.standard_normal((b * npp, page, hk, d)), jnp.bfloat16)
        table = jnp.arange(b * npp, dtype=jnp.int32).reshape(b, npp)

        def step(q, kc, vc, **kw):
            o = fa.flash_attn_with_kvcache(
                q, kc, vc, cache_seqlens=lens, block_table=table,
                causal=True, **kw)
            return q + o.astype(q.dtype) * 1e-3

        dt = benchmark_chained(step, q, kc, vc, iters=32, reps=3, agg="min")
        bts = 2 * b * cache_len * hk * d * 2
        print(f"paged bf16 page={page:5d}: {b/dt:8.0f} tok/s  "
              f"{bts/dt/1e9:6.1f} GB/s", flush=True)

        kq8 = jnp.clip(jnp.round(kc.astype(jnp.float32) / 0.03), -127,
                       127).astype(jnp.int8)
        vq8 = jnp.clip(jnp.round(vc.astype(jnp.float32) / 0.03), -127,
                       127).astype(jnp.int8)
        dsc = jnp.full((b, hk), 0.03, jnp.float32)
        dt8 = benchmark_chained(
            lambda q, kq, vq: step(q, kq, vq, k_descale=dsc, v_descale=dsc),
            q, kq8, vq8, iters=32, reps=3, agg="min")
        print(f"paged int8 page={page:5d}: {b/dt8:8.0f} tok/s  "
              f"{bts/2/dt8/1e9:6.1f} GB/s  (vs bf16 {dt/dt8:4.2f}x)",
              flush=True)

    # non-paged
    kc = jnp.asarray(
        rng.standard_normal((b, cache_len, hk, d)), jnp.bfloat16)
    vc = jnp.asarray(
        rng.standard_normal((b, cache_len, hk, d)), jnp.bfloat16)

    def step_np(q, kc, vc, **kw):
        o = fa.flash_attn_with_kvcache(
            q, kc, vc, cache_seqlens=lens, causal=True, **kw)
        return q + o.astype(q.dtype) * 1e-3

    dt = benchmark_chained(step_np, q, kc, vc, iters=32, reps=3, agg="min")
    bts = 2 * b * cache_len * hk * d * 2
    print(f"nonpaged bf16        : {b/dt:8.0f} tok/s  "
          f"{bts/dt/1e9:6.1f} GB/s", flush=True)

    kq8 = jnp.clip(jnp.round(kc.astype(jnp.float32) / 0.03), -127,
                   127).astype(jnp.int8)
    vq8 = jnp.clip(jnp.round(vc.astype(jnp.float32) / 0.03), -127,
                   127).astype(jnp.int8)
    dsc = jnp.full((b, hk), 0.03, jnp.float32)
    dt8 = benchmark_chained(
        lambda q, kq, vq: step_np(q, kq, vq, k_descale=dsc, v_descale=dsc),
        q, kq8, vq8, iters=32, reps=3, agg="min")
    print(f"nonpaged int8        : {b/dt8:8.0f} tok/s  "
          f"{bts/2/dt8/1e9:6.1f} GB/s  (vs bf16 {dt/dt8:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
