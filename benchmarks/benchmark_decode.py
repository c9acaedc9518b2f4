"""KV-cache decode benchmarks: GQA paged decode + MLA decode + split-KV sweep.

TPU counterpart of `hopper/benchmark_mla_decode.py`,
`hopper/benchmark_split_kv.py` and the kvcache paths of
`benchmarks/benchmark_flash_attention.py`.  Reports decode tokens/s and
effective HBM bandwidth (decode is bandwidth-bound: each step must stream
the whole KV cache once).

Run: python benchmarks/benchmark_decode.py [--quick]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench_decode_chained(step, q, *consts, iters=64, reps=3):
    """Chain decode steps on device (carry = q) so host dispatch overhead
    (large over the remote tunnel) is excluded; see utils/benchmark.py."""
    from flash_attn_tpu.utils.benchmark import benchmark_chained

    def chained(q, *cs):
        o = step(q, *cs)
        # feed a dependency back into q (same shape; pad if dv < d)
        if o.shape != q.shape:
            o = jnp.pad(o, [(0, a - b) for a, b in zip(q.shape, o.shape)])
        return q + o.astype(q.dtype) * 1e-3

    return benchmark_chained(chained, q, *consts, iters=iters, reps=reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import flash_attn_tpu as fa

    rng = np.random.default_rng(0)

    # --- Llama-3-8B-shape GQA paged decode (BASELINE.json config) ---
    h, hk, d, page = 32, 8, 128, 256
    b = 4 if args.quick else 8
    for cache_len in ([4096] if args.quick else [4096, 16384, 65536]):
        npages_per_seq = cache_len // page
        npages = b * npages_per_seq
        kc = jnp.asarray(rng.standard_normal((npages, page, hk, d)), jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((npages, page, hk, d)), jnp.bfloat16)
        table = jnp.arange(npages, dtype=jnp.int32).reshape(b, npages_per_seq)
        q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
        lens = jnp.full((b,), cache_len, jnp.int32)

        def step(q, kc, vc, table, lens):
            return fa.flash_attn_with_kvcache(
                q, kc, vc, cache_seqlens=lens, block_table=table, causal=True)
        dt = bench_decode_chained(step, q, kc, vc, table, lens)
        kv_bytes = 2 * b * cache_len * hk * d * 2
        print(f"paged GQA decode b={b} cache={cache_len:6d}: "
              f"{b/dt:8.0f} tok/s  p50 {dt*1e3:6.2f} ms  "
              f"KV-stream {kv_bytes/dt/1e9:6.1f} GB/s", flush=True)

    # --- MLA decode (DeepSeek shapes: d=576, dv=512, MQA) ---
    from flash_attn_tpu.kernels.flash_fwd import flash_attn_fwd_bhsd

    h_mla, d_mla, dv_mla = 16 if args.quick else 128, 576, 512
    b = 4
    for cache_len in ([4096] if args.quick else [4096, 16384]):
        q = jnp.asarray(rng.standard_normal((b, h_mla, 1, d_mla)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, 1, cache_len, d_mla)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, 1, cache_len, dv_mla)), jnp.bfloat16)
        su_q = jnp.ones((b,), jnp.int32)
        su_k = jnp.full((b,), cache_len, jnp.int32)
        # decode-as-matmul: the h query heads ride the M dimension
        # (seqlenq_ngroups_swapped trick, reference flash.h:142) — here by
        # treating heads as the q sequence against the shared MQA cache.
        def step(q_, k, v):
            # decode-as-matmul: fold the query heads into the M dimension
            # against the shared MQA cache (seqlenq_ngroups_swapped trick,
            # reference flash.h:142)
            o, _ = flash_attn_fwd_bhsd(
                jnp.swapaxes(q_, 1, 2).reshape(b, 1, h_mla, d_mla), k, v,
                su_q * h_mla, su_k, softmax_scale=d_mla ** -0.5)
            return o.reshape(b, 1, h_mla, dv_mla).swapaxes(1, 2)
        dt = bench_decode_chained(step, q, k, v, iters=256)
        kv_bytes = b * cache_len * (d_mla + dv_mla) * 2
        print(f"MLA decode h={h_mla} cache={cache_len:6d}: "
              f"{b/dt:8.0f} tok/s  p50 {dt*1e3:6.2f} ms  "
              f"KV-stream {kv_bytes/dt/1e9:6.1f} GB/s", flush=True)

    # --- split-KV sweep (the num_splits_heuristic role, flash_api.cpp:263) ---
    b, h, hk, d, cache_len = 1, 32, 8, 128, 32768
    kc = jnp.asarray(rng.standard_normal((b, cache_len, hk, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((b, cache_len, hk, d)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
    lens = jnp.full((b,), cache_len, jnp.int32)
    for splits in ([0, 4] if args.quick else [0, 1, 2, 4, 8, 16]):
        def step(q_, kc, vc, lens, splits=splits):
            return fa.flash_attn_with_kvcache(
                q_, kc, vc, cache_seqlens=lens, causal=True,
                num_splits=splits)
        dt = bench_decode_chained(step, q, kc, vc, lens)
        print(f"splitkv b=1 cache={cache_len} splits={splits:2d}: "
              f"p50 {dt*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
