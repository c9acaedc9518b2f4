"""Attention kernel sweep benchmark.

TPU counterpart of `benchmarks/benchmark_flash_attention.py` in the
reference: sweep seqlen x causal x head_dim, report TFLOP/s for the flash
kernel vs plain-XLA standard attention (the "PyTorch standard attention"
baseline of `README.md:461`), with the same FLOPs model
(`benchmarks/benchmark_flash_attention.py:27-33`).

Run: python benchmarks/benchmark_flash_attention.py [--quick]
"""

import argparse
import functools
import math

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def standard_attention(q, k, v, causal=False):
    """Plain-XLA attention: materialises the (sq, sk) score matrix."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (1.0 / math.sqrt(d))
    if causal:
        mask = jnp.tril(jnp.ones((sq, sk), bool), sk - sq)
        s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--mode", default="fwd", choices=["fwd", "fwd_bwd"])
    args = ap.parse_args()

    import flash_attn_tpu as fa
    from flash_attn_tpu.utils.benchmark import (
        attention_flops,
        benchmark_attention_fwd,
        benchmark_attention_fwd_bwd,
    )

    seqlens = [512, 2048, 8192] if args.quick else [512, 1024, 2048, 4096, 8192, 16384]
    hdims = [64, 128] if args.quick else [64, 128, 256]
    batch_tokens = 16384  # reference sweep keeps b*s = 16k

    rows = []
    for d in hdims:
        for s in seqlens:
            b = max(1, batch_tokens // s)
            h = 2048 // d
            rng = np.random.default_rng(0)
            q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
            k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
            v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
            for causal in (False, True):
                fl = attention_flops(b, s, s, h, d, causal, args.mode)
                bench = (benchmark_attention_fwd if args.mode == "fwd"
                         else benchmark_attention_fwd_bwd)
                t_flash = bench(
                    functools.partial(fa.flash_attn_func, causal=causal),
                    q, k, v, iters=8, reps=3,
                )
                try:
                    if s > 8192:
                        raise RuntimeError("skip std (O(s^2) memory)")
                    t_std = bench(
                        functools.partial(standard_attention, causal=causal),
                        q, k, v, iters=4, reps=2,
                    )
                except RuntimeError:
                    t_std = float("nan")
                rows.append((d, s, b, h, causal,
                             fl / t_flash / 1e12, fl / t_std / 1e12,
                             t_std / t_flash))
                print(f"hdim={d:4d} seq={s:6d} b={b:3d} causal={int(causal)} "
                      f"{args.mode}: flash {rows[-1][5]:7.1f} TF/s  "
                      f"std {rows[-1][6]:7.1f} TF/s  speedup {rows[-1][7]:.2f}x",
                      flush=True)
    return rows


if __name__ == "__main__":
    main()
