"""Varlen path comparison: packed (block-sparse flex) vs padded (gather).

The packed path keeps tokens in the (total, h, d) stream and skips
cross-sequence blocks (`kernels/varlen_packed.py`); the padded path
re-gathers to (batch, max_seqlen).  Raggedness decides the winner.

Run: python benchmarks/benchmark_varlen.py [--quick]
"""

import argparse

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from flash_attn_tpu import (
        flash_attn_varlen_func,
        flash_attn_varlen_packed_func,
    )
    from flash_attn_tpu.utils.benchmark import benchmark_chained

    h, d = 16, 128
    cases = {
        "uniform 8x2048": [2048] * 8,
        "ragged 1x8k+31x256": [8192] + [256] * 31,
        "ragged 2x4k+16x128": [4096] * 2 + [128] * 16,
    }
    if args.quick:
        cases = {k: v for k, v in list(cases.items())[:2]}
    rng = np.random.default_rng(0)
    for name, lens in cases.items():
        lens = np.asarray(lens, np.int32)
        cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
        t = int(cu[-1])
        q = jnp.asarray(rng.standard_normal((t, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((t, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((t, h, d)), jnp.bfloat16)
        mx = int(lens.max())

        def sp(q, k, v, cu):
            o = flash_attn_varlen_packed_func(q, k, v, cu, cu, causal=True)
            return q + o.astype(q.dtype) * 1e-3

        def sd(q, k, v, cu, mx=mx):
            o = flash_attn_varlen_func(q, k, v, cu, cu, mx, mx, causal=True)
            return q + o.astype(q.dtype) * 1e-3

        dtp = benchmark_chained(sp, q, k, v, cu, iters=8, reps=3)
        dtd = benchmark_chained(sd, q, k, v, cu, iters=8, reps=3)
        print(f"{name:22s} ({t:6d} tok): packed {dtp*1e3:7.2f} ms  "
              f"padded {dtd*1e3:7.2f} ms  ratio {dtd/dtp:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
