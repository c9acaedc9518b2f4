"""Tile-size sweep for the dense/causal forward kernel on the real chip.

Usage: PYTHONPATH=/root/.axon_site python benchmarks/sweep_fwd_tiles.py \
       [--causal] [--seq 8192] [--hdim 128]
"""

import argparse
import itertools

import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.kernels.flash_fwd import flash_attn_fwd_bhsd
from flash_attn_tpu.utils.benchmark import attention_flops, benchmark_chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--seq", type=int, default=8192)
    ap.add_argument("--hdim", type=int, default=128)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--bq", type=int, nargs="*", default=None)
    ap.add_argument("--bk", type=int, nargs="*", default=None)
    ap.add_argument("--bks", type=int, nargs="*", default=None)
    ap.add_argument("--bh", type=int, nargs="*", default=[0])
    args = ap.parse_args()

    b, h, s, d = args.batch, args.heads, args.seq, args.hdim
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    su = jnp.full((b,), s, jnp.int32)

    flops = attention_flops(b, s, s, h, d, args.causal, "fwd")
    bqs = args.bq or [512, 1024, 2048]
    bk_list = args.bk or [1024, 2048, 4096]
    bks_list = args.bks or [0, 256, 512, 1024, 2048]

    results = []
    for bq, bk, bks, bh in itertools.product(bqs, bk_list, bks_list,
                                             args.bh):
        if bks and (bks > bk or bk % bks):
            continue
        if bq > s or bk > s:
            continue

        def step(q, k, v, bq=bq, bk=bk, bks=bks, bh=bh):
            o, _ = flash_attn_fwd_bhsd(
                q, k, v, su, su, softmax_scale=d ** -0.5,
                causal=args.causal, block_q=bq, block_k=bk,
                block_k_sub=bks or None, block_h=bh or None,
            )
            return o.astype(q.dtype)

        try:
            dt = benchmark_chained(step, q, k, v, iters=args.iters, reps=3)
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq} bk={bk} bks={bks}: FAIL {type(e).__name__}: {e}")
            continue
        tf = flops / dt / 1e12
        results.append((tf, bq, bk, bks, bh))
        print(f"bq={bq:5d} bk={bk:5d} bks={bks:5d} bh={bh}: {tf:7.1f} TF/s "
              f"({dt*1e6:7.1f} us)", flush=True)

    results.sort(reverse=True)
    print("\nTop 5:")
    for tf, bq, bk, bks, bh in results[:5]:
        print(f"  {tf:7.1f} TF/s  bq={bq} bk={bk} bks={bks} bh={bh}")


if __name__ == "__main__":
    main()
