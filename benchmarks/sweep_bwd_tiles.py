"""fwd+bwd tile/path sweep on the real chip.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/sweep_bwd_tiles.py
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import flash_attn_tpu.kernels.flash_bwd as fb
from flash_attn_tpu.kernels.flash_fwd import flash_attn_fwd_bhsd
from flash_attn_tpu.utils.benchmark import attention_flops, benchmark_chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--seq", type=int, default=8192)
    ap.add_argument("--hdim", type=int, default=128)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--split", action="store_true", help="two-kernel path")
    ap.add_argument("--no-sched", action="store_true",
                    help="disable the scheduled fused bwd (A/B)")
    ap.add_argument("--bq", type=int, nargs="*", default=[512, 1024])
    ap.add_argument("--bk", type=int, nargs="*", default=[1024, 2048])
    args = ap.parse_args()

    if args.split:
        fb._FUSED_DQ_SCRATCH_LIMIT = 0
    if args.no_sched:
        import os

        os.environ["FLASH_ATTN_TPU_NO_SCHED_BWD"] = "1"

    b, h, s, d = 1, args.heads, args.seq, args.hdim
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    su = jnp.full((b,), s, jnp.int32)
    flops = attention_flops(b, s, s, h, d, args.causal, "fwd_bwd")

    results = []
    for bq in args.bq:
        for bk in args.bk:

            def loss(q, k, v, bq=bq, bk=bk):
                o, _ = flash_attn_fwd_bhsd(
                    q, k, v, su, su, softmax_scale=d ** -0.5,
                    causal=args.causal)
                return jnp.sum(o.astype(jnp.float32))

            def step(carry, bq=bq, bk=bk):
                q, k, v = carry
                # grad through a custom fwd+bwd pair
                o, lse = flash_attn_fwd_bhsd(
                    q, k, v, su, su, softmax_scale=d ** -0.5,
                    causal=args.causal, full_lengths=True)
                do = jnp.ones_like(o)
                dq, dk, dv = fb.flash_attn_bwd_bhsd(
                    do, q, k, v, o, lse, su, su, softmax_scale=d ** -0.5,
                    causal=args.causal, block_q=bq, block_k=bk,
                    full_lengths=True)
                return (dq.astype(q.dtype) * 1e-3 + q,
                        dk.astype(k.dtype) * 1e-3 + k,
                        dv.astype(v.dtype) * 1e-3 + v)

            try:
                dt = benchmark_chained(step, (q, k, v), iters=args.iters,
                                       reps=3)
            except Exception as e:  # noqa: BLE001
                print(f"bq={bq} bk={bk}: FAIL {type(e).__name__}: {e}")
                continue
            tf = flops / dt / 1e12
            results.append((tf, bq, bk))
            print(f"bq={bq:5d} bk={bk:5d}: {tf:7.1f} TF/s fwd+bwd "
                  f"({dt*1e3:7.2f} ms)", flush=True)

    results.sort(reverse=True)
    if results:
        print(f"\nbest: {results[0][0]:.1f} TF/s bq={results[0][1]} "
              f"bk={results[0][2]} ({'split' if args.split else 'fused'})")


if __name__ == "__main__":
    main()
