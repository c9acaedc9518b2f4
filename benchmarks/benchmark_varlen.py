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

    # ---- fwd+bwd: the training cost.  The packed path now runs a
    # first-class packed backward on the scheduled grid (varlen_sched.py);
    # the padded comparison gathers to (b, max_s) and pays b*max_s^2. ----
    print("\nfwd+bwd (training step cost):", flush=True)
    from flash_attn_tpu.kernels.varlen_sched import (
        flash_attn_varlen_sched_func,
    )
    from flash_attn_tpu.utils.benchmark import attention_flops
    from flash_attn_tpu import flash_attn_func

    for name, lens in cases.items():
        lens = np.asarray(lens, np.int32)
        cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
        t = int(cu[-1])
        mx = int(lens.max())
        b = len(lens)
        q = jnp.asarray(rng.standard_normal((t, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((t, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((t, h, d)), jnp.bfloat16)

        def loss_packed(q, k, v):
            o = flash_attn_varlen_sched_func(
                q, k, v, cu, cu, mx, mx, causal=True)
            return jnp.sum(o.astype(jnp.float32))

        gp = jax.grad(loss_packed, (0, 1, 2))

        def step_packed(carry):
            q, k, v = carry
            dq, dk, dv = gp(q, k, v)
            return (q + dq.astype(q.dtype) * 1e-3,
                    k + dk.astype(k.dtype) * 1e-3,
                    v + dv.astype(v.dtype) * 1e-3)

        # padded: the dense kernel on (b, max_s) — what a pad-and-mask
        # training pipeline pays
        qp = jnp.asarray(rng.standard_normal((b, mx, h, d)), jnp.bfloat16)
        kp = jnp.asarray(rng.standard_normal((b, mx, h, d)), jnp.bfloat16)
        vp = jnp.asarray(rng.standard_normal((b, mx, h, d)), jnp.bfloat16)

        def loss_padded(q, k, v):
            o = flash_attn_func(q, k, v, causal=True)
            return jnp.sum(o.astype(jnp.float32))

        gd = jax.grad(loss_padded, (0, 1, 2))

        def step_padded(carry):
            q, k, v = carry
            dq, dk, dv = gd(q, k, v)
            return (q + dq.astype(q.dtype) * 1e-3,
                    k + dk.astype(k.dtype) * 1e-3,
                    v + dv.astype(v.dtype) * 1e-3)

        dtp = benchmark_chained(step_packed, (q, k, v), iters=4, reps=3)
        dtd = benchmark_chained(step_padded, (qp, kp, vp), iters=4, reps=3)
        fl = sum(attention_flops(1, int(L), int(L), h, d, True, "fwd_bwd")
                 for L in lens)
        pad_ratio = 1.0 - t / (b * mx)
        print(f"{name:22s} ({t:6d} tok, {pad_ratio:4.0%} pad): "
              f"packed {dtp*1e3:7.2f} ms ({fl/dtp/1e12:6.1f} TF/s)  "
              f"padded {dtd*1e3:7.2f} ms  ratio {dtd/dtp:5.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
