"""Diagnose the varlen ragged fwd+bwd gap (bench: 80 TF/s vs 145 dense).

Measures fwd and bwd separately over several length mixes so the loss
can be attributed: scheduled-kernel overhead per tiny sequence, the
backward kernel itself, or the ragged mix.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import flash_attn_tpu as fa
from flash_attn_tpu.utils.benchmark import attention_flops, benchmark_chained


def run(lens, h=16, d=128, label=""):
    rng = np.random.default_rng(0)
    cu = jnp.asarray(np.cumsum([0] + lens), jnp.int32)
    total = int(cu[-1])
    q = jnp.asarray(rng.standard_normal((total, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((total, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((total, h, d)), jnp.bfloat16)
    mx = max(lens)

    def fwd_step(q, k, v):
        o = fa.flash_attn_varlen_func(q, k, v, cu, cu, mx, mx, causal=True)
        return q + o.astype(q.dtype) * 1e-3, k, v

    def loss(q, k, v):
        o = fa.flash_attn_varlen_func(q, k, v, cu, cu, mx, mx, causal=True)
        return jnp.sum(o.astype(jnp.float32))

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def fb_step(carry):
        q, k, v = carry
        dq, dk, dv = grad(q, k, v)
        return (q + dq.astype(q.dtype) * 1e-3,
                k + dk.astype(k.dtype) * 1e-3,
                v + dv.astype(v.dtype) * 1e-3)

    f_fwd = sum(attention_flops(1, L, L, h, d, True, "fwd") for L in lens)
    f_fb = sum(attention_flops(1, L, L, h, d, True, "fwd_bwd") for L in lens)

    dt_f = benchmark_chained(lambda c: fwd_step(*c), (q, k, v),
                             iters=8, reps=3, agg="min")
    dt_fb = benchmark_chained(fb_step, (q, k, v), iters=4, reps=3, agg="min")
    # bwd-only estimate: fwd+bwd time minus fwd time (the vjp re-runs fwd)
    tf_f = f_fwd / dt_f / 1e12
    tf_fb = f_fb / dt_fb / 1e12
    bwd_dt = dt_fb - dt_f
    tf_b = (f_fb - f_fwd) / bwd_dt / 1e12 if bwd_dt > 0 else float("nan")
    print(f"{label:28s} fwd {tf_f:6.1f}  fwd+bwd {tf_fb:6.1f}  "
          f"bwd-only {tf_b:6.1f} TF/s   (dt fwd {dt_f*1e3:.2f} ms, "
          f"fb {dt_fb*1e3:.2f} ms)")
    return tf_f, tf_fb


CASES = {
    "single8k": ([8192], "single 8k"),
    "mix": ([8192] + [256] * 31, "bench mix 8k+31x256"),
    "64x256": ([256] * 64, "64x256"),
    "8x2048": ([2048] * 8, "8x2048"),
    "2x8k": ([8192] * 2, "2x8k"),
}

if __name__ == "__main__":
    print("devices:", jax.devices())
    names = sys.argv[1:] or list(CASES)
    for n in names:
        lens, label = CASES[n]
        run(lens, label=label)
