"""Headline benchmark: BF16 flash-attention forward, hdim128 seq8k.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's flagship forward-kernel utilisation — FA3 reaches
~740 TFLOPs/s FP16 on H100 = 75% of the 989 TFLOPs/s peak (README.md:31-35;
BASELINE.md).  `vs_baseline` is our fraction-of-chip-peak divided by that
0.75, i.e. 1.0 means we match the reference's utilisation on our silicon.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    on_tpu = jax.default_backend() == "tpu"
    import flash_attn_tpu as fa
    from flash_attn_tpu.utils.benchmark import (
        attention_flops,
        benchmark_attention_fwd,
    )

    if on_tpu:
        b, h, s, d = 1, 16, 8192, 128
        iters = 16  # run-to-run tunnel variance is ~5%; more samples
        peak_tflops = 197.0  # TPU v5e bf16
    else:  # CI smoke: interpret mode, tiny shape
        b, h, s, d = 1, 2, 256, 64
        iters = 1
        peak_tflops = 1.0

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)

    dt = benchmark_attention_fwd(
        fa.flash_attn_func, q, k, v, causal=False, iters=iters,
        reps=7 if on_tpu else 1, agg="min" if on_tpu else "median",
    )
    tflops = attention_flops(b, s, s, h, d, False, "fwd") / dt / 1e12
    frac = tflops / peak_tflops
    print(json.dumps({
        "metric": "flash_attn_fwd_bf16_hdim128_seq8k_TFLOPs",
        "value": round(tflops, 1),
        "unit": "TFLOP/s",
        "vs_baseline": round(frac / 0.75, 3),
    }))


if __name__ == "__main__":
    main()
