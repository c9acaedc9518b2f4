"""Public-API causal headline numbers (VERDICT r2 #1): fwd and fwd+bwd
TFLOP/s at hdim128/seq8k through flash_attn_func."""

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import flash_attn_tpu as fa
from flash_attn_tpu.utils.benchmark import (
    attention_flops,
    benchmark_attention_fwd,
    benchmark_attention_fwd_bwd,
)


def main():
    b, h, s, d = 1, 16, 8192, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)

    for mode in sys.argv[1:] or ["fwd", "fwd_bwd"]:
        for causal in (True, False):
            if mode == "fwd":
                dt = benchmark_attention_fwd(
                    fa.flash_attn_func, q, k, v, causal=causal,
                    iters=16, reps=5, agg="min")
            else:
                dt = benchmark_attention_fwd_bwd(
                    fa.flash_attn_func, q, k, v, causal=causal,
                    iters=8, reps=5, agg="min")
            fl = attention_flops(b, s, s, h, d, causal, mode)
            print(f"{mode} causal={causal}: {fl / dt / 1e12:.1f} TF/s",
                  flush=True)


if __name__ == "__main__":
    main()
