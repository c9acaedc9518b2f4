"""MXU GEMM roofline check (`benchmarks/benchmark_gemm.py` counterpart).

Measures bf16 matmul TFLOP/s across sizes — the ceiling every attention
number in this repo is judged against.

Run: python benchmarks/benchmark_gemm.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from flash_attn_tpu.utils.benchmark import benchmark_chained

    rng = np.random.default_rng(0)
    for m, k, n in [(2048, 2048, 2048), (4096, 4096, 4096),
                    (8192, 8192, 8192)]:
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)

        # chain through `a` keeping shapes static
        def chain(a, b):
            c = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return (c[:, :k] if n >= k else jnp.pad(c, ((0, 0), (0, k - n)))
                    ).astype(a.dtype) * 1e-3 + a

        dt = benchmark_chained(chain, a, b, iters=32, reps=3)
        fl = 2 * m * k * n
        print(f"({m:5d}x{k:5d}x{n:5d}): {fl/dt/1e12:7.1f} TF/s")


if __name__ == "__main__":
    main()
