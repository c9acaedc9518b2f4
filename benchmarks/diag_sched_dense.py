"""Measure the scheduled kernel's interior-tick rate: run it with huge
window bounds so every tick is all-interior (scheduled dense)."""

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from flash_attn_tpu.kernels.flash_fwd import flash_attn_fwd_bhsd
from flash_attn_tpu.utils.benchmark import attention_flops, benchmark_chained


def main():
    b, h, s, d = 1, 16, 8192, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    su = jnp.full((b,), s, jnp.int32)
    flops = attention_flops(b, s, s, h, d, False, "fwd")

    cfgs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]] or [
        (1024, 1024, 256, 256, 4),
        (1024, 1024, 1024, 0, 4),
        (1024, 1024, 512, 0, 4),
        (1024, 1024, 256, 0, 4),
    ]
    for (bq, bk, bks, brs, bh) in cfgs:
        def step(qc, k, v, bq=bq, bk=bk, bks=bks, brs=brs, bh=bh):
            o, _ = flash_attn_fwd_bhsd(
                qc, k, v, su, su, softmax_scale=d ** -0.5, causal=False,
                window_size=(s, s),
                block_q=bq, block_k=bk, block_k_sub=bks,
                block_q_sub=brs or None, block_h=bh, full_lengths=True)
            return o.astype(qc.dtype)

        try:
            dt = benchmark_chained(step, q, k, v, iters=16, reps=3)
            print(f"sched-dense bq{bq} bk{bk} bks{bks} brs{brs} bh{bh}: "
                  f"{flops / dt / 1e12:.1f} TF/s ({dt*1e3:.2f} ms)",
                  flush=True)
        except Exception as e:
            print(f"sched-dense bq{bq} bk{bk} bks{bks} brs{brs} bh{bh}: "
                  f"FAIL {type(e).__name__} {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
