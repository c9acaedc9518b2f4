"""On-device tile sweep for the scheduled packed-varlen kernel
(VERDICT r2 item 7: fixed 512/512/bh4 was untuned; find per-shape tiles
and the dense-vs-scheduled router crossover).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/sweep_varlen_tiles.py [bq,bk,bh ...]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from flash_attn_tpu.kernels.varlen_sched import flash_attn_varlen_sched_func
from flash_attn_tpu.utils.benchmark import benchmark_chained

CASES = {
    # name: (lens_q == lens_k, causal)
    "uniform 8x2048": [2048] * 8,
    "uniform 4x4096": [4096] * 4,
    "ragged 1x8k+31x256": [8192] + [256] * 31,
    "mixed 4x2048+8x1024": [2048] * 4 + [1024] * 8,
}


def run(configs, causal=True):
    h, d = 16, 128
    rng = np.random.default_rng(0)
    for name, lens in CASES.items():
        lens = np.asarray(lens, np.int32)
        cu_np = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        cu = jnp.asarray(cu_np)
        t = int(cu_np[-1])
        mx = int(lens.max())
        q = jnp.asarray(rng.standard_normal((t, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((t, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((t, h, d)), jnp.bfloat16)
        flops = sum(4 * int(l) * int(l) * h * d // (2 if causal else 1)
                    for l in lens)

        for (bq, bk, bh) in configs:
            def step(qc, k, v, bq=bq, bk=bk, bh=bh):
                o = flash_attn_varlen_sched_func(
                    qc, k, v, cu, cu, mx, mx,
                    softmax_scale=d ** -0.5, causal=causal,
                    block_q=bq, block_k=bk, block_h=bh,
                )
                return o.astype(qc.dtype)

            try:
                dt = benchmark_chained(step, q, k, v, iters=16, reps=3)
                print(f"{name:22s} bq{bq} bk{bk} bh{bh}: "
                      f"{flops/dt/1e12:6.1f} TF/s ({dt*1e3:.2f} ms)",
                      flush=True)
            except Exception as e:
                print(f"{name:22s} bq{bq} bk{bk} bh{bh}: FAIL "
                      f"{type(e).__name__} {str(e)[:110]}", flush=True)


if __name__ == "__main__":
    cfgs = [
        (512, 512, 4),    # current default
        (512, 1024, 4),
        (1024, 1024, 4),
        (512, 512, 8),
        (512, 1024, 8),
        (256, 512, 8),
        (1024, 512, 4),
        (1024, 2048, 2),
    ]
    args = [a for a in sys.argv[1:]]
    if args:
        cfgs = [tuple(int(x) for x in a.split(",")) for a in args]
    run(cfgs)
