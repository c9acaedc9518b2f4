"""Causal forward tile sweep on real TPU (round-3: close the 129.5 ->
>=150 TF/s gap; VERDICT #1).  Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/sweep_causal.py
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from flash_attn_tpu.kernels.flash_fwd import flash_attn_fwd_bhsd
from flash_attn_tpu.utils.benchmark import attention_flops, benchmark_chained


def run_split(b=1, h=16, s=8192, d=128, configs=None, causal=True):
    """Sweep the interior/diagonal split path: configs are
    (bq, bk_int, bh_int, bk_dia, bh_dia)."""
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    su = jnp.full((b,), s, jnp.int32)
    flops = attention_flops(b, s, s, h, d, causal, "fwd")

    for (bq, bki, bhi, bkd, bhd) in configs:
        def step(qc, k, v, bq=bq, bki=bki, bhi=bhi, bkd=bkd, bhd=bhd):
            o, _ = flash_attn_fwd_bhsd(
                qc, k, v, su, su, softmax_scale=d ** -0.5, causal=causal,
                block_q=bq, block_k=bki, block_h=bhi,
                split_diag=(bkd, bhd), full_lengths=True,
            )
            return o.astype(qc.dtype)

        try:
            dt = benchmark_chained(step, q, k, v, iters=16, reps=3)
            print(f"split bq{bq} bki{bki} bhi{bhi} bkd{bkd} bhd{bhd}: "
                  f"{flops / dt / 1e12:.1f} TF/s ({dt*1e3:.2f} ms)",
                  flush=True)
        except Exception as e:
            print(f"split bq{bq} bki{bki} bhi{bhi} bkd{bkd} bhd{bhd}: "
                  f"FAIL {type(e).__name__} {str(e)[:120]}", flush=True)


def run(b=1, h=16, s=8192, d=128, configs=None, causal=True):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    su = jnp.full((b,), s, jnp.int32)
    flops = attention_flops(b, s, s, h, d, causal, "fwd")
    tag = "" if causal else " dense"

    for cfg in configs:
        (bq, bk, bks, bh), brs = ((cfg[:3] + cfg[4:]), cfg[3]) \
            if len(cfg) == 5 else (cfg, 0)

        def step(qc, k, v, bq=bq, bk=bk, bks=bks, brs=brs, bh=bh):
            o, _ = flash_attn_fwd_bhsd(
                qc, k, v, su, su, softmax_scale=d ** -0.5, causal=causal,
                block_q=bq, block_k=bk, block_k_sub=bks,
                block_q_sub=brs or None, block_h=bh,
                full_lengths=True,
                emit_lse=os.environ.get("SWEEP_NO_LSE") != "1",
            )
            return o.astype(qc.dtype)

        name = f"bq{bq} bk{bk} bks{bks} brs{brs} bh{bh}{tag}"
        try:
            dt = benchmark_chained(step, q, k, v, iters=16, reps=3)
            print(f"{name}: {flops / dt / 1e12:.1f} TF/s ({dt*1e3:.2f} ms)",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    cfgs = [
        (512, 1024, 1024, 4),   # round-2 default (with mask hoist now)
        (512, 512, 512, 4),
        (512, 512, 512, 8),
        (256, 256, 256, 8),
        (1024, 1024, 1024, 4),
        (512, 2048, 2048, 4),
        (1024, 512, 512, 4),
        (512, 1024, 1024, 8),
    ]
    args = sys.argv[1:]
    causal = True
    split = False
    if "--uncond" in args:
        os.environ["FLASH_ATTN_TPU_SCHED_UNCOND"] = "1"
        args.remove("--uncond")
    if "--dense" in args:
        causal = False
        args.remove("--dense")
    if "--split" in args:
        split = True
        args.remove("--split")
    if split:
        scfgs = [
            (256, 1024, 8, 256, 8),
            (256, 1024, 8, 512, 8),
            (256, 2048, 8, 512, 8),
            (512, 1024, 4, 512, 4),
            (512, 1024, 4, 256, 8),
            (512, 2048, 4, 512, 8),
            (256, 4096, 8, 512, 8),
        ]
        if args:
            scfgs = [tuple(int(x) for x in a.split(",")) for a in args]
        run_split(configs=scfgs, causal=causal)
    else:
        if args:
            cfgs = [tuple(int(x) for x in a.split(",")) for a in args]
        run(configs=cfgs, causal=causal)
