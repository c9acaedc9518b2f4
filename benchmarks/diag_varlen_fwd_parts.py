"""Decompose the ragged packed-varlen FORWARD cost (diag: 8.9 TF/s on
the 8k+31x256 mix vs 89 TF/s for the backward on the same mix).

Times, separately jitted on the same mix:
  (a) the public scheduled forward (primal path)
  (b) host-prep only: token_aux + schedule build
  (c) the pallas kernel with PREBUILT tables (aux/schedule as inputs)
so the deficit can be attributed to the device-built schedule (argsort &
friends re-running every step) versus the kernel itself.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.kernels import varlen_sched as vs
from flash_attn_tpu.utils.benchmark import attention_flops, benchmark_chained


def main(lens, h=16, d=128, label=""):
    rng = np.random.default_rng(0)
    cu = jnp.asarray(np.cumsum([0] + lens), jnp.int32)
    total = int(cu[-1])
    q = jnp.asarray(rng.standard_normal((total, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((total, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((total, h, d)), jnp.bfloat16)
    mx = max(lens)
    scale = 1.0 / np.sqrt(d)
    f_fwd = sum(attention_flops(1, L, L, h, d, True, "fwd") for L in lens)

    from flash_attn_tpu.kernels.block_sizes import (
        round_up, varlen_block_sizes)

    vb = varlen_block_sizes(total, total, h, d)
    bq, bk, bh = vb.block_q, vb.block_k, vb.block_h
    tq_p = round_up(max(total, bq), bq)
    nq = nk = tq_p // bq
    nseq = len(lens)
    T = vs._sched_t_max(nq, nk, True, bq, bk, True, nseq, max_sk=mx)
    print(f"{label}: total={total} padded={tq_p} nq={nq} T={T} "
          f"tiles=({bq},{bk},bh{bh})")

    # (a) public scheduled forward
    def fwd_step(q, k, v):
        o = vs.flash_attn_varlen_sched_func(
            q, k, v, cu, cu, mx, mx, causal=True)
        return q + o.astype(q.dtype) * 1e-3, k, v

    dt_a = benchmark_chained(lambda c: fwd_step(*c), (q, k, v),
                             iters=8, reps=3, agg="min")
    print(f"  (a) public fwd       {dt_a*1e3:7.2f} ms  "
          f"{f_fwd/dt_a/1e12:6.1f} TF/s")

    # (b) host-prep only
    def prep(cu):
        qa = vs.token_aux(cu, total, tq_p)
        tabs = vs.build_varlen_schedule(
            cu, cu, tq_p, tq_p, bq=bq, bk=bk, causal=True,
            window=(-1, -1), T_max=T, same_stream=True)
        return qa, *tabs

    jprep = jax.jit(prep)
    r = jprep(cu)
    jax.block_until_ready(r)
    import time
    t0 = time.perf_counter()
    for _ in range(20):
        r = jprep(cu)
    jax.block_until_ready(r)
    dt_b = (time.perf_counter() - t0) / 20
    print(f"  (b) schedule build   {dt_b*1e3:7.2f} ms")

    # (c) kernel with prebuilt tables
    qa, qi_tab, ki_tab, fl_tab = jprep(cu)
    ka_rows = jnp.broadcast_to(
        qa.reshape(nk, 1, bq), (nk, vs.STAT, bq)).reshape(nk, vs.STAT, bq)

    def pad_t(x):
        return jnp.pad(x, ((0, tq_p - x.shape[0]), (0, 0), (0, 0))) \
            if x.shape[0] != tq_p else x

    def kern_step(q, k, v):
        o, _ = vs._varlen_sched_fwd(
            pad_t(q), pad_t(k), pad_t(v), cu, cu, qa, ka_rows,
            qi_tab, ki_tab, fl_tab, scale=scale, causal=True,
            window=(-1, -1), softcap=0.0, alibi_slopes=None,
            dropout_p=0.0, dropout_seed=None, bq=bq, bk=bk, bh=bh,
            emit_lse=False)
        return q + o[:total].astype(q.dtype) * 1e-3, k, v

    dt_c = benchmark_chained(lambda c: kern_step(*c), (q, k, v),
                             iters=8, reps=3, agg="min")
    print(f"  (c) kernel-only      {dt_c*1e3:7.2f} ms  "
          f"{f_fwd/dt_c/1e12:6.1f} TF/s")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main([8192] + [256] * 31, label="bench mix")
    main([8192] * 2, label="2x8k")
