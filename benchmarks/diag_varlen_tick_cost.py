"""Pin down the scheduled-varlen per-tick cost: live vs dead ticks.

diag_varlen_fwd_parts showed time ~ T (total ticks), not live tiles:
mix (T=256, ~44 live) 31.3ms; 2x8k (T=168, ~72 live) 21.3ms -> every
tick costs ~31us whether it computes or not.  This times the raw kernel
on the bench mix with three table variants:
  (t1) tables as built                (T=256)
  (t2) live prefix only               (T=live)
  (t3) all ticks EMPTY, same T        (T=256)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.kernels import varlen_sched as vs
from flash_attn_tpu.kernels.block_sizes import round_up, varlen_block_sizes
from flash_attn_tpu.utils.benchmark import attention_flops, benchmark_chained


def main(lens, h=16, d=128, label=""):
    rng = np.random.default_rng(0)
    cu = jnp.asarray(np.cumsum([0] + lens), jnp.int32)
    total = int(cu[-1])
    q = jnp.asarray(rng.standard_normal((total, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((total, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((total, h, d)), jnp.bfloat16)
    scale = 1.0 / np.sqrt(d)
    f_fwd = sum(attention_flops(1, L, L, h, d, True, "fwd") for L in lens)

    vb = varlen_block_sizes(total, total, h, d)
    bq, bk, bh = vb.block_q, vb.block_k, vb.block_h
    tq_p = round_up(max(total, bq), bq)
    nq = nk = tq_p // bq
    nseq = len(lens)
    T = vs._sched_t_max(nq, nk, True, bq, bk, True, nseq, max_sk=max(lens))

    qa = vs.token_aux(cu, total, tq_p)
    qi_tab, ki_tab, fl_tab = vs.build_varlen_schedule(
        cu, cu, tq_p, tq_p, bq=bq, bk=bk, causal=True,
        window=(-1, -1), T_max=T, same_stream=True)
    qi_np, ki_np, fl_np = (np.asarray(qi_tab), np.asarray(ki_tab),
                           np.asarray(fl_tab))
    live = int(np.sum((fl_np & vs._EMPTY) == 0))
    print(f"{label}: total={total} T={T} live={live} "
          f"tiles=({bq},{bk},bh{bh})")

    ka_rows = jnp.broadcast_to(
        jnp.asarray(qa).reshape(nk, 1, bq),
        (nk, vs.STAT, bq)).reshape(nk, vs.STAT, bq)

    def pad_t(x):
        return jnp.pad(x, ((0, tq_p - x.shape[0]), (0, 0), (0, 0))) \
            if x.shape[0] != tq_p else x

    qp, kp, vp = pad_t(q), pad_t(k), pad_t(v)

    def time_tabs(name, qi_t, ki_t, fl_t, flops):
        qi_j = jnp.asarray(qi_t, jnp.int32)
        ki_j = jnp.asarray(ki_t, jnp.int32)
        fl_j = jnp.asarray(fl_t, jnp.int32)

        def step(qc, k, v):
            o, _ = vs._varlen_sched_fwd(
                qc, k, v, cu, cu, qa, ka_rows, qi_j, ki_j, fl_j,
                scale=scale, causal=True, window=(-1, -1), softcap=0.0,
                alibi_slopes=None, dropout_p=0.0, dropout_seed=None,
                bq=bq, bk=bk, bh=bh, emit_lse=False)
            return qc + o.astype(qc.dtype) * 1e-3, k, v

        dt = benchmark_chained(lambda c: step(*c), (qp, kp, vp),
                               iters=8, reps=3, agg="min")
        nt = len(qi_t)
        tf = f" {flops/dt/1e12:6.1f} TF/s" if flops else ""
        print(f"  {name:24s} T={nt:4d}  {dt*1e3:7.2f} ms "
              f" {dt/nt/(h//bh)*1e6:6.2f} us/tick{tf}")
        return dt

    # (t1) as built
    time_tabs("as built", qi_np, ki_np, fl_np, f_fwd)
    # (t2) live prefix only (valid entries are a prefix by construction)
    time_tabs("live prefix", qi_np[:live], ki_np[:live], fl_np[:live],
              f_fwd)
    # (t3) all EMPTY at full T (same qi/ki streams: DMA pattern identical)
    fl_empty = np.full_like(fl_np, vs._EMPTY)
    fl_empty[0] |= vs._FIRST
    time_tabs("all empty", qi_np, ki_np, fl_empty, 0)
    # (t4) all EMPTY, constant qi/ki (no DMA transitions at all)
    time_tabs("all empty, no DMA", np.zeros_like(qi_np),
              np.zeros_like(ki_np), fl_empty, 0)


if __name__ == "__main__":
    print("devices:", jax.devices())
    main([8192] + [256] * 31, label="bench mix")
