"""Staged ablation of the INT8-KV decode kernel (VERDICT r2 item 4).

Decode is HBM-bound: an int8 cache halves the streamed bytes, so it should
approach 2x bf16 tokens/s — instead it measures ~2x SLOWER end-to-end
(round 2).  This script isolates WHERE the time goes by building a ladder
of stripped Pallas kernels over the same slab layout as
`kernels/flash_decode.py::_decode_ref_kernel`:

  dma    : stream the K/V slabs, touch them once (pure bandwidth)
  qk     : + per-head QK^T matmul (native dtype)
  cast   : + score cast/descale to f32 (int32->f32 for int8)
  soft   : + full online-softmax update (max/exp2/sum, m/l scratch)
  pquant : + P re-quantisation (f32 -> int8 round/clip; bf16 cast for bf16)
  full   : + PV matmul + accumulator update (the whole decode body)

Run on TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/diag_int8_decode.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.utils.benchmark import benchmark_chained

LOG2E = 1.4426950408889634


def make_kernel(stage: str, int8: bool, hk: int, bk: int, rows_n: int, d: int):
    def kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref):
        ki = pl.program_id(1)
        nk = pl.num_programs(1)

        @pl.when(ki == 0)
        def _init():
            m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        kslab = k_ref[0]          # (bk, hk*d) int8 or bf16
        vslab = v_ref[0]

        if stage == "dma":
            # touch the slabs so the DMA isn't dead; O(bk) VPU work
            t = (kslab[:, :128].astype(jnp.float32)
                 + vslab[:, :128].astype(jnp.float32))
            acc_ref[0, :, :1] += jnp.sum(t, axis=1, keepdims=True)[:rows_n]
            return

        for h in range(hk):
            q = q_ref[0, h]                       # (rows_n, d)
            k = kslab[:, h * d:(h + 1) * d]
            v = vslab[:, h * d:(h + 1) * d]
            if int8:
                st32 = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                if stage == "qk":
                    acc_ref[h, :, :1] += jnp.sum(
                        st32, axis=1, keepdims=True).astype(jnp.float32)
                    continue
                st = st32.astype(jnp.float32) * 0.0883883
            else:
                st = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if stage == "qk":
                    acc_ref[h, :, :1] += jnp.sum(st, axis=1, keepdims=True)
                    continue
                st = st * 0.0883883
            if stage == "cast":
                acc_ref[h, :, :1] += jnp.sum(st, axis=1, keepdims=True)
                continue

            m_prev = m_ref[h, :, :1]
            l_prev = l_ref[h, :, :1]
            m_curr = jnp.maximum(m_prev, jnp.max(st, axis=1, keepdims=True))
            alpha = jnp.exp2((m_prev - m_curr) * LOG2E)
            pmat = jnp.exp2((st - m_curr) * LOG2E)
            l_curr = l_prev * alpha + jnp.sum(pmat, axis=1, keepdims=True)
            m_ref[h] = jnp.broadcast_to(m_curr, m_ref.shape[1:])
            l_ref[h] = jnp.broadcast_to(l_curr, l_ref.shape[1:])
            if stage == "soft":
                acc_ref[h, :, :1] += jnp.sum(pmat, axis=1, keepdims=True)
                continue

            if int8:
                pq = jnp.round(pmat * 127.0).astype(jnp.int8)
                if stage == "pquant":
                    acc_ref[h, :, :1] += jnp.sum(
                        pq, axis=1, keepdims=True).astype(jnp.float32)
                    continue
                pv = jax.lax.dot_general(
                    pq, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * (0.0883883 / 127.0)
            else:
                pq = pmat.astype(jnp.bfloat16)
                if stage == "pquant":
                    acc_ref[h, :, :1] += jnp.sum(
                        pq, axis=1, keepdims=True).astype(jnp.float32)
                    continue
                pv = jax.lax.dot_general(
                    pq, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc_ref[h] = acc_ref[h] * alpha + pv

        @pl.when(ki == nk - 1)
        def _fin():
            o_ref[0, 0] = acc_ref[...]

    return kernel


def run_stage(stage, int8, b=8, hk=8, g=4, smax=8192, bk=1024, d=128,
              iters=64, reps=3):
    rows_n = 8  # g * sq rows padded to a sublane tile
    nk = smax // bk
    rng = np.random.default_rng(0)
    cdtype = jnp.int8 if int8 else jnp.bfloat16
    if int8:
        kc = jnp.asarray(
            rng.integers(-127, 127, (b, smax, hk * d)), jnp.int8)
        vc = jnp.asarray(
            rng.integers(-127, 127, (b, smax, hk * d)), jnp.int8)
        q = jnp.asarray(rng.integers(-127, 127, (b, hk, rows_n, d)), jnp.int8)
    else:
        kc = jnp.asarray(rng.standard_normal((b, smax, hk * d)), jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((b, smax, hk * d)), jnp.bfloat16)
        q = jnp.asarray(
            rng.standard_normal((b, hk, rows_n, d)), jnp.bfloat16)

    kern = make_kernel(stage, int8, hk, bk, rows_n, d)
    grid = (b, nk)

    fn = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hk, rows_n, d), lambda b_, k_: (b_, 0, 0, 0)),
            pl.BlockSpec((1, bk, hk * d), lambda b_, k_: (b_, k_, 0)),
            pl.BlockSpec((1, bk, hk * d), lambda b_, k_: (b_, k_, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, hk, rows_n, d),
                               lambda b_, k_: (b_, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, hk, rows_n, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hk, rows_n, d), jnp.float32),
            pltpu.VMEM((hk, rows_n, 128), jnp.float32),
            pltpu.VMEM((hk, rows_n, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )

    def step(q, kc, vc):
        o = fn(q, kc, vc)
        return q + o[:, 0].astype(q.dtype)  # carry dependency

    dt = benchmark_chained(step, q, kc, vc, iters=iters, reps=reps)
    kv_bytes = 2 * b * smax * hk * d * (1 if int8 else 2)
    print(f"{'int8' if int8 else 'bf16'} {stage:6s}: {dt*1e6:8.1f} us  "
          f"stream {kv_bytes/dt/1e9:7.1f} GB/s", flush=True)
    return dt


if __name__ == "__main__":
    stages = ["dma", "qk", "cast", "soft", "pquant", "full"]
    if len(sys.argv) > 1 and not sys.argv[1].startswith("-"):
        stages = sys.argv[1].split(",")
    for int8 in (False, True):
        for st in stages:
            try:
                run_stage(st, int8)
            except Exception as e:
                print(f"{'int8' if int8 else 'bf16'} {st}: FAIL "
                      f"{type(e).__name__} {str(e)[:140]}", flush=True)
    # transfer-size hypothesis: per-transfer BYTES set the DMA regime, so
    # int8 at bk=2048 should recover the bandwidth bf16 gets at bk=1024
    print("--- int8 transfer-size sweep (dma + full) ---", flush=True)
    for bk in (1024, 2048, 4096):
        for st in ("dma", "full"):
            try:
                run_stage(st, True, bk=bk)
            except Exception as e:
                print(f"int8 bk{bk} {st}: FAIL {type(e).__name__} "
                      f"{str(e)[:140]}", flush=True)
    # end-to-end: the real decode kernel via flash_attn_with_kvcache
    print("--- end-to-end decode (real kernel) ---", flush=True)
    import numpy as np

    from flash_attn_tpu.kernels.flash_decode import flash_attn_with_kvcache
    from flash_attn_tpu.utils.benchmark import benchmark_chained

    b, sq, h, hk, d, smax = 8, 1, 32, 8, 128, 8192
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    lens = jnp.full((b,), smax - 1, jnp.int32)
    kcf = rng.standard_normal((b, smax, hk, d)).astype(np.float32)
    vcf = rng.standard_normal((b, smax, hk, d)).astype(np.float32)
    for name, dt8 in (("bf16", False), ("int8", True)):
        if dt8:
            ds = 0.03
            kd = jnp.full((b, hk), ds, jnp.float32)
            kc = jnp.clip(jnp.round(jnp.asarray(kcf) / ds), -127, 127
                          ).astype(jnp.int8)
            vc = jnp.clip(jnp.round(jnp.asarray(vcf) / ds), -127, 127
                          ).astype(jnp.int8)
            kw = dict(k_descale=kd, v_descale=kd)
        else:
            kc, vc = jnp.asarray(kcf, jnp.bfloat16), jnp.asarray(
                vcf, jnp.bfloat16)
            kw = {}

        def step(q, kc, vc, kw=kw):
            o = flash_attn_with_kvcache(
                q, kc, vc, cache_seqlens=lens, causal=True, **kw)
            return q + o.astype(q.dtype) * 1e-3

        t = benchmark_chained(step, q, kc, vc, iters=64, reps=3)
        kvb = 2 * b * smax * hk * d * (1 if dt8 else 2)
        print(f"e2e {name}: {t*1e6:8.1f} us  {kvb/t/1e9:7.1f} GB/s "
              f"{b*sq/t:,.0f} tok/s", flush=True)
