"""Bisect the 29us/tick fixed overhead of the scheduled-varlen forward.

diag_varlen_tick_cost: all-empty + constant tables still costs 29us/tick
(vs ~2.5us in the dense scheduled kernel).  Times stripped-down kernel
variants on the same grid/specs to find the responsible piece:
  K0  empty body
  K1  + scalar/table reads + qa/ka prologue
  K2  + predicated _init region (scratch zeroing, off)
  K3  + one predicated interior body (off)
  K4  full kernel (reference point)
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.kernels import varlen_sched as vs
from flash_attn_tpu.kernels.block_sizes import round_up
from flash_attn_tpu.utils.benchmark import benchmark_chained

H, D = 16, 128
BQ = BK = 1024
BH = 4
T = 256
TOTAL_P = 16384


def make_kernel(level):
    def kernel(qi_ref, ki_ref, fl_ref, q_ref, k_ref, v_ref, qa_ref, ka_ref,
               o_ref, acc_ref, m_ref, l_ref):
        if level == 0:
            return
        t = pl.program_id(1)
        qi = qi_ref[t]
        ki = ki_ref[t]
        fl = fl_ref[t]
        first = (fl & vs._FIRST) != 0
        empty = (fl & vs._EMPTY) != 0
        qa = qa_ref[:, :1]
        ka = ka_ref[0, :1, :]
        seg_q = jax.lax.shift_right_logical(qa, 16)
        seg_k = jax.lax.shift_right_logical(ka, 16)
        pq = qa & 0xFFFF
        pk = ka & 0xFFFF
        if level == 1:
            # keep the values live with a cheap predicated use
            @pl.when(jnp.logical_and(first, empty))
            def _use():
                m_ref[0, :, :1] = (pq + pk[:, :1] + seg_q
                                   + seg_k[:, :1]).astype(jnp.float32)
            return

        @pl.when(jnp.logical_and(first, empty))
        def _init():
            m_ref[...] = jnp.full_like(m_ref, -1e30)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        if level == 2:
            return

        live = jnp.logical_not(empty)

        def body(with_mask):
            bias = None
            if with_mask:
                mask = jnp.logical_or(seg_q != seg_k, pk < pq)
                bias = jnp.where(mask, -3e38, 0.0).astype(jnp.float32)
            prev = None
            for hh in range(BH):
                s = jax.lax.dot_general(
                    q_ref[hh], k_ref[hh], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if bias is not None:
                    s = s + bias
                if prev is not None:
                    smpv(*prev)
                prev = (hh, s)
            smpv(*prev)

        def smpv(hh, s):
            m_prev = m_ref[hh, :, :1]
            l_prev = l_ref[hh, :, :1]
            m_curr = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp2(m_prev - m_curr)
            pmat = jnp.exp2(s - m_curr)
            l_curr = l_prev * alpha + jnp.sum(pmat, axis=1, keepdims=True)
            m_ref[hh] = jnp.broadcast_to(m_curr, m_ref.shape[1:])
            l_ref[hh] = jnp.broadcast_to(l_curr, l_ref.shape[1:])
            pv = jax.lax.dot_general(
                pmat.astype(v_ref.dtype), v_ref[hh],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[hh] = acc_ref[hh] * alpha + pv

        if level == 3:
            @pl.when(live)
            def _interior():
                body(False)
        else:
            boundary = (fl & vs._BOUND) != 0

            @pl.when(jnp.logical_and(live, jnp.logical_not(boundary)))
            def _interior():
                body(False)

            @pl.when(jnp.logical_and(live, boundary))
            def _bound():
                body(True)

        last = (fl & vs._LAST) != 0

        @pl.when(last)
        def _finalize():
            for hh in range(BH):
                l_final = l_ref[hh, :, :1]
                l_safe = jnp.where(l_final == 0.0, 1.0, l_final)
                o_ref[hh] = (acc_ref[hh] / l_safe).astype(o_ref.dtype)

    return kernel


def launch(level, qi, ki, fl, qT, kT, vT, qa_rep, ka_rows):
    def q_map(hb_, t, qi_r, ki_r, fl_r):
        return (hb_, qi_r[t], 0)

    def kv_map(hb_, t, qi_r, ki_r, fl_r):
        return (hb_, ki_r[t], 0)

    def qa_map(hb_, t, qi_r, ki_r, fl_r):
        return (qi_r[t], 0)

    def ka_map(hb_, t, qi_r, ki_r, fl_r):
        return (ki_r[t], 0, 0)

    return pl.pallas_call(
        make_kernel(level),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(H // BH, T),
            in_specs=[
                pl.BlockSpec((BH, BQ, D), q_map),
                pl.BlockSpec((BH, BK, D), kv_map),
                pl.BlockSpec((BH, BK, D), kv_map),
                pl.BlockSpec((BQ, vs.STAT), qa_map),
                pl.BlockSpec((1, vs.STAT, BK), ka_map),
            ],
            out_specs=[pl.BlockSpec((BH, BQ, D), q_map)],
            scratch_shapes=[
                pltpu.VMEM((BH, BQ, D), jnp.float32),
                pltpu.VMEM((BH, BQ, vs.LANES), jnp.float32),
                pltpu.VMEM((BH, BQ, vs.LANES), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((H, TOTAL_P, D), qT.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qi, ki, fl, qT, kT, vT, qa_rep, ka_rows)[0]


def main():
    rng = np.random.default_rng(0)
    qT = jnp.asarray(rng.standard_normal((H, TOTAL_P, D)), jnp.bfloat16)
    kT = jnp.asarray(rng.standard_normal((H, TOTAL_P, D)), jnp.bfloat16)
    vT = jnp.asarray(rng.standard_normal((H, TOTAL_P, D)), jnp.bfloat16)
    qa_rep = jnp.zeros((TOTAL_P, vs.STAT), jnp.int32)
    ka_rows = jnp.zeros((TOTAL_P // BK, vs.STAT, BK), jnp.int32)
    # constant tables, all empty: zero DMA transitions, zero compute
    qi = jnp.zeros((T,), jnp.int32)
    ki = jnp.zeros((T,), jnp.int32)
    fl = jnp.full((T,), vs._EMPTY, jnp.int32)

    for level in [0, 1, 2, 3, 4]:
        def step(qc, kT, vT):
            o = launch(level, qi, ki, fl, qc, kT, vT, qa_rep, ka_rows)
            return qc + o.astype(qc.dtype) * 1e-3, kT, vT

        dt = benchmark_chained(lambda c: step(*c), (qT, kT, vT),
                               iters=8, reps=3, agg="min")
        print(f"K{level}: {dt*1e3:7.2f} ms  "
              f"{dt/T/(H//BH)*1e6:6.2f} us/tick", flush=True)


if __name__ == "__main__" and "k04" in sys.argv[1:]:
    print("devices:", jax.devices())
    main()


def launch2(qi, ki, fl, qT, kT, vT, qa_rep, ka_rows, *, cost=False,
            lse_lanes=False, four_variants=False):
    """K4 + optional deltas matching the real kernel."""
    def q_map(hb_, t, qi_r, ki_r, fl_r):
        return (hb_, qi_r[t], 0)

    def kv_map(hb_, t, qi_r, ki_r, fl_r):
        return (hb_, ki_r[t], 0)

    def qa_map(hb_, t, qi_r, ki_r, fl_r):
        return (qi_r[t], 0)

    def ka_map(hb_, t, qi_r, ki_r, fl_r):
        return (ki_r[t], 0, 0)

    def kernel(qi_ref, ki_ref, fl_ref, q_ref, k_ref, v_ref, qa_ref, ka_ref,
               *refs):
        refs = list(refs)
        if lse_lanes:
            o_ref, lse_ref, acc_ref, m_ref, l_ref = refs
        else:
            o_ref, acc_ref, m_ref, l_ref = refs
            lse_ref = None
        t = pl.program_id(1)
        fl = fl_ref[t]
        first = (fl & vs._FIRST) != 0
        empty = (fl & vs._EMPTY) != 0
        boundary = (fl & vs._BOUND) != 0
        last = (fl & vs._LAST) != 0
        qa = qa_ref[:, :1]
        ka = ka_ref[0, :1, :]
        seg_q = jax.lax.shift_right_logical(qa, 16)
        seg_k = jax.lax.shift_right_logical(ka, 16)
        pq = qa & 0xFFFF
        pk = ka & 0xFFFF

        @pl.when(jnp.logical_and(first, empty))
        def _init():
            m_ref[...] = jnp.full_like(m_ref, -1e30)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        def smpv(hh, s, fresh=False):
            if fresh:
                m_curr = jnp.maximum(
                    jnp.full((BQ, 1), -1e30, jnp.float32),
                    jnp.max(s, axis=1, keepdims=True))
            else:
                m_prev = m_ref[hh, :, :1]
                l_prev = l_ref[hh, :, :1]
                m_curr = jnp.maximum(m_prev,
                                     jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp2(m_prev - m_curr)
            pmat = jnp.exp2(s - m_curr)
            psum = jnp.sum(pmat, axis=1, keepdims=True)
            l_curr = psum if fresh else l_prev * alpha + psum
            m_ref[hh] = jnp.broadcast_to(m_curr, m_ref.shape[1:])
            l_ref[hh] = jnp.broadcast_to(l_curr, l_ref.shape[1:])
            pv = jax.lax.dot_general(
                pmat.astype(v_ref.dtype), v_ref[hh],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[hh] = pv if fresh else acc_ref[hh] * alpha + pv

        def body(with_mask, fresh=False):
            bias = None
            if with_mask:
                mask = jnp.logical_or(seg_q != seg_k, pk < pq)
                bias = jnp.where(mask, -3e38, 0.0).astype(jnp.float32)
            prev = None
            for hh in range(BH):
                s = jax.lax.dot_general(
                    q_ref[hh], k_ref[hh], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if bias is not None:
                    s = s + bias
                if prev is not None:
                    smpv(*prev, fresh)
                prev = (hh, s)
            smpv(*prev, fresh)

        live = jnp.logical_not(empty)
        if four_variants:
            @pl.when(jnp.logical_and(jnp.logical_and(live, first),
                                     jnp.logical_not(boundary)))
            def _fi():
                body(False, True)

            @pl.when(jnp.logical_and(jnp.logical_and(live, first), boundary))
            def _fb():
                body(True, True)

            @pl.when(jnp.logical_and(
                jnp.logical_and(live, jnp.logical_not(first)),
                jnp.logical_not(boundary)))
            def _in():
                body(False)

            @pl.when(jnp.logical_and(
                jnp.logical_and(live, jnp.logical_not(first)), boundary))
            def _bn():
                body(True)
        else:
            @pl.when(jnp.logical_and(live, jnp.logical_not(boundary)))
            def _in2():
                body(False)

            @pl.when(jnp.logical_and(live, boundary))
            def _bn2():
                body(True)

        @pl.when(last)
        def _finalize():
            for hh in range(BH):
                l_final = l_ref[hh, :, :1]
                l_safe = jnp.where(l_final == 0.0, 1.0, l_final)
                o_ref[hh] = (acc_ref[hh] / l_safe).astype(o_ref.dtype)
                if lse_ref is not None:
                    m_final = m_ref[hh, :, :1]
                    lse = m_final + jnp.log(l_safe)
                    lse_ref[hh] = jnp.broadcast_to(lse, lse_ref.shape[1:])

    out_specs = [pl.BlockSpec((BH, BQ, D), q_map)]
    out_shape = [jax.ShapeDtypeStruct((H, TOTAL_P, D), qT.dtype)]
    if lse_lanes:
        out_specs.append(pl.BlockSpec((BH, BQ, vs.LANES), q_map))
        out_shape.append(jax.ShapeDtypeStruct(
            (H, TOTAL_P, vs.LANES), jnp.float32))
    kw = {}
    if cost:
        kw["cost_estimate"] = pl.CostEstimate(
            flops=4 * H * BQ * BK * D * T,
            bytes_accessed=3 * H * TOTAL_P * D * 2,
            transcendentals=H * BQ * BK * T,
        )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(H // BH, T),
            in_specs=[
                pl.BlockSpec((BH, BQ, D), q_map),
                pl.BlockSpec((BH, BK, D), kv_map),
                pl.BlockSpec((BH, BK, D), kv_map),
                pl.BlockSpec((BQ, vs.STAT), qa_map),
                pl.BlockSpec((1, vs.STAT, BK), ka_map),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((BH, BQ, D), jnp.float32),
                pltpu.VMEM((BH, BQ, vs.LANES), jnp.float32),
                pltpu.VMEM((BH, BQ, vs.LANES), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        **kw,
    )(qi, ki, fl, qT, kT, vT, qa_rep, ka_rows)


def main2():
    rng = np.random.default_rng(0)
    qT = jnp.asarray(rng.standard_normal((H, TOTAL_P, D)), jnp.bfloat16)
    kT = jnp.asarray(rng.standard_normal((H, TOTAL_P, D)), jnp.bfloat16)
    vT = jnp.asarray(rng.standard_normal((H, TOTAL_P, D)), jnp.bfloat16)
    qa_rep = jnp.zeros((TOTAL_P, vs.STAT), jnp.int32)
    ka_rows = jnp.zeros((TOTAL_P // BK, vs.STAT, BK), jnp.int32)
    qi = jnp.zeros((T,), jnp.int32)
    ki = jnp.zeros((T,), jnp.int32)
    fl = jnp.full((T,), vs._EMPTY, jnp.int32)

    for name, kw in [
        ("K5 cost_estimate", dict(cost=True)),
        ("K6 four variants", dict(four_variants=True)),
        ("K7 LANES lse out", dict(lse_lanes=True)),
        ("K8 all three", dict(cost=True, four_variants=True,
                              lse_lanes=True)),
    ]:
        def step(qc, kT, vT, kw=kw):
            res = launch2(qi, ki, fl, qc, kT, vT, qa_rep, ka_rows, **kw)
            o = res[0] if isinstance(res, (list, tuple)) else res
            return qc + o.astype(qc.dtype) * 1e-3, kT, vT

        dt = benchmark_chained(lambda c: step(*c), (qT, kT, vT),
                               iters=8, reps=3, agg="min")
        print(f"{name}: {dt*1e3:7.2f} ms  "
              f"{dt/T/(H//BH)*1e6:6.2f} us/tick", flush=True)


if __name__ == "__main__" and "k58" in sys.argv[1:]:
    main2()


def launch3(qi, ki, fl, code, qT, kT, vT, qa_rep, ka_rows):
    """K9: four matmul bodies dispatched by a single `code == i` compare
    (the dense scheduled kernel's ctype pattern) instead of compound
    and/or predicates.  Tests whether the 28us/tick cliff (K6) is about
    the NUMBER of bodies or the PREDICATE FORM."""
    def q_map(hb_, t, qi_r, ki_r, fl_r, cd_r):
        return (hb_, qi_r[t], 0)

    def kv_map(hb_, t, qi_r, ki_r, fl_r, cd_r):
        return (hb_, ki_r[t], 0)

    def qa_map(hb_, t, qi_r, ki_r, fl_r, cd_r):
        return (qi_r[t], 0)

    def ka_map(hb_, t, qi_r, ki_r, fl_r, cd_r):
        return (ki_r[t], 0, 0)

    def kernel(qi_ref, ki_ref, fl_ref, cd_ref, q_ref, k_ref, v_ref,
               qa_ref, ka_ref, o_ref, acc_ref, m_ref, l_ref):
        t = pl.program_id(1)
        fl = fl_ref[t]
        code = cd_ref[t]
        first = (fl & vs._FIRST) != 0
        last = (fl & vs._LAST) != 0
        qa = qa_ref[:, :1]
        ka = ka_ref[0, :1, :]
        seg_q = jax.lax.shift_right_logical(qa, 16)
        seg_k = jax.lax.shift_right_logical(ka, 16)
        pq = qa & 0xFFFF
        pk = ka & 0xFFFF

        @pl.when(first)
        def _init():
            m_ref[...] = jnp.full_like(m_ref, -1e30)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        def smpv(hh, s, fresh=False):
            if fresh:
                m_curr = jnp.maximum(
                    jnp.full((BQ, 1), -1e30, jnp.float32),
                    jnp.max(s, axis=1, keepdims=True))
            else:
                m_prev = m_ref[hh, :, :1]
                l_prev = l_ref[hh, :, :1]
                m_curr = jnp.maximum(m_prev,
                                     jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp2(m_prev - m_curr)
            pmat = jnp.exp2(s - m_curr)
            psum = jnp.sum(pmat, axis=1, keepdims=True)
            l_curr = psum if fresh else l_prev * alpha + psum
            m_ref[hh] = jnp.broadcast_to(m_curr, m_ref.shape[1:])
            l_ref[hh] = jnp.broadcast_to(l_curr, l_ref.shape[1:])
            pv = jax.lax.dot_general(
                pmat.astype(v_ref.dtype), v_ref[hh],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[hh] = pv if fresh else acc_ref[hh] * alpha + pv

        def body(with_mask, fresh=False):
            bias = None
            if with_mask:
                mask = jnp.logical_or(seg_q != seg_k, pk < pq)
                bias = jnp.where(mask, -3e38, 0.0).astype(jnp.float32)
            prev = None
            for hh in range(BH):
                s = jax.lax.dot_general(
                    q_ref[hh], k_ref[hh], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if bias is not None:
                    s = s + bias
                if prev is not None:
                    smpv(*prev, fresh)
                prev = (hh, s)
            smpv(*prev, fresh)

        for idx, (wm, fr) in enumerate(
                [(False, False), (True, False), (False, True),
                 (True, True)]):
            @pl.when(code == idx)
            def _b(wm=wm, fr=fr):
                body(wm, fr)

        @pl.when(last)
        def _finalize():
            for hh in range(BH):
                l_final = l_ref[hh, :, :1]
                l_safe = jnp.where(l_final == 0.0, 1.0, l_final)
                o_ref[hh] = (acc_ref[hh] / l_safe).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(H // BH, T),
            in_specs=[
                pl.BlockSpec((BH, BQ, D), q_map),
                pl.BlockSpec((BH, BK, D), kv_map),
                pl.BlockSpec((BH, BK, D), kv_map),
                pl.BlockSpec((BQ, vs.STAT), qa_map),
                pl.BlockSpec((1, vs.STAT, BK), ka_map),
            ],
            out_specs=[pl.BlockSpec((BH, BQ, D), q_map)],
            scratch_shapes=[
                pltpu.VMEM((BH, BQ, D), jnp.float32),
                pltpu.VMEM((BH, BQ, vs.LANES), jnp.float32),
                pltpu.VMEM((BH, BQ, vs.LANES), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((H, TOTAL_P, D), qT.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qi, ki, fl, code, qT, kT, vT, qa_rep, ka_rows)[0]


def main3():
    rng = np.random.default_rng(0)
    qT = jnp.asarray(rng.standard_normal((H, TOTAL_P, D)), jnp.bfloat16)
    kT = jnp.asarray(rng.standard_normal((H, TOTAL_P, D)), jnp.bfloat16)
    vT = jnp.asarray(rng.standard_normal((H, TOTAL_P, D)), jnp.bfloat16)
    qa_rep = jnp.zeros((TOTAL_P, vs.STAT), jnp.int32)
    ka_rows = jnp.zeros((TOTAL_P // BK, vs.STAT, BK), jnp.int32)
    qi = jnp.zeros((T,), jnp.int32)
    ki = jnp.zeros((T,), jnp.int32)
    fl = jnp.full((T,), vs._EMPTY, jnp.int32)
    code = jnp.full((T,), 7, jnp.int32)  # no body selected: all dead

    def step(qc, kT, vT):
        o = launch3(qi, ki, fl, code, qc, kT, vT, qa_rep, ka_rows)
        return qc + o.astype(qc.dtype) * 1e-3, kT, vT

    dt = benchmark_chained(lambda c: step(*c), (qT, kT, vT),
                           iters=8, reps=3, agg="min")
    print(f"K9 code-dispatch 4 bodies: {dt*1e3:7.2f} ms  "
          f"{dt/T/(H//BH)*1e6:6.2f} us/tick", flush=True)


if __name__ == "__main__" and "k9" in sys.argv[1:]:
    main3()


def launch4(n_bodies, bh, qi, ki, fl, qT, kT, vT):
    """K10: N identical interior bodies, block_h=bh.  Separates
    body-count from VMEM-pressure as the cliff trigger."""
    def q_map(hb_, t, qi_r, ki_r, fl_r):
        return (hb_, qi_r[t], 0)

    def kv_map(hb_, t, qi_r, ki_r, fl_r):
        return (hb_, ki_r[t], 0)

    def kernel(qi_ref, ki_ref, fl_ref, q_ref, k_ref, v_ref,
               o_ref, acc_ref, m_ref, l_ref):
        t = pl.program_id(1)
        fl = fl_ref[t]
        first = (fl & vs._FIRST) != 0
        last = (fl & vs._LAST) != 0
        code = jax.lax.shift_right_logical(fl, 4)

        @pl.when(first)
        def _init():
            m_ref[...] = jnp.full_like(m_ref, -1e30)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        def smpv(hh, s):
            m_prev = m_ref[hh, :, :1]
            l_prev = l_ref[hh, :, :1]
            m_curr = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp2(m_prev - m_curr)
            pmat = jnp.exp2(s - m_curr)
            l_curr = l_prev * alpha + jnp.sum(pmat, axis=1, keepdims=True)
            m_ref[hh] = jnp.broadcast_to(m_curr, m_ref.shape[1:])
            l_ref[hh] = jnp.broadcast_to(l_curr, l_ref.shape[1:])
            pv = jax.lax.dot_general(
                pmat.astype(v_ref.dtype), v_ref[hh],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[hh] = acc_ref[hh] * alpha + pv

        def body():
            prev = None
            for hh in range(bh):
                s = jax.lax.dot_general(
                    q_ref[hh], k_ref[hh], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if prev is not None:
                    smpv(*prev)
                prev = (hh, s)
            smpv(*prev)

        for idx in range(n_bodies):
            @pl.when(code == idx)
            def _b():
                body()

        @pl.when(last)
        def _finalize():
            for hh in range(bh):
                l_final = l_ref[hh, :, :1]
                l_safe = jnp.where(l_final == 0.0, 1.0, l_final)
                o_ref[hh] = (acc_ref[hh] / l_safe).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(H // bh, T),
            in_specs=[
                pl.BlockSpec((bh, BQ, D), q_map),
                pl.BlockSpec((bh, BK, D), kv_map),
                pl.BlockSpec((bh, BK, D), kv_map),
            ],
            out_specs=[pl.BlockSpec((bh, BQ, D), q_map)],
            scratch_shapes=[
                pltpu.VMEM((bh, BQ, D), jnp.float32),
                pltpu.VMEM((bh, BQ, vs.LANES), jnp.float32),
                pltpu.VMEM((bh, BQ, vs.LANES), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((H, TOTAL_P, D), qT.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qi, ki, fl, qT, kT, vT)[0]


def main4():
    rng = np.random.default_rng(0)
    qT = jnp.asarray(rng.standard_normal((H, TOTAL_P, D)), jnp.bfloat16)
    kT = jnp.asarray(rng.standard_normal((H, TOTAL_P, D)), jnp.bfloat16)
    vT = jnp.asarray(rng.standard_normal((H, TOTAL_P, D)), jnp.bfloat16)
    qi = jnp.zeros((T,), jnp.int32)
    ki = jnp.zeros((T,), jnp.int32)
    fl = jnp.full((T,), vs._EMPTY | (15 << 4), jnp.int32)  # code 15: dead

    for n_bodies, bh in [(2, 4), (3, 4), (4, 4), (4, 2)]:
        def step(qc, kT, vT):
            o = launch4(n_bodies, bh, qi, ki, fl, qc, kT, vT)
            return qc + o.astype(qc.dtype) * 1e-3, kT, vT

        dt = benchmark_chained(lambda c: step(*c), (qT, kT, vT),
                               iters=8, reps=3, agg="min")
        print(f"K10 n={n_bodies} bh={bh}: {dt*1e3:7.2f} ms  "
              f"{dt/T/(H//bh)*1e6:6.2f} us/tick", flush=True)


if __name__ == "__main__" and "k10" in sys.argv[1:]:
    main4()
