"""Scheduled-grid packed varlen kernel (kernels/varlen_sched.py) — the
first-class varlen path: schedule construction, feature coverage
(softcap/alibi/window), gradients via the hybrid padded backward, and
router integration (reference: `mha_varlen_fwd`,
`csrc/flash_attn/flash_api.cpp:515`; tile scheduling
`hopper/tile_scheduler.hpp:493`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_varlen_func
from flash_attn_tpu.kernels.varlen_sched import (
    build_varlen_schedule,
    flash_attn_varlen_sched_func,
)
from flash_attn_tpu.utils.testing import attention_ref, check_close


def ref_per_seq(q, k, v, cu_q, cu_k, **kw):
    outs, outs_pt = [], []
    cq, ck = np.asarray(cu_q), np.asarray(cu_k)
    for i in range(len(cq) - 1):
        qi = q[cq[i]:cq[i + 1]][None]
        ki = k[ck[i]:ck[i + 1]][None]
        vi = v[ck[i]:ck[i + 1]][None]
        if qi.shape[1] == 0:
            continue
        if ki.shape[1] == 0:
            outs.append(jnp.zeros_like(qi[0]))
            outs_pt.append(jnp.zeros_like(qi[0]))
            continue
        outs.append(attention_ref(qi, ki, vi, **kw)[0][0])
        outs_pt.append(attention_ref(qi, ki, vi, upcast=False,
                                     reorder_ops=True, **kw)[0][0])
    return jnp.concatenate(outs, 0), jnp.concatenate(outs_pt, 0)


def mk(lens, h=2, d=64, seed=0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    total = sum(lens)
    cu = jnp.asarray(np.cumsum([0] + lens), jnp.int32)
    mkx = lambda: jnp.asarray(rng.standard_normal((total, h, d)), dtype)
    return mkx(), mkx(), mkx(), cu


def test_schedule_tables():
    """Schedule covers exactly the needed pairs, row-major, with coherent
    FIRST/LAST flags."""
    cu = jnp.asarray([0, 100, 160], jnp.int32)
    bq = bk = 64
    qi, ki, fl = build_varlen_schedule(
        cu, cu, 192, 192, bq=bq, bk=bk, causal=True, window=(-1, -1),
        T_max=9)
    qi, ki, fl = map(np.asarray, (qi, ki, fl))
    real = fl != 8  # not EMPTY-padding
    # seq0 covers blocks 0..1 of q and k; q block 1 straddles seq0/seq1
    # every real q block present and each has exactly one FIRST and LAST
    for qb in range(3):
        rows = (qi == qb) & real
        assert rows.any(), qb
        assert ((fl[rows] & 1) != 0).sum() == 1
        assert ((fl[rows] & 2) != 0).sum() == 1
    # row-major ordering among real entries
    keys = qi[real] * 3 + ki[real]
    assert (np.diff(keys) > 0).all()


@pytest.mark.parametrize("causal", [False, True])
def test_sched_matches_oracle(causal):
    lens = [200, 32, 96, 8]
    q, k, v, cu = mk(lens, seed=1)
    out = flash_attn_varlen_sched_func(
        q, k, v, cu, cu, max(lens), max(lens), causal=causal)
    ref, pt = ref_per_seq(q, k, v, cu, cu, causal=causal)
    check_close(out, ref, pt, atol_floor=8e-3)


def test_sched_features():
    """softcap / alibi / window — the round-1 packed-path gaps."""
    lens = [130, 70]
    h = 2
    q, k, v, cu = mk(lens, h=h, seed=2)
    slopes = jnp.asarray([0.08, 0.01], jnp.float32)
    from flash_attn_tpu.utils.testing import attn_bias_from_alibi_slopes

    # alibi
    out = flash_attn_varlen_sched_func(
        q, k, v, cu, cu, max(lens), max(lens), causal=True,
        alibi_slopes=slopes)
    cq = np.asarray(cu)
    for i in range(len(lens)):
        qi = q[cq[i]:cq[i + 1]][None]
        ki = k[cq[i]:cq[i + 1]][None]
        vi = v[cq[i]:cq[i + 1]][None]
        bias = attn_bias_from_alibi_slopes(
            slopes[None], qi.shape[1], ki.shape[1], causal=True)
        ref = attention_ref(qi, ki, vi, attn_bias=bias, causal=True)[0][0]
        pt = attention_ref(qi, ki, vi, attn_bias=bias, causal=True,
                           upcast=False, reorder_ops=True)[0][0]
        check_close(out[cq[i]:cq[i + 1]], ref, pt, atol_floor=8e-3)
    # softcap
    out = flash_attn_varlen_sched_func(
        q, k, v, cu, cu, max(lens), max(lens), causal=True, softcap=25.0)
    ref, pt = ref_per_seq(q, k, v, cu, cu, causal=True, softcap=25.0)
    check_close(out, ref, pt, atol_floor=8e-3)
    # sliding window
    out = flash_attn_varlen_sched_func(
        q, k, v, cu, cu, max(lens), max(lens), window_size=(48, 16))
    ref, pt = ref_per_seq(q, k, v, cu, cu, window_size=(48, 16))
    check_close(out, ref, pt, atol_floor=8e-3)


def test_sched_grads():
    lens = [96, 40, 120]
    q, k, v, cu = mk(lens, seed=3, dtype=jnp.float32)
    do = jnp.asarray(
        np.random.default_rng(9).standard_normal(q.shape), jnp.float32)

    def loss(q, k, v):
        o = flash_attn_varlen_sched_func(
            q, k, v, cu, cu, max(lens), max(lens), causal=True)
        return jnp.sum(o * do)

    gq, gk, gv = jax.grad(loss, (0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        cq = np.asarray(cu)
        t = 0.0
        for i in range(len(lens)):
            qi = q[cq[i]:cq[i + 1]][None]
            o = attention_ref(qi, k[cq[i]:cq[i + 1]][None],
                              v[cq[i]:cq[i + 1]][None], causal=True)[0][0]
            t = t + jnp.sum(o * do[cq[i]:cq[i + 1]])
        return t

    rq, rk, rv = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for n, a, b in [("dq", gq, rq), ("dk", gk, rk), ("dv", gv, rv)]:
        assert float(jnp.abs(a - b).max()) < 2e-3, n


def test_router_uses_sched_path():
    """flash_attn_varlen_func routes ragged batches (now incl. softcap)
    to the scheduled kernel and matches the oracle."""
    lens = [200, 16, 16, 16]
    q, k, v, cu = mk(lens, seed=4)
    out = flash_attn_varlen_func(q, k, v, cu, cu, max(lens), max(lens),
                                 causal=True, softcap=30.0)
    ref, pt = ref_per_seq(q, k, v, cu, cu, causal=True, softcap=30.0)
    check_close(out, ref, pt, atol_floor=8e-3)


def test_sched_cross_attention_lengths():
    """cu_seqlens_q != cu_seqlens_k (cross attention, bottom-right
    causal)."""
    rng = np.random.default_rng(5)
    lens_q = [64, 32]
    lens_k = [128, 80]
    h, d = 2, 64
    cu_q = jnp.asarray(np.cumsum([0] + lens_q), jnp.int32)
    cu_k = jnp.asarray(np.cumsum([0] + lens_k), jnp.int32)
    q = jnp.asarray(rng.standard_normal((sum(lens_q), h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((sum(lens_k), h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((sum(lens_k), h, d)), jnp.bfloat16)
    out = flash_attn_varlen_sched_func(
        q, k, v, cu_q, cu_k, max(lens_q), max(lens_k), causal=True)
    ref, pt = ref_per_seq(q, k, v, cu_q, cu_k, causal=True)
    check_close(out, ref, pt, atol_floor=8e-3)


def test_sched_multi_block_straddle():
    """Regression: sequences straddling block boundaries create
    above-diagonal needed pairs that the causal triangle alone
    undercounts — the table must not truncate (found by on-TPU verify:
    the final q block's LAST entry was dropped and it never finalized)."""
    lens = [700, 120, 50, 200]  # total 1070: seq3 crosses the 1024 line
    q, k, v, cu = mk(lens, h=2, d=64, seed=7)
    out = flash_attn_varlen_sched_func(
        q, k, v, cu, cu, max(lens), max(lens), causal=True)
    ref, pt = ref_per_seq(q, k, v, cu, cu, causal=True)
    check_close(out, ref, pt, atol_floor=8e-3)
    # schedule invariant: every in-range q block has exactly one LAST
    from flash_attn_tpu.kernels.varlen_sched import (
        _sched_t_max,
        build_varlen_schedule,
    )

    T = _sched_t_max(3, 3, True, 512, 512, True, len(lens))
    qi, ki, fl = build_varlen_schedule(
        cu, cu, 1536, 1536, bq=512, bk=512, causal=True, window=(-1, -1),
        T_max=T)
    qi, fl = np.asarray(qi), np.asarray(fl)
    real = fl != 8
    for qb in range(3):
        assert ((fl[(qi == qb) & real] & 2) != 0).sum() == 1, qb


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("ragged", [True, False])
def test_varlen_fp8(causal, ragged):
    """FP8 varlen fwd with per-(seq, kv-head) descale (reference scenario
    `standalone/src/test_fp8_varlen.cpp`; descale plumbing
    `hopper/flash_api.cpp:673-707`).  `ragged` picks the packed-scheduled
    route; uniform lengths keep the padded route — both must hold the gate."""
    lens = [384, 48, 160, 32] if ragged else [96, 96, 96, 96]
    h, hk, d = 4, 2, 64
    g = h // hk
    rng = np.random.default_rng(11)
    total = sum(lens)
    cu = jnp.asarray(np.cumsum([0] + lens), jnp.int32)
    q = jnp.asarray(rng.standard_normal((total, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((total, hk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((total, hk, d)), jnp.float32)

    # per-(seq, kv-head) symmetric e4m3 quantisation of the packed streams
    def quant(x, nh, cu_):
        b = len(lens)
        xq = np.zeros(x.shape, np.float32)
        ds = np.zeros((b, hk), np.float32)
        cn = np.asarray(cu_)
        for i in range(b):
            seg = np.asarray(x[cn[i]:cn[i + 1]], np.float32)
            if nh == h:  # q: descale shared within each kv-head group
                segg = seg.reshape(seg.shape[0], hk, g * d)
                amax = np.abs(segg).max(axis=(0, 2))
            else:
                amax = np.abs(seg).max(axis=(0, 2))
            sc = 448.0 / np.maximum(amax, 1e-12)
            rep = np.repeat(sc, g) if nh == h else sc
            xq[cn[i]:cn[i + 1]] = seg * rep[None, :, None]
            ds[i] = 1.0 / sc
        return jnp.asarray(xq).astype(jnp.float8_e4m3fn), jnp.asarray(ds)

    qq, q_ds = quant(q, h, cu)
    kq, k_ds = quant(k, hk, cu)
    vq, v_ds = quant(v, hk, cu)

    out = flash_attn_varlen_func(
        qq, kq, vq, cu, cu, max(lens), max(lens), causal=causal,
        q_descale=q_ds, k_descale=k_ds, v_descale=v_ds,
    )
    assert out.dtype == jnp.bfloat16

    # oracle on the dequantised packed streams (exactly what the kernel sees)
    def deq(xq, ds, nh):
        cn = np.asarray(cu)
        xf = np.asarray(xq, np.float32)
        for i in range(len(lens)):
            rep = np.repeat(np.asarray(ds)[i], g) if nh == h else np.asarray(ds)[i]
            xf[cn[i]:cn[i + 1]] *= rep[None, :, None]
        return jnp.asarray(xf)

    qd, kd, vd = deq(qq, q_ds, h), deq(kq, k_ds, hk), deq(vq, v_ds, hk)
    out_ref, _ = ref_per_seq(qd, kd, vd, cu, cu, causal=causal)
    out_pt, _ = ref_per_seq(
        qd.astype(jnp.bfloat16), kd.astype(jnp.bfloat16),
        vd.astype(jnp.bfloat16), cu, cu, causal=causal)
    # The folded-descale path rounds q to bf16 twice (descale fold +
    # the kernel's scale*log2e fold) — one rounding more than the
    # yardstick; the repo's standard absolute floor covers that ulp.
    check_close(out, out_ref, out_pt, atol_floor=8e-3)


def test_sched_dropout_grads():
    """Dropout through the packed kernel must agree EXACTLY with a dense
    reference masked by the same packed-coordinate keep mask, both in the
    forward and in gradients via the padded backward's packed_dropout
    offsets (round-2 gap: the padded hash differed, so dropout grads
    raised; reference validates dropout via the extracted S_dmask,
    `tests/test_flash_attn.py`)."""
    from flash_attn_tpu.kernels.flash_fwd import dropout_keep

    lens = [96, 40, 120]
    p_drop, seed = 0.3, 7
    q, k, v, cu = mk(lens, seed=4, dtype=jnp.float32)
    h = q.shape[1]
    do = jnp.asarray(
        np.random.default_rng(11).standard_normal(q.shape), jnp.float32)

    def loss(q, k, v):
        o = flash_attn_varlen_sched_func(
            q, k, v, cu, cu, max(lens), max(lens), causal=True,
            dropout_p=p_drop, dropout_seed=seed)
        return jnp.sum(o * do), o

    (_, o), grads = jax.value_and_grad(loss, (0, 1, 2), has_aux=True)(
        q, k, v)

    # dense per-seq reference with the SAME keep mask (packed coords, b=0)
    def loss_ref(q, k, v):
        cq = np.asarray(cu)
        t = 0.0
        outs = []
        for i in range(len(lens)):
            sl = slice(cq[i], cq[i + 1])
            qi, ki, vi = q[sl], k[sl], v[sl]
            n = lens[i]
            s = jnp.einsum("qhd,khd->hqk", qi, ki) / np.sqrt(q.shape[-1])
            causal_m = (jnp.arange(n)[:, None] >= jnp.arange(n)[None, :])
            s = jnp.where(causal_m[None], s, -jnp.inf)
            p = jax.nn.softmax(s, axis=-1)
            rows = cq[i] + jnp.arange(n, dtype=jnp.int32)[:, None]
            cols = cq[i] + jnp.arange(n, dtype=jnp.int32)[None, :]
            keep = jnp.stack([
                dropout_keep(jnp.int32(seed), 0, hh, rows, cols, p_drop)
                for hh in range(h)])
            p = jnp.where(keep, p, 0.0) / (1.0 - p_drop)
            oi = jnp.einsum("hqk,khd->qhd", p, vi)
            outs.append(oi)
            t = t + jnp.sum(oi * do[sl])
        return t, jnp.concatenate(outs, 0)

    (_, o_ref), grads_ref = jax.value_and_grad(
        loss_ref, (0, 1, 2), has_aux=True)(q, k, v)
    assert float(jnp.abs(o - o_ref).max()) < 2e-4
    for n, a, b in zip("qkv", grads, grads_ref):
        assert float(jnp.abs(a - b).max()) < 2e-3, n


@pytest.mark.parametrize("case", ["gqa", "window", "dropout", "cross"])
def test_packed_bwd_matches_padded(case, monkeypatch):
    """First-class packed backward (`_varlen_sched_bwd`, the varlen
    `run_mha_bwd` role, `csrc/flash_attn/flash_api.cpp:757`) must agree
    with the padded-gather fallback backward it replaced — on TPU the
    MHA cases match bitwise."""
    import os

    lens_q = [96, 40, 120]
    lens_k = None
    h, hk, d = 4, 4, 64
    kw = dict(causal=True)
    if case == "gqa":
        h, hk = 8, 2
    elif case == "window":
        kw = dict(causal=False, window_size=(48, 16))
    elif case == "dropout":
        kw = dict(causal=True, dropout_p=0.25, dropout_seed=13)
    elif case == "cross":
        lens_k = [150, 64, 200]
        kw = dict(causal=False)

    rng = np.random.default_rng(17)
    cu_q = jnp.asarray(np.cumsum([0] + lens_q), jnp.int32)
    cu_k = (cu_q if lens_k is None
            else jnp.asarray(np.cumsum([0] + lens_k), jnp.int32))
    tq = sum(lens_q)
    tk = tq if lens_k is None else sum(lens_k)
    q = jnp.asarray(rng.standard_normal((tq, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((tk, hk, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((tk, hk, d)), jnp.bfloat16)
    do = jnp.asarray(rng.standard_normal((tq, h, d)), jnp.bfloat16)
    mq = max(lens_q)
    mk_ = mq if lens_k is None else max(lens_k)

    def loss(q, k, v):
        o = flash_attn_varlen_sched_func(
            q, k, v, cu_q, cu_k, mq, mk_, **kw)
        return jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32))

    g_packed = jax.grad(loss, (0, 1, 2))(q, k, v)
    monkeypatch.setenv("FLASH_ATTN_TPU_NO_PACKED_BWD", "1")
    g_padded = jax.grad(loss, (0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_packed, g_padded):
        delta = float(jnp.abs(a.astype(jnp.float32)
                              - b.astype(jnp.float32)).max())
        scale = float(jnp.abs(b.astype(jnp.float32)).max())
        assert delta <= 0.02 * max(1.0, scale), (case, name, delta, scale)
