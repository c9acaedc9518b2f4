"""Programmable-attention tests (mask mods, score mods, block sparsity).

Model: reference `tests/cute/test_mask_mod.py`, `test_score_mod.py`,
`test_block_sparsity.py` — flex output must match a dense reference that
applies the same mod as an explicit bias/mask, within the usual <=2x
low-precision-reference tolerance.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.kernels.flex import (
    BlockMask,
    create_block_mask,
    flex_attention,
)
from flash_attn_tpu.utils.testing import attention_ref, check_close


def make_qkv(b, sq, sk, h, hk, d, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, sk, hk, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, sk, hk, d)), dtype)
    return q, k, v


def dense_ref(q, k, v, mask_mod=None, score_bias=None, upcast=True,
              reorder_ops=False):
    """Reference via attention_ref with an explicit bias built from the mods."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    bias = jnp.zeros((b, h, sq, sk), jnp.float32)
    if score_bias is not None:
        bias = bias + score_bias
    if mask_mod is not None:
        qi = jnp.arange(sq, dtype=jnp.int32)
        ki = jnp.arange(sk, dtype=jnp.int32)
        m = jax.vmap(lambda b_: jax.vmap(lambda h_: jax.vmap(
            jax.vmap(lambda q_, k_: mask_mod(b_, h_, q_, k_), (None, 0)),
            (0, None))(qi, ki))(jnp.arange(h)))(jnp.arange(b))
        bias = jnp.where(m, bias, -jnp.inf)
    out, _ = attention_ref(q, k, v, attn_bias=bias, upcast=upcast,
                           reorder_ops=reorder_ops)
    return out


def causal_mask(b, h, q_idx, kv_idx):
    return q_idx >= kv_idx


def doc_mask_factory(doc_ids):
    def doc_mask(b, h, q_idx, kv_idx):
        return doc_ids[b, q_idx] == doc_ids[b, kv_idx]
    return doc_mask


def test_flex_mask_mod_causal():
    b, h, sq, sk, d = 2, 4, 224, 224, 64
    q, k, v = make_qkv(b, sq, sk, h, h, d)
    out = flex_attention(q, k, v, mask_mod=causal_mask, block_q=128, block_k=128)
    out_ref = dense_ref(q, k, v, mask_mod=causal_mask)
    out_pt = dense_ref(q, k, v, mask_mod=causal_mask, upcast=False,
                       reorder_ops=True)
    check_close(out, out_ref, out_pt)


def test_flex_document_mask():
    """Document masking (`mask_definitions.py` flex_document_mask) via the
    aux-tensor mechanism (`cute/interface.py:114` aux_tensors), with block
    sparsity computed from the same aux."""
    b, h, s, d = 2, 2, 256, 64
    rng = np.random.default_rng(0)
    # random document boundaries per batch
    doc = np.cumsum(rng.random((b, s)) < 0.02, axis=1)
    doc_ids = jnp.asarray(doc, jnp.int32)
    mm_ref = doc_mask_factory(doc_ids)  # closure form for the XLA reference

    def mm(b_, h_, q_idx, kv_idx, qa, ka):  # aux form for the kernel
        return qa == ka

    q, k, v = make_qkv(b, s, s, h, h, d)
    out = flex_attention(q, k, v, mask_mod=mm, q_aux=doc_ids, kv_aux=doc_ids,
                         block_q=128, block_k=128)
    out_ref = dense_ref(q, k, v, mask_mod=mm_ref)
    out_pt = dense_ref(q, k, v, mask_mod=mm_ref, upcast=False,
                       reorder_ops=True)
    check_close(out, out_ref, out_pt)

    # block-sparse version skips cross-document blocks entirely
    bm = create_block_mask(mm, b, h, s, s, block_q=128, block_k=128,
                           q_aux=doc_ids, kv_aux=doc_ids)
    out_s = flex_attention(q, k, v, mask_mod=mm, q_aux=doc_ids,
                           kv_aux=doc_ids, block_mask=bm)
    check_close(out_s, out_ref, out_pt)


def test_flex_score_mod_alibi_like():
    """Relative-position score mod + grads through in-kernel jax.vjp."""
    b, h, sq, sk, d = 2, 2, 192, 192, 64
    slope = 0.05

    def score_mod(s, b_, h_, q_idx, kv_idx):
        return s - slope * jnp.abs(q_idx - kv_idx).astype(jnp.float32)

    q, k, v = make_qkv(b, sq, sk, h, h, d)
    qi = jnp.arange(sq)[:, None]
    ki = jnp.arange(sk)[None, :]
    bias = -slope * jnp.abs(qi - ki).astype(jnp.float32)

    out = flex_attention(q, k, v, score_mod=score_mod, block_q=128, block_k=128)
    out_ref = dense_ref(q, k, v, score_bias=bias)
    out_pt = dense_ref(q, k, v, score_bias=bias, upcast=False, reorder_ops=True)
    check_close(out, out_ref, out_pt)

    g = jnp.asarray(np.random.default_rng(1).standard_normal(out.shape),
                    out.dtype)

    def loss_flex(q, k, v):
        o = flex_attention(q, k, v, score_mod=score_mod, block_q=128,
                           block_k=128)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    def loss_ref(q, k, v, upcast=True, reorder_ops=False):
        o = dense_ref(q, k, v, score_bias=bias, upcast=upcast,
                      reorder_ops=reorder_ops)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    dflex = jax.grad(loss_flex, (0, 1, 2))(q, k, v)
    dref = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    dpt = jax.grad(functools.partial(loss_ref, upcast=False, reorder_ops=True),
                   (0, 1, 2))(q, k, v)
    for a, r, p in zip(dflex, dref, dpt):
        check_close(a, r, p)


def test_flex_softcap_score_mod():
    """Softcap expressed as a score_mod (reference
    `utils.create_softcap_scoremod`), fwd + bwd, vs the built-in softcap."""
    from flash_attn_tpu import flash_attn_func

    cap = 25.0

    def softcap_mod(s, b_, h_, q_idx, kv_idx):
        return jnp.tanh(s / cap) * cap

    b, h, s, d = 2, 2, 192, 64
    q, k, v = make_qkv(b, s, s, h, h, d)
    out = flex_attention(q, k, v, score_mod=softcap_mod, block_q=128,
                         block_k=128)
    out_ref = flash_attn_func(q, k, v, softcap=cap)
    assert jnp.max(jnp.abs(out.astype(jnp.float32) -
                           out_ref.astype(jnp.float32))) < 2e-2

    def lf(q):
        return jnp.sum(flex_attention(q, k, v, score_mod=softcap_mod,
                                      block_q=128, block_k=128
                                      ).astype(jnp.float32))

    def lr(q):
        return jnp.sum(flash_attn_func(q, k, v, softcap=cap
                                       ).astype(jnp.float32))

    dq_f = jax.grad(lf)(q)
    dq_r = jax.grad(lr)(q)
    assert jnp.max(jnp.abs(dq_f.astype(jnp.float32) -
                           dq_r.astype(jnp.float32))) < 5e-2


@pytest.mark.parametrize("gqa", [False, True])
def test_flex_block_sparsity(gqa):
    """Block-sparse iteration must match dense flex and actually skip."""
    b, h, s, d = 2, 4, 512, 64
    hk = 2 if gqa else h
    q, k, v = make_qkv(b, s, s, h, hk, d)
    bm = create_block_mask(causal_mask, b, h, s, s, block_q=128, block_k=128)
    assert bm.sparsity < 0.7  # causal skips ~half
    out = flex_attention(q, k, v, mask_mod=causal_mask, block_mask=bm)
    out_ref = dense_ref(q, k, v, mask_mod=causal_mask)
    out_pt = dense_ref(q, k, v, mask_mod=causal_mask, upcast=False,
                       reorder_ops=True)
    check_close(out, out_ref, out_pt)

    # grads through the sparse path
    g = jnp.asarray(np.random.default_rng(2).standard_normal(out.shape),
                    out.dtype)

    def lf(q, k, v):
        o = flex_attention(q, k, v, mask_mod=causal_mask, block_mask=bm)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    def lr(q, k, v, upcast=True, reorder_ops=False):
        o = dense_ref(q, k, v, mask_mod=causal_mask, upcast=upcast,
                      reorder_ops=reorder_ops)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    df = jax.grad(lf, (0, 1, 2))(q, k, v)
    dr = jax.grad(lr, (0, 1, 2))(q, k, v)
    dp = jax.grad(functools.partial(lr, upcast=False, reorder_ops=True),
                  (0, 1, 2))(q, k, v)
    for a, r, p in zip(df, dr, dp):
        check_close(a, r, p)


def test_create_block_mask_structure():
    bm = create_block_mask(causal_mask, 1, 1, 512, 512, block_q=128,
                           block_k=128)
    kv_num = np.asarray(bm.kv_num)[0, 0]
    full_num = np.asarray(bm.full_kv_num)[0, 0]
    # causal: q block i attends fully to blocks < i, partially to block i
    assert list(kv_num) == [1, 1, 1, 1]
    assert list(full_num) == [0, 1, 2, 3]
    # bwd direction: kv block j is partial for q block j, full for > j
    assert list(np.asarray(bm.q_num)[0, 0]) == [1, 1, 1, 1]
    assert list(np.asarray(bm.full_q_num)[0, 0]) == [3, 2, 1, 0]


def test_blocksparse_module():
    """FA1-style blocksparse API (`flash_blocksparse_attention.py:197`)."""
    from flash_attn_tpu.blocksparse import (
        FlashBlocksparseAttention,
        flash_blocksparse_attn_func,
    )

    b, s, h, d = 2, 512, 4, 64
    rng = np.random.default_rng(4)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3, h, d)), jnp.bfloat16)
    nb = s // 128
    # strided + local block layout
    bmask = np.zeros((nb, nb), bool)
    for i in range(nb):
        bmask[i, max(0, i - 1):i + 1] = True   # local
        bmask[i, 0] = True                     # global first block
    bmask_j = jnp.asarray(bmask)

    for causal in (False, True):
        out = flash_blocksparse_attn_func(
            qkv, bmask_j, causal=causal, block_q=128, block_k=128
        )
        # dense reference with the block mask expanded elementwise
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        elem = np.kron(bmask, np.ones((128, 128), bool))
        if causal:
            elem &= np.tril(np.ones((s, s), bool))
        bias = jnp.where(jnp.asarray(elem), 0.0, -jnp.inf)
        out_ref, _ = attention_ref(q, k, v, attn_bias=bias)
        out_pt, _ = attention_ref(q, k, v, attn_bias=bias, upcast=False,
                                  reorder_ops=True)
        check_close(out, out_ref, out_pt)

    mod = FlashBlocksparseAttention(blockmask=bmask_j, block_q=128,
                                    block_k=128)
    out2 = mod(qkv, causal=True)
    out1 = flash_blocksparse_attn_func(qkv, bmask_j, causal=True,
                                       block_q=128, block_k=128)
    assert jnp.array_equal(out1, out2)


def test_flex_attn_bias_tensor():
    """Full additive bias tensor (legacy Triton-FA bias role,
    `flash_attn/flash_attn_triton.py`), fwd + grads."""
    b, h, sq, sk, d = 2, 2, 192, 256, 64
    q, k, v = make_qkv(b, sq, sk, h, h, d, seed=21)
    rng = np.random.default_rng(22)
    bias = jnp.asarray(rng.standard_normal((b, h, sq, sk)) * 0.5, jnp.float32)

    out = flex_attention(q, k, v, attn_bias=bias, block_q=128, block_k=128)
    out_ref, _ = attention_ref(q, k, v, attn_bias=bias)
    out_pt, _ = attention_ref(q, k, v, attn_bias=bias, upcast=False,
                              reorder_ops=True)
    check_close(out, out_ref, out_pt)

    # broadcast head dim
    bias1 = bias[:, :1]
    out = flex_attention(q, k, v, attn_bias=bias1, block_q=128, block_k=128)
    out_ref, _ = attention_ref(q, k, v, attn_bias=bias1)
    out_pt, _ = attention_ref(q, k, v, attn_bias=bias1, upcast=False,
                              reorder_ops=True)
    check_close(out, out_ref, out_pt)

    # grads (bias combined with mask_mod + sparsity)
    def cm(b_, h_, qi, ki):
        return qi >= ki - (sk - sq)

    bm = create_block_mask(cm, b, h, sq, sk, block_q=128, block_k=128)
    g = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)

    def lf(q, k, v):
        o = flex_attention(q, k, v, attn_bias=bias, mask_mod=cm,
                           block_mask=bm)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    def lr(q, k, v, up=True, ro=False):
        qi = jnp.arange(sq)[:, None]
        ki = jnp.arange(sk)[None, :]
        full_bias = jnp.where(qi >= ki - (sk - sq), bias, -jnp.inf)
        o = attention_ref(q, k, v, attn_bias=full_bias, upcast=up,
                          reorder_ops=ro)[0]
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    df = jax.grad(lf, (0, 1, 2))(q, k, v)
    dr = jax.grad(lr, (0, 1, 2))(q, k, v)
    dp = jax.grad(functools.partial(lr, up=False, ro=True), (0, 1, 2))(q, k, v)
    for a, r, pt in zip(df, dr, dp):
        check_close(a, r, pt)


def test_flex_dbias():
    """attn_bias gradients (round-1 gap; reference Triton FA returns
    dbias, `flash_attn/flash_attn_triton.py`), including broadcast-dim
    reduction and block sparsity."""
    rng = np.random.default_rng(11)
    b, s, h, d = 2, 128, 4, 64
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    for bb, bh in [(2, 4), (1, 1)]:
        bias = jnp.asarray(rng.standard_normal((bb, bh, s, s)) * 0.5,
                           jnp.float32)

        def loss(q, k, v, bias):
            return jnp.sum(flex_attention(
                q, k, v, attn_bias=bias, block_q=64, block_k=64) * do)

        g = jax.grad(loss, 3)(q, k, v, bias)

        def loss_ref(q, k, v, bias):
            o, _ = attention_ref(
                q, k, v, attn_bias=jnp.broadcast_to(bias, (b, h, s, s)))
            return jnp.sum(o * do)

        gr = jax.grad(loss_ref, 3)(q, k, v, bias)
        assert g.shape == bias.shape
        assert float(jnp.abs(g - gr).max()) < 2e-3, (bb, bh)


def test_flex_head_blocked_paths():
    """Head-invariant masks run the head-blocked kernel (shared K/V tile,
    pipelined per-head softmax chains) and must match both the dense
    reference and the per-head kernel bit-for-bit in structure-equivalent
    configs (round-3 perf lever; reference treats mask mods as a
    first-class benchmarked path, `benchmarks/cute/benchmark_mask_mod.py`)."""
    b, s, h, d = 2, 256, 8, 64
    q, k, v = make_qkv(b, s, s, h, h, d, jnp.float32, seed=21)

    def sw(b_, h_, qi, ki):
        return (qi >= ki) & (qi - ki <= 100)

    # head-invariant tables carry a broadcast head dim of 1
    bm = create_block_mask(sw, b, h, s, s, block_q=128, block_k=128,
                           head_invariant=True)
    assert bm.kv_num.shape[1] == 1
    out = flex_attention(q, k, v, mask_mod=sw, block_mask=bm)
    out_ref = dense_ref(q, k, v, mask_mod=sw)
    check_close(out, out_ref, out_ref)

    # same mask via per-head tables must agree exactly in fp32
    bm_h = create_block_mask(sw, b, h, s, s, block_q=128, block_k=128)
    out_h = flex_attention(q, k, v, mask_mod=sw, block_mask=bm_h,
                           block_h=1)
    assert float(jnp.abs(out - out_h).max()) < 1e-5

    # gradients ride the (broadcast-table) backward
    g = jnp.asarray(np.random.default_rng(5).standard_normal(out.shape),
                    jnp.float32)

    def lf(q, k, v, hi):
        o = flex_attention(q, k, v, mask_mod=sw, block_q=128, block_k=128,
                           head_invariant=hi)
        return jnp.sum(o * g)

    da = jax.grad(lf, (0, 1, 2))(q, k, v, True)
    db = jax.grad(lf, (0, 1, 2))(q, k, v, False)
    for x, y in zip(da, db):
        assert float(jnp.abs(x - y).max()) < 1e-5


def test_flex_head_blocked_score_mod_gqa():
    """Per-head score mods stay exact on the head-blocked path (each head
    gets its own h index), including GQA where the head block shares one
    kv head."""
    b, s, h, hk, d = 1, 256, 8, 2, 64
    q, k, v = make_qkv(b, s, s, h, hk, d, jnp.float32, seed=22)
    slopes = 0.01 * (np.arange(h) + 1)

    def smod(sc, b_, h_, qi, ki):
        sl = 0.01 * (h_.astype(jnp.float32) + 1.0) \
            if hasattr(h_, "astype") else 0.01 * (h_ + 1)
        return sc - sl * jnp.abs(qi - ki)

    out = flex_attention(q, k, v, mask_mod=causal_mask, score_mod=smod,
                         block_q=128, block_k=128, head_invariant=True)
    qi = jnp.arange(s)[:, None]
    ki = jnp.arange(s)[None, :]
    bias = -jnp.asarray(slopes)[None, :, None, None] * jnp.abs(qi - ki)
    out_ref = dense_ref(jnp.repeat(q, 1, 2),
                        jnp.repeat(k, h // hk, 2),
                        jnp.repeat(v, h // hk, 2),
                        mask_mod=causal_mask, score_bias=bias)
    check_close(out, out_ref, out_ref)
