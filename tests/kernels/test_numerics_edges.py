"""Numerical edge cases (model: reference
`tests/test_flash_attn.py:2247` test_flash_attn_bwd_overflow and `:2303`
test_flash_attn_bwd_transpose): large-magnitude inputs must not produce
NaN/Inf in outputs or gradients, and odd/transposed-ish shapes must keep
gradients finite and close to the fp32 oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_func
from flash_attn_tpu.utils.testing import attention_ref


def _grads(q, k, v, do, **kw):
    def loss(q, k, v):
        return jnp.sum(
            flash_attn_func(q, k, v, **kw).astype(jnp.float32)
            * do.astype(jnp.float32)
        )

    return jax.grad(loss, (0, 1, 2))(q, k, v)


def _oracle_grads(q, k, v, do, **kw):
    def loss(q, k, v):
        out, _ = attention_ref(q, k, v, **kw)
        return jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32))

    return jax.grad(loss, (0, 1, 2))(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )


def _lowprec_grads(q, k, v, do, **kw):
    """Gradients through the low-precision reference (upcast=False,
    reorder_ops=True) — the 'pt' baseline of the reference's 5x rule."""

    def loss(q, k, v):
        out, _ = attention_ref(q, k, v, upcast=False, reorder_ops=True, **kw)
        return jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32))

    return jax.grad(loss, (0, 1, 2))(q, k, v)


@pytest.mark.parametrize("seqlen", [97, 128, 200])
@pytest.mark.parametrize("causal", [False, True])
def test_bwd_overflow(seqlen, causal):
    """Reference `test_flash_attn_bwd_overflow:2247`: q scaled x5, k/v x3
    (exp overflow absorbed by the online max; non-multiple-of-128 seqlens
    exercise the tail-masking that once produced NaN dQ there).  Gate is
    the reference's: |g - g_ref| <= 5 |g_pt - g_ref| + 1e-3."""
    b, h, d = 2, 3, 64
    rng = np.random.default_rng(seqlen)
    q = jnp.asarray(rng.standard_normal((b, seqlen, h, d)) * 5, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, seqlen, h, d)) * 3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, seqlen, h, d)) * 3, jnp.bfloat16)
    do = jnp.asarray(rng.standard_normal((b, seqlen, h, d)), jnp.bfloat16)

    out = flash_attn_func(q, k, v, causal=causal)
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))
    flash = _grads(q, k, v, do, causal=causal)
    oracle = _oracle_grads(q, k, v, do, causal=causal)
    lowprec = _lowprec_grads(q, k, v, do, causal=causal)
    for g, ref, pt, name in [
        (flash[0], oracle[0], lowprec[0], "dq"),
        (flash[1], oracle[1], lowprec[1], "dk"),
        (flash[2], oracle[2], lowprec[2], "dv"),
    ]:
        g32 = g.astype(jnp.float32)
        assert bool(jnp.all(jnp.isfinite(g32))), name
        err = float(jnp.abs(g32 - ref).max())
        err_pt = float(jnp.abs(pt.astype(jnp.float32) - ref).max())
        assert err <= 5 * err_pt + 1e-3, (name, err, err_pt)


def test_bwd_all_masked_rows():
    """Rows whose every key is masked (window pushes past the sequence)
    must yield zero output and zero gradients, not NaN."""
    b, s, h, d = 1, 128, 2, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    do = jnp.ones((b, s, h, d), jnp.bfloat16)
    # window entirely in the future for early rows: left=0 width, right
    # offset pushes the band off the end for late rows instead — use a
    # tiny left window with causal so row 0 still sees itself; instead
    # craft all-masked rows via seqused-style cross shape: sq > sk skews
    # bottom-right alignment so early rows have NO valid keys.
    qq = jnp.asarray(rng.standard_normal((b, 160, h, d)), jnp.bfloat16)
    out = flash_attn_func(qq, k, v, causal=True)
    # bottom-right causal: rows < sq - sk attend to nothing -> output 0
    zero_rows = 160 - 128
    assert bool(jnp.all(out[:, :zero_rows] == 0))
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))

    def loss(qq, k, v):
        return jnp.sum(
            flash_attn_func(qq, k, v, causal=True).astype(jnp.float32)
            * jnp.ones((b, 160, h, d), jnp.float32)
        )

    dq, dk, dv = jax.grad(loss, (0, 1, 2))(qq, k, v)
    for g in (dq, dk, dv):
        assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))
    assert bool(jnp.all(dq[:, :zero_rows] == 0))


@pytest.mark.parametrize("sq,sk,d", [(17, 1024, 96), (1024, 17, 96),
                                     (37, 229, 160)])
def test_bwd_odd_shapes(sq, sk, d):
    """Non-multiple-of-block shapes in both directions (reference
    `test_flash_attn_bwd_transpose` exercises tall/wide transposes)."""
    b, h = 1, 3
    rng = np.random.default_rng(sq * 7 + sk)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.bfloat16)
    do = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    dq, dk, dv = _grads(q, k, v, do, causal=True)
    gq, gk, gv = _oracle_grads(q, k, v, do, causal=True)
    for g, ref, name in [(dq, gq, "dq"), (dk, gk, "dk"), (dv, gv, "dv")]:
        err = float(jnp.abs(g.astype(jnp.float32) - ref).max())
        assert err < 6e-2, (name, err)
        assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32)))), name


def test_fwd_identical_rows_lse():
    """All-equal scores: LSE must equal log(n) + s exactly enough that
    downstream exp(lse) stays finite at long length."""
    b, s, h, d = 1, 2048, 1, 64
    q = jnp.ones((b, s, h, d), jnp.bfloat16)
    k = jnp.ones((b, s, h, d), jnp.bfloat16)
    v = jnp.ones((b, s, h, d), jnp.bfloat16)
    out, lse, _ = flash_attn_func(q, k, v, return_attn_probs=True)
    expected = d * (d ** -0.5) + np.log(s)
    assert np.allclose(np.asarray(lse), expected, atol=0.5)
    assert np.allclose(np.asarray(out, np.float32), 1.0, atol=1e-2)
