"""Fused-op tests: dropout-add-LayerNorm/RMSNorm and variants.

Model: reference `tests/ops/test_dropout_layer_norm.py` (1,189 LoC sweeps)
— here against plain-JAX references, including prenorm residual return,
dropout determinism, parallel-residual dual norm, and the subset variant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.ops.layer_norm import (
    dropout_add_layer_norm,
    dropout_add_layer_norm_parallel_residual,
    dropout_add_layer_norm_subset,
    dropout_add_rms_norm,
    layer_norm,
    rms_norm,
)


def ref_ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) / jnp.sqrt(var + eps)) * w + (b if b is not None else 0)


def ref_rms(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    ms = (xf ** 2).mean(-1, keepdims=True)
    return xf / jnp.sqrt(ms + eps) * w


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_layer_norm_matches_reference(dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 256)), dtype)
    w = jnp.asarray(rng.standard_normal(256), jnp.float32)
    b = jnp.asarray(rng.standard_normal(256), jnp.float32)
    out = layer_norm(x, w, b)
    ref = ref_ln(x, w, b)
    tol = 5e-2 if dtype == jnp.bfloat16 else 1e-4
    assert float(jnp.abs(out.astype(jnp.float32) - ref).max()) < tol


def test_rms_norm_matches_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((32, 128)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal(128), jnp.float32)
    out = rms_norm(x, w)
    ref = ref_rms(x, w)
    assert float(jnp.abs(out.astype(jnp.float32) - ref).max()) < 2e-2


@pytest.mark.parametrize("is_rms", [False, True])
def test_dropout_add_norm_prenorm_residual(is_rms):
    """prenorm returns (normed, residual); residual = x0 + residual_in."""
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.standard_normal((48, 192)), jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((48, 192)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal(192), jnp.float32)
    b = None if is_rms else jnp.zeros(192)
    fn = dropout_add_rms_norm if is_rms else dropout_add_layer_norm
    kw = {} if is_rms else {"bias": b}
    if is_rms:
        out, new_res = fn(x0, res, w, None, 0.0, 1e-5, prenorm=True,
                          residual_in_fp32=True)
    else:
        out, new_res = fn(x0, res, w, b, 0.0, 1e-5, prenorm=True,
                          residual_in_fp32=True)
    exp_res = x0.astype(jnp.float32) + res.astype(jnp.float32)
    assert float(jnp.abs(new_res.astype(jnp.float32) - exp_res).max()) < 2e-2
    ref = ref_rms(exp_res, w) if is_rms else ref_ln(exp_res, w, b)
    assert float(jnp.abs(out.astype(jnp.float32) - ref).max()) < 3e-2


def test_dropout_determinism_and_rate():
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
    w = jnp.ones(128)
    b = jnp.zeros(128)
    key = jax.random.PRNGKey(9)
    o1, r1, mask = dropout_add_layer_norm(
        x0, None, w, b, 0.3, 1e-5, prenorm=True, rng=key,
        return_dropout_mask=True,
    )
    o2, r2, _ = dropout_add_layer_norm(
        x0, None, w, b, 0.3, 1e-5, prenorm=True, rng=key,
        return_dropout_mask=True,
    )
    assert jnp.array_equal(o1, o2)
    rate = 1.0 - float(jnp.mean(mask.astype(jnp.float32)))
    assert abs(rate - 0.3) < 0.05
    # dropped+scaled: residual equals mask*x0/(1-p)
    exp = jnp.where(mask, x0 / 0.7, 0.0)
    assert float(jnp.abs(r1 - exp).max()) < 1e-5


def test_parallel_residual_dual_norm():
    """GPT-J dual-norm (`ln_parallel_residual_*` kernels role)."""
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.standard_normal((32, 96)), jnp.float32)
    x1 = jnp.asarray(rng.standard_normal((32, 96)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((32, 96)), jnp.float32)
    w0 = jnp.asarray(rng.standard_normal(96), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal(96), jnp.float32)
    b0 = jnp.zeros(96)
    b1 = jnp.zeros(96)
    out0, out1, new_res = dropout_add_layer_norm_parallel_residual(
        x0, x1, res, w0, b0, w1, b1, 0.0, 1e-5, prenorm=True,
    )
    exp_res = x0 + x1 + res
    assert float(jnp.abs(new_res - exp_res).max()) < 1e-4
    assert float(jnp.abs(out0 - ref_ln(exp_res, w0, b0)).max()) < 1e-4
    assert float(jnp.abs(out1 - ref_ln(exp_res, w1, b1)).max()) < 1e-4


def test_subset_variant():
    """BERT unpadded-token path (`DropoutAddLayerNormSubsetFn:416`)."""
    rng = np.random.default_rng(5)
    n, n0, d = 16, 10, 64
    x0 = jnp.asarray(rng.standard_normal((n0, d)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal(d), jnp.float32)
    b = jnp.zeros(d)
    subset = jnp.asarray([1, 2, 0, 3, 0, 4, 5, 6, 0, 7, 8, 0, 9, 10, 0, 0],
                         jnp.int32)
    out = dropout_add_layer_norm_subset(
        x0, res, w, b, 0.0, 1e-5, x0_subset=subset)
    full = np.zeros((n, d), np.float32)
    idx = np.asarray(subset)
    full[np.where(idx > 0)[0]] = np.asarray(x0)[idx[idx > 0] - 1]
    ref = ref_ln(jnp.asarray(full) + res, w, b)
    assert float(jnp.abs(out - ref).max()) < 1e-4


def test_subset_out_subset_ordering():
    """out_subset rows land at their destination index even when the
    mapping is non-monotone (stream order != output order)."""
    rng = np.random.default_rng(7)
    n, d = 8, 32
    res = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal(d), jnp.float32)
    b = jnp.zeros(d)
    # stream row 0 -> out 2, row 2 -> out 0, row 5 -> out 1 (non-monotone)
    out_subset = jnp.asarray([3, 0, 1, 0, 0, 2, 0, 0], jnp.int32)
    out = dropout_add_layer_norm_subset(
        x0, res, w, b, 0.0, 1e-5, out_subset=out_subset, out_numrows=3)
    full_ref = ref_ln(x0 + res, w, b)
    assert out.shape == (3, d)
    assert float(jnp.abs(out[2] - full_ref[0]).max()) < 1e-4
    assert float(jnp.abs(out[0] - full_ref[2]).max()) < 1e-4
    assert float(jnp.abs(out[1] - full_ref[5]).max()) < 1e-4


def test_grads_flow():
    rng = np.random.default_rng(6)
    x0 = jnp.asarray(rng.standard_normal((16, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal(64), jnp.float32)
    b = jnp.zeros(64)

    def loss(x0, w, b):
        return jnp.sum(dropout_add_layer_norm(x0, None, w, b, 0.0, 1e-5) ** 2)

    g = jax.grad(loss, (0, 1, 2))(x0, w, b)
    gn = jax.grad(lambda x0, w, b: jnp.sum(ref_ln(x0, w, b) ** 2),
                  (0, 1, 2))(x0, w, b)
    for a, r in zip(g, gn):
        assert float(jnp.abs(a - r).max()) < 1e-3
