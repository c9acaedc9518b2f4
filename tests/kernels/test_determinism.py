"""Bitwise determinism under repetition (model: reference
`tests/test_flash_attn.py:2199` test_flash_attn_race_condition — run the
kernel 30x and require bit-equality — and `:2413`
test_flash_attn_deterministic).

On TPU the backward is deterministic by construction (no atomics), but the
repeat test still guards against nondeterministic lowering, scratch
initialisation bugs, and pipeline races in the Pallas kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_func, flash_attn_varlen_func

REPEATS = 30


def _mk(b, sq, sk, h, d, seed=0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, sk, h, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, sk, h, d)), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_forward_bitwise_repeat(causal):
    q, k, v = _mk(1, 256, 256, 2, 64)
    f = jax.jit(lambda q, k, v: flash_attn_func(q, k, v, causal=causal))
    ref = np.asarray(f(q, k, v))
    for _ in range(REPEATS):
        np.testing.assert_array_equal(np.asarray(f(q, k, v)), ref)


@pytest.mark.parametrize("causal", [False, True])
def test_backward_bitwise_repeat(causal):
    q, k, v = _mk(1, 192, 256, 2, 64)
    do_seed = jnp.asarray(
        np.random.default_rng(9).standard_normal((1, 192, 2, 64)),
        jnp.bfloat16,
    )

    @jax.jit
    def grads(q, k, v):
        def loss(q, k, v):
            return jnp.sum(
                flash_attn_func(q, k, v, causal=causal).astype(jnp.float32)
                * do_seed.astype(jnp.float32)
            )

        return jax.grad(loss, (0, 1, 2))(q, k, v)

    ref = [np.asarray(g) for g in grads(q, k, v)]
    for _ in range(REPEATS):
        for g, r in zip(grads(q, k, v), ref):
            np.testing.assert_array_equal(np.asarray(g), r)


def test_dropout_bitwise_repeat():
    """The counter-based dropout mask must be a pure function of
    (seed, position) — identical across calls and jit boundaries."""
    q, k, v = _mk(1, 128, 128, 2, 64)
    f = jax.jit(
        lambda q, k, v: flash_attn_func(
            q, k, v, dropout_p=0.3, dropout_seed=1234, causal=True
        )
    )
    ref = np.asarray(f(q, k, v))
    for _ in range(10):
        np.testing.assert_array_equal(np.asarray(f(q, k, v)), ref)
    # a different seed must give a different mask
    alt = flash_attn_func(q, k, v, dropout_p=0.3, dropout_seed=77, causal=True)
    assert not np.array_equal(np.asarray(alt), ref)


def test_varlen_bitwise_repeat():
    rng = np.random.default_rng(3)
    lens = [37, 128, 5, 90]
    total = sum(lens)
    cu = jnp.asarray(np.cumsum([0] + lens), jnp.int32)
    q = jnp.asarray(rng.standard_normal((total, 2, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((total, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((total, 2, 64)), jnp.bfloat16)
    f = jax.jit(
        lambda q, k, v: flash_attn_varlen_func(
            q, k, v, cu, cu, max(lens), max(lens), causal=True
        )
    )
    ref = np.asarray(f(q, k, v))
    for _ in range(10):
        np.testing.assert_array_equal(np.asarray(f(q, k, v)), ref)
