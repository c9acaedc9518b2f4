"""Ring attention + sharded attention tests on the 8-virtual-device CPU mesh
(replacing the reference's real-multi-GPU torchrun harness,
`tests/models/test_gpt_parallel.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flash_attn_tpu import flash_attn_func
from flash_attn_tpu.parallel.ring_attention import ring_flash_attn_func
from flash_attn_tpu.parallel.sharded_attention import sharded_flash_attn_func
from flash_attn_tpu.utils.testing import attention_ref, check_close


def make_mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def make_inputs(b=2, s=256, h=4, hk=4, d=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, hk, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, hk, d)), jnp.bfloat16)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_dense(causal):
    mesh = make_mesh((4,), ("seq",))
    q, k, v = make_inputs()
    out = jax.jit(
        lambda q, k, v: ring_flash_attn_func(
            mesh, q, k, v, batch_axis=None, head_axis=None, causal=causal
        )
    )(q, k, v)
    ref, _ = attention_ref(q, k, v, causal=causal)
    pt, _ = attention_ref(q, k, v, causal=causal, upcast=False,
                          reorder_ops=True)
    check_close(out, ref, pt)


def test_ring_grads_match_dense():
    mesh = make_mesh((4,), ("seq",))
    q, k, v = make_inputs(s=128)
    g = jnp.asarray(
        np.random.default_rng(1).standard_normal(q.shape), jnp.bfloat16
    )

    def loss_ring(q, k, v):
        o = ring_flash_attn_func(mesh, q, k, v, batch_axis=None,
                                 head_axis=None, causal=True)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    def loss_dense(q, k, v):
        o = flash_attn_func(q, k, v, causal=True)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    dr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    dd = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b_ in zip("dq dk dv".split(), dr, dd):
        err = float(jnp.abs(a.astype(jnp.float32) - b_.astype(jnp.float32)).max())
        # one-two bf16 ulps at grad magnitude ~4 (the scale-fold in Q
        # changes rounding vs the dense path)
        assert err < 5e-2, (name, err)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_with_tp_and_gqa(causal):
    mesh = make_mesh((2, 2, 2), ("data", "model", "seq"))
    q, k, v = make_inputs(b=2, s=128, h=8, hk=2, d=64)
    out = jax.jit(
        lambda q, k, v: ring_flash_attn_func(mesh, q, k, v, causal=causal)
    )(q, k, v)
    ref, _ = attention_ref(q, k, v, causal=causal)
    pt, _ = attention_ref(q, k, v, causal=causal, upcast=False,
                          reorder_ops=True)
    check_close(out, ref, pt)


@pytest.mark.parametrize("causal", [False, True])
def test_sharded_attention_head_tp(causal):
    mesh = make_mesh((2, 4), ("data", "model"))
    q, k, v = make_inputs(b=2, s=192, h=8, hk=8, d=64)
    out = jax.jit(
        lambda q, k, v: sharded_flash_attn_func(
            mesh, q, k, v, causal=causal
        )
    )(q, k, v)
    ref, _ = attention_ref(q, k, v, causal=causal)
    pt, _ = attention_ref(q, k, v, causal=causal, upcast=False,
                          reorder_ops=True)
    check_close(out, ref, pt)


@pytest.mark.parametrize("causal", [False, True])
def test_sharded_attention_seq_parallel(causal):
    mesh = make_mesh((2, 2, 2), ("data", "model", "seq"))
    q, k, v = make_inputs(b=2, s=256, h=4, hk=4, d=64)
    out = jax.jit(
        lambda q, k, v: sharded_flash_attn_func(
            mesh, q, k, v, seq_axis="seq", causal=causal
        )
    )(q, k, v)
    ref, _ = attention_ref(q, k, v, causal=causal)
    pt, _ = attention_ref(q, k, v, causal=causal, upcast=False,
                          reorder_ops=True)
    check_close(out, ref, pt)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_cross_lengths(causal):
    """sq != sk (bottom-right causal) — the round-1 assert is gone."""
    mesh = make_mesh((4,), ("seq",))
    rng = np.random.default_rng(3)
    b, sq, sk, h, d = 1, 128, 256, 2, 64
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.bfloat16)
    out = jax.jit(
        lambda q, k, v: ring_flash_attn_func(
            mesh, q, k, v, batch_axis=None, head_axis=None, causal=causal)
    )(q, k, v)
    ref, _ = attention_ref(q, k, v, causal=causal)
    pt, _ = attention_ref(q, k, v, causal=causal, upcast=False,
                          reorder_ops=True)
    check_close(out, ref, pt)


def test_ring_gqa():
    mesh = make_mesh((4,), ("seq",))
    q, k, v = make_inputs(h=4, hk=2, seed=5)
    out = jax.jit(
        lambda q, k, v: ring_flash_attn_func(
            mesh, q, k, v, batch_axis=None, head_axis=None, causal=True)
    )(q, k, v)
    ref, _ = attention_ref(q, k, v, causal=True)
    pt, _ = attention_ref(q, k, v, causal=True, upcast=False,
                          reorder_ops=True)
    check_close(out, ref, pt)


def test_ring_zigzag_causal():
    """Zigzag chunk assignment balances the causal ring; results must be
    identical to dense attention after un-permuting."""
    from flash_attn_tpu.parallel.ring_attention import (
        zigzag_permute,
        zigzag_unpermute,
    )

    mesh = make_mesh((4,), ("seq",))
    n = 4
    q, k, v = make_inputs(b=1, s=256, h=2, hk=2, seed=6)
    qz = zigzag_permute(q, n)
    kz = zigzag_permute(k, n)
    vz = zigzag_permute(v, n)
    out_z = jax.jit(
        lambda q, k, v: ring_flash_attn_func(
            mesh, q, k, v, batch_axis=None, head_axis=None, causal=True,
            zigzag=True)
    )(qz, kz, vz)
    out = zigzag_unpermute(out_z, n)
    ref, _ = attention_ref(q, k, v, causal=True)
    pt, _ = attention_ref(q, k, v, causal=True, upcast=False,
                          reorder_ops=True)
    # 4 merge orders per hop differ from the dense accumulation order;
    # bf16 needs the usual ~1-ulp absolute floor
    check_close(out, ref, pt, atol_floor=8e-3)


def test_zigzag_permute_roundtrip():
    from flash_attn_tpu.parallel.ring_attention import (
        zigzag_permute,
        zigzag_unpermute,
    )

    x = jnp.arange(2 * 64 * 3).reshape(2, 64, 3)
    y = zigzag_unpermute(zigzag_permute(x, 4), 4)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
