"""Rotary embedding tests — model: reference `tests/layers/test_rotary.py`:
interleaved/non-interleaved, seqlen offsets, partial rotary dim, xPos scale,
NTK interpolation, and the fused QKV form."""

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.layers.rotary import (
    RotaryEmbedding,
    apply_rotary_emb,
    apply_rotary_emb_qkv_,
)


def ref_rotary(x, cos, sin, interleaved=False, offset=0):
    """Reference per-position rotation (fp32)."""
    b, s, h, d = x.shape
    ro_dim = cos.shape[-1] * 2
    xf = np.asarray(x, np.float32)
    c = np.asarray(cos, np.float32)[offset:offset + s]
    si = np.asarray(sin, np.float32)[offset:offset + s]
    out = xf.copy()
    if interleaved:
        x1, x2 = xf[..., 0:ro_dim:2], xf[..., 1:ro_dim:2]
        o1 = x1 * c[:, None] - x2 * si[:, None]
        o2 = x1 * si[:, None] + x2 * c[:, None]
        out[..., 0:ro_dim:2] = o1
        out[..., 1:ro_dim:2] = o2
    else:
        half = ro_dim // 2
        x1, x2 = xf[..., :half], xf[..., half:ro_dim]
        out[..., :half] = x1 * c[:, None] - x2 * si[:, None]
        out[..., half:ro_dim] = x1 * si[:, None] + x2 * c[:, None]
    return out


def make_tables(maxlen, rot_half, base=10000.0, interp=1.0):
    inv = 1.0 / (base ** (np.arange(0, 2 * rot_half, 2) / (2 * rot_half)))
    t = np.arange(maxlen, dtype=np.float32) / interp
    f = np.outer(t, inv)
    return jnp.asarray(np.cos(f)), jnp.asarray(np.sin(f))


@pytest.mark.parametrize("interleaved", [False, True])
@pytest.mark.parametrize("rotary_fraction", [1.0, 0.5])
def test_apply_rotary_matches_reference(interleaved, rotary_fraction):
    b, s, h, d = 2, 48, 4, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    rot_half = int(d * rotary_fraction) // 2
    cos, sin = make_tables(128, rot_half)
    out = apply_rotary_emb(x, cos, sin, interleaved=interleaved)
    ref = ref_rotary(x, cos, sin, interleaved=interleaved)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_seqlen_offset():
    b, s, h, d = 1, 16, 2, 32
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    cos, sin = make_tables(64, d // 2)
    out = apply_rotary_emb(x, cos, sin, seqlen_offsets=5)
    ref = ref_rotary(x, cos, sin, offset=5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_qkv_fused_form():
    b, s, h, d = 2, 24, 4, 32
    rng = np.random.default_rng(2)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3, h, d)), jnp.float32)
    cos, sin = make_tables(64, d // 2)
    out = apply_rotary_emb_qkv_(qkv, cos, sin)
    for i in range(2):  # q and k rotated, v untouched
        ref = ref_rotary(qkv[:, :, i], cos, sin)
        np.testing.assert_allclose(np.asarray(out[:, :, i]), ref,
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out[:, :, 2]),
                                  np.asarray(qkv[:, :, 2]))


def test_ntk_interpolation_changes_frequencies():
    """interpolation_factor divides positions (`rotary.py:331` semantics)."""
    emb1 = RotaryEmbedding(32)
    emb2 = RotaryEmbedding(32, interpolation_factor=2.0)
    emb1._update(64)
    emb2._update(64)
    # position 2k under interpolation 2 == position k without
    np.testing.assert_allclose(np.asarray(emb2._cos[2 * 7]),
                               np.asarray(emb1._cos[7]), rtol=1e-6)


def test_xpos_scaling():
    emb = RotaryEmbedding(32, scale_base=512)
    emb._update(32)
    assert emb._cos_k is not None  # separate k-side tables exist
    # q-side and k-side scales are reciprocal: cos_q * cos_k == cos^2
    base = RotaryEmbedding(32)
    base._update(32)
    np.testing.assert_allclose(
        np.asarray(emb._cos) * np.asarray(emb._cos_k),
        np.asarray(base._cos) ** 2, rtol=1e-4, atol=1e-5,
    )


@pytest.mark.parametrize("interleaved", [False, True])
def test_varlen_rotary(interleaved):
    """cu_seqlens path (`rotary.py:93`): positions restart per sequence in
    a packed (total, h, d) stream."""
    h, d = 3, 64
    lens = [17, 1, 40, 6]
    cu = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    total = int(cu[-1])
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((total, h, d)), jnp.float32)
    cos, sin = make_tables(64, d // 2)

    out = apply_rotary_emb(x, cos, sin, interleaved=interleaved,
                           cu_seqlens=jnp.asarray(cu))

    # reference: rotate each sequence independently from position 0
    for i, L in enumerate(lens):
        seg = x[cu[i]:cu[i + 1]][None]  # (1, L, h, d)
        ref = ref_rotary(seg, cos, sin, interleaved=interleaved)[0]
        np.testing.assert_allclose(
            np.asarray(out[cu[i]:cu[i + 1]]), ref, rtol=1e-5, atol=1e-5,
            err_msg=f"seq {i}")


def test_varlen_rotary_offsets_and_grad():
    h, d = 2, 32
    lens = [9, 23]
    cu = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    total = int(cu[-1])
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((total, h, d)), jnp.float32)
    cos, sin = make_tables(96, d // 2)
    offs = jnp.asarray([5, 11], jnp.int32)

    out = apply_rotary_emb(x, cos, sin, cu_seqlens=jnp.asarray(cu),
                           seqlen_offsets=offs)
    for i, L in enumerate(lens):
        seg = x[cu[i]:cu[i + 1]][None]
        ref = ref_rotary(seg, cos, sin, offset=int(offs[i]))[0]
        np.testing.assert_allclose(np.asarray(out[cu[i]:cu[i + 1]]), ref,
                                   rtol=1e-5, atol=1e-5)

    # differentiable (rotation is orthogonal: grad norm preserved on the
    # rotated slice)
    import jax

    g = jax.grad(lambda xx: (apply_rotary_emb(
        xx, cos, sin, cu_seqlens=jnp.asarray(cu)) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x),
                               rtol=1e-4, atol=1e-4)
