"""ViT tests (model: reference `tests/models/test_vit.py` — parity of the
flash-attn ViT vs timm; offline here, so parity is vs a plain-JAX
transformer oracle plus structural/gradient checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.models.vit import VisionTransformer, vit_small_patch16_224


def tiny_vit(**kw):
    base = dict(img_size=32, patch_size=8, embed_dim=64, depth=2,
                num_heads=2, num_classes=10, in_chans=3)
    base.update(kw)
    return VisionTransformer(**base)


def test_vit_forward_shapes():
    model = tiny_vit()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_vit_cls_vs_avg_pool():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 32, 32, 3)),
                    jnp.float32)
    m_tok = tiny_vit(global_pool="token")
    m_avg = tiny_vit(global_pool="avg", class_token=False)
    p_tok = m_tok.init(jax.random.PRNGKey(0), x)
    p_avg = m_avg.init(jax.random.PRNGKey(0), x)
    assert m_tok.apply(p_tok, x).shape == (1, 10)
    assert m_avg.apply(p_avg, x).shape == (1, 10)
    # avg-pool model has no cls_token param
    flat = jax.tree_util.tree_leaves_with_path(p_avg)
    assert not any("cls_token" in jax.tree_util.keystr(kp) for kp, _ in flat)


def test_vit_flash_matches_reference_attention():
    """The flash-attention ViT must match the same weights run through the
    non-flash (reference math) attention path — the core parity the
    reference's ViT test establishes vs timm."""
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    m_flash = tiny_vit(use_flash_attn=True)
    m_ref = tiny_vit(use_flash_attn=False)
    params = m_flash.init(jax.random.PRNGKey(0), x)
    out_flash = m_flash.apply(params, x)
    out_ref = m_ref.apply(params, x)
    err = float(jnp.abs(out_flash - out_ref).max())
    assert err < 5e-4, err


def test_vit_grads_finite():
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    m = tiny_vit()
    params = m.init(jax.random.PRNGKey(0), x)
    gs = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
    leaves = jax.tree_util.tree_leaves(gs)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_vit_small_constructor():
    m = vit_small_patch16_224(num_classes=0)
    assert m.embed_dim == 384 and m.depth == 12 and m.num_heads == 6
