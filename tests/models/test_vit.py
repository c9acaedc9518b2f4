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


def test_vit_hf_parity():
    """Logits parity against HF transformers ViT (random init), through
    the remap (`remap_state_dict_hf_vit`) — the reference loads timm
    checkpoints the same way (`vit.py:327`)."""
    import pytest

    torch = pytest.importorskip("torch")
    from transformers import ViTConfig, ViTModel

    from flash_attn_tpu.models.vit import (
        VisionTransformer,
        remap_state_dict_hf_vit,
    )

    cfg = ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=256, image_size=32, patch_size=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = ViTModel(cfg, add_pooling_layer=False).eval()
    params = {"params": remap_state_dict_hf_vit(hf.state_dict(), 2)}
    model = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        mlp_ratio=4.0, num_classes=0, dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(
            np.transpose(x, (0, 3, 1, 2)))).last_hidden_state.numpy()
    out = model.apply(params, jnp.asarray(x), pre_logits=False,
                      deterministic=True)
    # num_classes=0 + pre_logits path returns the cls feature after the
    # final norm; compare against HF's cls row.  Tolerance: on this CPU
    # both torch (oneDNN linear) and XLA (oneDNN custom calls) run f32
    # matmuls in bf16 fastmath — torch's own nn.Linear deviates ~2e-2
    # from an exact fp32 matmul here — so bit-level parity is
    # unattainable; a remap bug (wrong key/transpose/head split) shows
    # as >= 0.5.
    err = np.abs(np.asarray(out) - ref[:, 0]).max()
    assert err < 3e-2, err


def test_vit_drop_path_and_no_embed_class():
    """drop_path (stochastic depth) and no_embed_class run and keep
    expectations sane; deterministic mode bypasses both."""
    import jax

    from flash_attn_tpu.models.vit import VisionTransformer

    model = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        num_classes=10, drop_path_rate=0.5, no_embed_class=True,
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    o1 = model.apply(params, x, deterministic=True)
    o2 = model.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = model.apply(params, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    assert o3.shape == (2, 10) and bool(jnp.all(jnp.isfinite(o3)))
