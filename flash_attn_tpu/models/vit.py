"""Vision Transformer (counterpart of `flash_attn/models/vit.py`, which
mirrors timm's ViT built from flash-attn blocks)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

import functools

from flash_attn_tpu.layers.patch_embed import PatchEmbed
from flash_attn_tpu.modules.block import Block, _Norm
from flash_attn_tpu.modules.mha import MHA
from flash_attn_tpu.modules.mlp import Mlp
from flash_attn_tpu.ops.activations import gelu_approx


class VisionTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    class_token: bool = True
    global_pool: str = "token"  # or "avg"
    use_flash_attn: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.patch_embed = PatchEmbed(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.embed_dim, in_chans=self.in_chans,
            dtype=self.dtype,
        )
        num_patches = (self.img_size // self.patch_size) ** 2
        n_tok = num_patches + (1 if self.class_token else 0)
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(stddev=0.02),
            (1, n_tok, self.embed_dim), jnp.float32,
        )
        if self.class_token:
            self.cls_token = self.param(
                "cls_token", nn.initializers.zeros,
                (1, 1, self.embed_dim), jnp.float32,
            )
        mixer_cls = functools.partial(
            MHA, embed_dim=self.embed_dim, num_heads=self.num_heads,
            causal=False, use_flash_attn=self.use_flash_attn,
            dtype=self.dtype,
        )
        mlp_cls = functools.partial(
            Mlp, hidden_features=int(self.embed_dim * self.mlp_ratio),
            activation=gelu_approx, dtype=self.dtype,
        )
        self.blocks = [
            Block(mixer_cls=mixer_cls, mlp_cls=mlp_cls, prenorm=True,
                  dtype=self.dtype, name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        self.norm = _Norm(dtype=self.dtype)
        if self.num_classes > 0:
            self.head = nn.Dense(self.num_classes, dtype=self.dtype)

    def __call__(self, x, deterministic=True):
        """x: (b, h, w, c) NHWC images -> (b, num_classes) logits."""
        x = self.patch_embed(x)
        b = x.shape[0]
        if self.class_token:
            cls = jnp.broadcast_to(
                self.cls_token.astype(self.dtype), (b, 1, self.embed_dim)
            )
            x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed.astype(self.dtype)
        residual = None
        for blk in self.blocks:
            x, residual = blk(x, residual, deterministic=deterministic)
        # final prenorm add + norm
        x = self.norm(
            x.astype(jnp.float32) + (residual.astype(jnp.float32)
                                     if residual is not None else 0.0)
        )
        if self.global_pool == "avg":
            feat = x[:, 1 if self.class_token else 0:].mean(axis=1)
        else:
            feat = x[:, 0]
        if self.num_classes > 0:
            return self.head(feat)
        return feat


def vit_base_patch16_224(**kwargs):
    return VisionTransformer(
        patch_size=16, embed_dim=768, depth=12, num_heads=12, **kwargs
    )


def vit_small_patch16_224(**kwargs):
    return VisionTransformer(
        patch_size=16, embed_dim=384, depth=12, num_heads=6, **kwargs
    )


def vit_large_patch16_224(**kwargs):
    return VisionTransformer(
        patch_size=16, embed_dim=1024, depth=24, num_heads=16, **kwargs
    )
