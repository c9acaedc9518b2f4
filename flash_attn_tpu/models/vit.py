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
from flash_attn_tpu.ops.activations import gelu_approx, gelu_exact


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
    # timm no_embed_class: pos_embed covers patches only; the cls token is
    # concatenated AFTER the add (reference `vit.py:255 _pos_embed`)
    no_embed_class: bool = False
    global_pool: str = "token"  # or "avg"
    # fc_norm: norm applied to the pooled feature instead of the sequence
    # (timm avg-pool convention); None = auto (True iff global_pool=="avg")
    fc_norm: Any = None
    drop_rate: float = 0.0            # pos/residual dropout
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0       # stochastic depth, linearly scaled
    act_layer: str = "gelu_exact"     # timm/HF ViT use erf GELU
    use_flash_attn: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.patch_embed = PatchEmbed(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.embed_dim, in_chans=self.in_chans,
            dtype=self.dtype,
        )
        num_patches = (self.img_size // self.patch_size) ** 2
        n_tok = num_patches + (
            1 if self.class_token and not self.no_embed_class else 0)
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
            dropout=self.attn_drop_rate, dtype=self.dtype,
        )
        act = gelu_exact if self.act_layer == "gelu_exact" else gelu_approx
        mlp_cls = functools.partial(
            Mlp, hidden_features=int(self.embed_dim * self.mlp_ratio),
            activation=act, dtype=self.dtype,
        )
        # stochastic depth decay rule (reference vit.py dpr)
        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1)
               for i in range(self.depth)]
        self.blocks = [
            Block(mixer_cls=mixer_cls, mlp_cls=mlp_cls, prenorm=True,
                  resid_dropout1=self.drop_rate,
                  resid_dropout2=self.drop_rate,
                  drop_path1=dpr[max(i - 1, 0)] if i > 0 else 0.0,
                  drop_path2=dpr[i],
                  dtype=self.dtype, name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        use_fc_norm = (self.global_pool == "avg" if self.fc_norm is None
                       else bool(self.fc_norm))
        self._use_fc_norm = use_fc_norm
        if use_fc_norm:
            self.fc_norm_layer = _Norm(dtype=self.dtype)
        else:
            self.norm = _Norm(dtype=self.dtype)
        if self.num_classes > 0:
            self.head = nn.Dense(self.num_classes, dtype=self.dtype)

    def _pos_embed(self, x):
        b = x.shape[0]
        pe = self.pos_embed.astype(self.dtype)
        if self.class_token:
            cls = jnp.broadcast_to(
                self.cls_token.astype(self.dtype), (b, 1, self.embed_dim))
            if self.no_embed_class:
                # add to patches only, then concat (reference vit.py:258)
                return jnp.concatenate([cls, x + pe], axis=1)
            return jnp.concatenate([cls, x], axis=1) + pe
        return x + pe

    def forward_features(self, x, deterministic=True):
        x = self._pos_embed(self.patch_embed(x))
        residual = None
        for blk in self.blocks:
            x, residual = blk(x, residual, deterministic=deterministic)
        # final prenorm add (+ sequence norm unless fc_norm pools first)
        x = x.astype(jnp.float32) + (residual.astype(jnp.float32)
                                     if residual is not None else 0.0)
        if not self._use_fc_norm:
            x = self.norm(x)
        return x

    def forward_head(self, x, pre_logits: bool = False):
        if self.global_pool == "avg":
            feat = x[:, 1 if self.class_token else 0:].mean(axis=1)
        else:
            feat = x[:, 0]
        if self._use_fc_norm:
            feat = self.fc_norm_layer(feat)
        if pre_logits or self.num_classes <= 0:
            return feat
        return self.head(feat)

    def __call__(self, x, deterministic=True, pre_logits=False):
        """x: (b, h, w, c) NHWC images -> (b, num_classes) logits."""
        x = self.forward_features(x, deterministic=deterministic)
        return self.forward_head(x, pre_logits=pre_logits)


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


def remap_state_dict_hf_vit(state_dict, depth: int):
    """HF transformers ViTModel -> flax params for VisionTransformer.

    The reference remaps timm checkpoints (`vit.py:327 load_state_dict`
    key_mapping_attn); HF's ViT is the same pre-norm architecture with
    split q/k/v, so this is the equivalent loader for the HF hub.
    """
    import numpy as np

    from flash_attn_tpu.models.common import np_

    sd = {k.removeprefix("vit."): np_(v) for k, v in state_dict.items()}
    proj_w = sd.pop("embeddings.patch_embeddings.projection.weight")
    p = {
        "cls_token": sd.pop("embeddings.cls_token"),
        "pos_embed": sd.pop("embeddings.position_embeddings"),
        "patch_embed": {
            "proj": {
                # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
                "kernel": np.transpose(proj_w, (2, 3, 1, 0)),
                "bias": sd.pop("embeddings.patch_embeddings.projection.bias"),
            }
        },
        "norm": {
            "weight": sd.pop("layernorm.weight"),
            "bias": sd.pop("layernorm.bias"),
        },
    }
    for i in range(depth):
        hf = f"encoder.layer.{i}."
        wq = sd.pop(hf + "attention.attention.query.weight")
        wk = sd.pop(hf + "attention.attention.key.weight")
        wv = sd.pop(hf + "attention.attention.value.weight")
        bq = sd.pop(hf + "attention.attention.query.bias")
        bk = sd.pop(hf + "attention.attention.key.bias")
        bv = sd.pop(hf + "attention.attention.value.bias")
        p[f"blocks_{i}"] = {
            "mixer": {
                "Wqkv": {
                    "kernel": np.concatenate([wq, wk, wv], axis=0).T,
                    "bias": np.concatenate([bq, bk, bv], axis=0),
                },
                "out_proj": {
                    "kernel": sd.pop(hf + "attention.output.dense.weight").T,
                    "bias": sd.pop(hf + "attention.output.dense.bias"),
                },
            },
            "norm1": {
                "weight": sd.pop(hf + "layernorm_before.weight"),
                "bias": sd.pop(hf + "layernorm_before.bias"),
            },
            "norm2": {
                "weight": sd.pop(hf + "layernorm_after.weight"),
                "bias": sd.pop(hf + "layernorm_after.bias"),
            },
            "mlp": {
                "fc1": {
                    "kernel": sd.pop(hf + "intermediate.dense.weight").T,
                    "bias": sd.pop(hf + "intermediate.dense.bias"),
                },
                "fc2": {
                    "kernel": sd.pop(hf + "output.dense.weight").T,
                    "bias": sd.pop(hf + "output.dense.bias"),
                },
            },
        }
    leftover = [k for k in sd if "pooler" not in k]
    assert not leftover, f"unmapped: {leftover[:8]}"
    return p
