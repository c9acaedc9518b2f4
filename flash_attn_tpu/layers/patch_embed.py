"""Image-to-patch embedding (counterpart of
`flash_attn/layers/patch_embed.py:17`)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class PatchEmbed(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    in_chans: int = 3
    bias: bool = True
    flatten: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (b, h, w, c) NHWC -> (b, num_patches, embed_dim)."""
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), use_bias=self.bias,
            dtype=self.dtype, name="proj",
        )(x)
        if self.flatten:
            b, h, w, c = x.shape
            x = x.reshape(b, h * w, c)
        return x
