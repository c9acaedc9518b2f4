"""Block-sparse attention with a user-supplied block mask.

TPU-native counterpart of the reference FA1 blocksparse module
(`flash_attn/flash_blocksparse_attention.py:197` FlashBlocksparseAttention,
`flash_attn/flash_blocksparse_attn_interface.py` convert_blockmask).  Instead
of the FA1 CUDA kernel's fixed (256, 16) block granularity, the TPU version
rides the flex/block-sparse Pallas kernel (`kernels/flex.py`) at MXU-friendly
block sizes, so any (nq_blocks, nk_blocks) boolean layout works.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.kernels.flex import BlockMask, flex_attention


def convert_blockmask(
    blockmask,
    B: int,
    H: int,
    q_len: int,
    kv_len: int,
    *,
    block_q: int,
    block_k: int,
    causal: bool = False,
):
    """(nq, nk) / (H, nq, nk) / (B, H, nq, nk) bool -> `BlockMask`.

    Selected blocks attend fully; with `causal=True`, diagonal-crossing
    blocks are evaluated with the causal mask in-kernel (the role of the
    reference's `convert_blockmask` reordering,
    `flash_blocksparse_attn_interface.py`).
    """
    nq = -(-q_len // block_q)
    nk = -(-kv_len // block_k)
    bm = jnp.asarray(blockmask, bool)
    bm = jnp.broadcast_to(bm.reshape((1,) * (4 - bm.ndim) + bm.shape),
                          (B, H, nq, nk))

    qb = np.arange(nq)
    kb = np.arange(nk)
    offset = kv_len - q_len  # bottom-right aligned, reference semantics
    if causal:
        # block fully below the diagonal: every column <= every row + offset
        full_below = (kb[None, :] + 1) * block_k - 1 <= qb[:, None] * block_q + offset
        crossing = (kb[None, :] * block_k <= qb[:, None] * block_q
                    + (block_q - 1) + offset) & ~full_below
    else:
        full_below = np.ones((nq, nk), bool)
        crossing = np.zeros((nq, nk), bool)
    # padded tails always need in-kernel masking
    if kv_len % block_k:
        crossing[:, -1] |= full_below[:, -1]
        full_below[:, -1] = False
    full_below = jnp.asarray(full_below)
    crossing = jnp.asarray(crossing)

    all_ = bm & full_below
    partial = bm & crossing

    def pack(m):
        counts = jnp.sum(m, axis=-1, dtype=jnp.int32)
        order = jnp.argsort(~m, axis=-1, stable=True).astype(jnp.int32)
        return counts, order

    kv_num, kv_idx = pack(partial)
    full_kv_num, full_kv_idx = pack(all_)
    q_num, q_idx = pack(jnp.swapaxes(partial, -1, -2))
    full_q_num, full_q_idx = pack(jnp.swapaxes(all_, -1, -2))
    return BlockMask(
        block_q, block_k, q_len, kv_len,
        kv_num, kv_idx, full_kv_num, full_kv_idx,
        q_num, q_idx, full_q_num, full_q_idx,
    )


def flash_blocksparse_attn_func(
    qkv,
    blockmask,
    *,
    causal: bool = False,
    softmax_scale=None,
    block_q: int = 512,
    block_k: int = 512,
):
    """Packed-QKV block-sparse attention (reference
    `FlashBlocksparseAttention.forward`).  qkv: (b, s, 3, h, d);
    blockmask: (nq, nk) (or broadcastable with leading H/B dims) bool.
    """
    b, s, _, h, d = qkv.shape
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    bmask = convert_blockmask(
        blockmask, b, h, s, s, block_q=block_q, block_k=block_k, causal=causal
    )
    mask_mod = (lambda b_, h_, qi, ki: qi >= ki) if causal else None
    return flex_attention(
        q, k, v, mask_mod=mask_mod, block_mask=bmask,
        softmax_scale=softmax_scale,
    )


class FlashBlocksparseAttention:
    """Callable module mirroring the reference FA1 blocksparse API
    (`flash_blocksparse_attention.py:197`): construct with a layout, call
    with packed qkv."""

    def __init__(self, sparsity_config=None, *, blockmask=None,
                 softmax_scale=None, block_q: int = 512, block_k: int = 512):
        if blockmask is None and sparsity_config is not None:
            blockmask = sparsity_config
        self.blockmask = blockmask
        self.softmax_scale = softmax_scale
        self.block_q = block_q
        self.block_k = block_k

    def __call__(self, qkv, *, causal: bool = False, blockmask=None):
        return flash_blocksparse_attn_func(
            qkv, self.blockmask if blockmask is None else blockmask,
            causal=causal, softmax_scale=self.softmax_scale,
            block_q=self.block_q, block_k=self.block_k,
        )
