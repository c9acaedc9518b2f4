"""Pallas TPU kernels: flash fwd/bwd, decode, flex (mods/sparsity),
packed varlen, combine."""

from flash_attn_tpu.kernels.combine import combine_attn_partials, merge_attn_state
from flash_attn_tpu.kernels.flash_bwd import flash_attn_bwd_bhsd
from flash_attn_tpu.kernels.flash_decode import (
    decode_attn_bhsd,
    decode_attn_ref_layout,
    flash_attn_with_kvcache,
)
from flash_attn_tpu.kernels.flash_fwd import flash_attn_fwd_bhsd
from flash_attn_tpu.kernels.flex import BlockMask, create_block_mask, flex_attention
from flash_attn_tpu.kernels.varlen_packed import (
    flash_attn_varlen_packed_func,
    varlen_block_mask,
)

__all__ = [
    "combine_attn_partials",
    "merge_attn_state",
    "flash_attn_bwd_bhsd",
    "decode_attn_bhsd",
    "decode_attn_ref_layout",
    "flash_attn_with_kvcache",
    "flash_attn_fwd_bhsd",
    "BlockMask",
    "create_block_mask",
    "flex_attention",
    "flash_attn_varlen_packed_func",
    "varlen_block_mask",
]
