"""flash_attn_tpu — a TPU-native flash-attention framework.

Brand-new JAX/Pallas implementation with the capabilities of the reference
GPU library (public surface mirrors `flash_attn/__init__.py:3-11`): flash
attention fwd/bwd kernels, varlen, KV-cache decode with split-KV + paged KV,
fused ops, a mesh-parallel transformer model zoo, generation runtime, and a
training harness — all architected for TPU (MXU tiling, Pallas kernels,
jax.sharding meshes, XLA collectives).
"""

from flash_attn_tpu.version import __version__
from flash_attn_tpu.interface import (
    flash_attn_func,
    flash_attn_kvpacked_func,
    flash_attn_qkvpacked_func,
    flash_attn_varlen_func,
    flash_attn_varlen_kvpacked_func,
    flash_attn_varlen_qkvpacked_func,
    flash_attn_with_kvcache,
    fuse_kv_cache,
    split_kv_cache,
)
from flash_attn_tpu.kernels.flex import (
    BlockMask,
    create_block_mask,
    flex_attention,
)
from flash_attn_tpu.kernels.varlen_packed import flash_attn_varlen_packed_func

__all__ = [
    "__version__",
    "flash_attn_func",
    "flash_attn_kvpacked_func",
    "flash_attn_qkvpacked_func",
    "flash_attn_varlen_func",
    "flash_attn_varlen_kvpacked_func",
    "flash_attn_varlen_qkvpacked_func",
    "flash_attn_with_kvcache",
    "fuse_kv_cache",
    "split_kv_cache",
    "BlockMask",
    "create_block_mask",
    "flex_attention",
    "flash_attn_varlen_packed_func",
]
