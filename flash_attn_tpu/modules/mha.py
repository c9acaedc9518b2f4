"""Multi-head attention modules.

Counterpart of `flash_attn/modules/mha.py`: `FlashSelfAttention:53`,
`FlashCrossAttention:133`, reference-math `SelfAttention:230` /
`CrossAttention:282`, `MHA:373` (rotary + KV-cache decode
`_update_kv_cache:496`, fused rotary+cache+attention decode `:502`), and
`ParallelMHA:707` (tensor parallel).

TPU design notes:
* KV caches live in native (b, hk, smax, d) layout so the decode kernel
  reads them without transposes; updates are functional scatters that XLA
  makes in-place under jit donation (the role of the reference's in-place
  `kv_cache[:, start:end] = kv`).
* Inference state is threaded explicitly (`InferenceParams`, a pytree) —
  the JAX analogue of the reference's mutable InferenceParams object
  (`utils/generation.py:24`).
* `ParallelMHA` is `MHA` with head-sharded weights over the "model" mesh
  axis; GSPMD inserts the all-reduce after out_proj.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from flash_attn_tpu.interface import _attn_bhsd, flash_attn_func
from flash_attn_tpu.kernels.flash_decode import decode_attn_bhsd
from flash_attn_tpu.kernels.flash_fwd import flash_attn_fwd_bhsd
from flash_attn_tpu.layers.rotary import RotaryEmbedding
from flash_attn_tpu.parallel.tp import dense_kernel_init, shard_param
from flash_attn_tpu.utils.testing import attention_ref


@flax.struct.dataclass
class InferenceParams:
    """KV-cache container for generation (`utils/generation.py:24`)."""

    max_seqlen: int = flax.struct.field(pytree_node=False)
    max_batch_size: int = flax.struct.field(pytree_node=False)
    lengths_per_sample: jnp.ndarray = None  # (b,) int32 tokens already cached
    key_value_memory_dict: dict[int, Any] = flax.struct.field(
        default_factory=dict
    )

    @property
    def seqlen_offset(self):
        return self.lengths_per_sample

    def reset(self):
        return self.replace(
            lengths_per_sample=jnp.zeros_like(self.lengths_per_sample),
        )


def flash_self_attention(qkv, *, causal=False, softmax_scale=None,
                         window_size=(-1, -1), alibi_slopes=None,
                         softcap=0.0, dropout_p=0.0):
    """`FlashSelfAttention:53` — qkv (b, s, 3, h, d)."""
    return flash_attn_func(
        qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
        dropout_p=dropout_p, softmax_scale=softmax_scale, causal=causal,
        window_size=window_size, softcap=softcap, alibi_slopes=alibi_slopes,
    )


def flash_cross_attention(q, kv, *, causal=False, softmax_scale=None,
                          window_size=(-1, -1), alibi_slopes=None,
                          dropout_p=0.0):
    """`FlashCrossAttention:133` — q (b, sq, h, d), kv (b, sk, 2, hk, d)."""
    return flash_attn_func(
        q, kv[:, :, 0], kv[:, :, 1],
        dropout_p=dropout_p, softmax_scale=softmax_scale, causal=causal,
        window_size=window_size, alibi_slopes=alibi_slopes,
    )


class SelfAttention(nn.Module):
    """Reference-math path (`SelfAttention:230`) — materialises the score
    matrix; supports arbitrary dropout via flax RNG."""

    causal: bool = False
    softmax_scale: Optional[float] = None
    attention_dropout: float = 0.0

    @nn.compact
    def __call__(self, qkv, key_padding_mask=None, deterministic=True):
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        dropout_mask = None
        if self.attention_dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
            b, s, h, _ = q.shape
            dropout_mask = jax.random.bernoulli(
                rng, 1.0 - self.attention_dropout, (b, h, s, k.shape[1])
            )
        out, _ = attention_ref(
            q, k, v, key_padding_mask=key_padding_mask, causal=self.causal,
            softmax_scale=self.softmax_scale, upcast=False,
            dropout_p=self.attention_dropout if dropout_mask is not None else 0.0,
            dropout_mask=dropout_mask,
        )
        return out


class CrossAttention(nn.Module):
    """`CrossAttention:282`."""

    causal: bool = False
    softmax_scale: Optional[float] = None
    attention_dropout: float = 0.0

    @nn.compact
    def __call__(self, q, kv, key_padding_mask=None, deterministic=True):
        k, v = kv[:, :, 0], kv[:, :, 1]
        out, _ = attention_ref(
            q, k, v, key_padding_mask=key_padding_mask, causal=self.causal,
            softmax_scale=self.softmax_scale, upcast=False,
        )
        return out


class MHA(nn.Module):
    """`MHA:373` — self/cross attention with rotary + KV-cache decode."""

    embed_dim: int
    num_heads: int
    num_heads_kv: Optional[int] = None
    head_dim: Optional[int] = None
    cross_attn: bool = False
    qkv_proj_bias: bool = True
    out_proj_bias: bool = True
    dropout: float = 0.0
    softmax_scale: Optional[float] = None
    causal: bool = False
    layer_idx: int = 0
    rotary_emb_dim: int = 0
    rotary_emb_base: float = 10000.0
    rotary_emb_scale_base: Optional[float] = None
    rotary_emb_interleaved: bool = False
    use_flash_attn: bool = True
    return_residual: bool = False
    window_size: tuple = (-1, -1)
    softcap: float = 0.0
    use_alibi: bool = False
    dtype: Any = jnp.float32
    tensor_parallel: bool = False  # head-shard weights over "model" axis
    # When set, run the attention kernel per-shard under shard_map (Pallas
    # is opaque to GSPMD): batch on "data", heads on "model", optionally q
    # sequence on shard_seq_axis (all-gather-KV sequence parallelism).
    mesh: Any = None
    shard_batch_axis: str = "data"
    shard_head_axis: str = "model"
    shard_seq_axis: Optional[str] = None
    # With shard_seq_axis set: stream K/V around the ring (ppermute; KV
    # memory stays O(s/n) per device) instead of all-gather-KV.
    shard_seq_ring: bool = False

    def _heads(self):
        h = self.num_heads
        hk = self.num_heads_kv or h
        d = self.head_dim or self.embed_dim // h
        return h, hk, d

    def _alibi_slopes(self, h):
        if not self.use_alibi:
            return None
        # standard ALiBi slope schedule: 2^(-8i/h)
        import numpy as np

        def slopes(n):
            start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
            return [start * (start ** i) for i in range(n)]

        if math.log2(h).is_integer():
            s = slopes(h)
        else:
            n = 2 ** math.floor(math.log2(h))
            s = slopes(n)
            extra = slopes(2 * n)[0::2][: h - n]
            s = s + extra
        return jnp.asarray(np.array(s, dtype=np.float32))[None, :]

    @nn.compact
    def __call__(self, x, x_kv=None, inference_params=None,
                 key_padding_mask=None, deterministic=True,
                 cu_seqlens=None, max_seqlen=None):
        h, hk, d = self._heads()
        b, s, _ = x.shape
        scale = self.softmax_scale or 1.0 / math.sqrt(d)
        wkw = dict(dtype=self.dtype, kernel_init=dense_kernel_init())

        if not self.cross_attn:
            qkv = nn.Dense((h + 2 * hk) * d, use_bias=self.qkv_proj_bias,
                           name="Wqkv", **wkw)(x)
            if self.tensor_parallel:
                qkv = shard_param(qkv, ("data", None, "model"))
            q = qkv[..., : h * d].reshape(b, s, h, d)
            k = qkv[..., h * d: (h + hk) * d].reshape(b, s, hk, d)
            v = qkv[..., (h + hk) * d:].reshape(b, s, hk, d)
        else:
            q = nn.Dense(h * d, use_bias=self.qkv_proj_bias, name="Wq",
                         **wkw)(x).reshape(b, s, h, d)
            skv = x_kv.shape[1]
            kv = nn.Dense(2 * hk * d, use_bias=self.qkv_proj_bias,
                          name="Wkv", **wkw)(x_kv)
            k = kv[..., : hk * d].reshape(b, skv, hk, d)
            v = kv[..., hk * d:].reshape(b, skv, hk, d)

        rotary = None
        if self.rotary_emb_dim > 0:
            rotary = RotaryEmbedding(
                self.rotary_emb_dim, base=self.rotary_emb_base,
                interleaved=self.rotary_emb_interleaved,
                scale_base=self.rotary_emb_scale_base,
            )

        alibi = self._alibi_slopes(h)
        if alibi is not None:
            alibi = jnp.broadcast_to(alibi, (b, h))

        if inference_params is None:
            if rotary is not None:
                rotary._update(s)
                from flash_attn_tpu.layers.rotary import apply_rotary_emb
                q = apply_rotary_emb(q, rotary._cos, rotary._sin,
                                     self.rotary_emb_interleaved)
                k = apply_rotary_emb(k, rotary._cos, rotary._sin,
                                     self.rotary_emb_interleaved)
            if self.use_flash_attn and cu_seqlens is not None:
                # packed-stream varlen (the reference MHA's
                # cu_seqlens/unpadded form, `modules/mha.py` varlen path):
                # x is (1, total_nnz, d), attention rides the scheduled
                # packed kernel — total-token work, no padding FLOPs
                from flash_attn_tpu import flash_attn_varlen_func

                qp = q.reshape(b * s, h, d)
                kp = k.reshape(b * s, hk, d)
                vp = v.reshape(b * s, hk, d)
                ctx = flash_attn_varlen_func(
                    qp, kp, vp, cu_seqlens, cu_seqlens,
                    max_seqlen, max_seqlen,
                    dropout_p=0.0 if deterministic else self.dropout,
                    softmax_scale=scale, causal=self.causal,
                    window_size=self.window_size, softcap=self.softcap,
                    alibi_slopes=alibi[0] if alibi is not None else None,
                ).reshape(b, s, h, d)
            elif self.use_flash_attn and key_padding_mask is not None:
                # prefix padding masks (the BERT/varlen case) map onto the
                # kernel's per-batch seqused lengths; outputs in padded rows
                # are zeroed like `attention_ref` does.
                lengths = jnp.sum(key_padding_mask.astype(jnp.int32), axis=-1)
                o, _ = _attn_bhsd(
                    jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                    jnp.swapaxes(v, 1, 2),
                    softmax_scale=scale, causal=self.causal,
                    window_size=self.window_size, softcap=self.softcap,
                    alibi_slopes=alibi, seqused_q=lengths, seqused_k=lengths,
                )
                ctx = jnp.swapaxes(o, 1, 2)
                ctx = jnp.where(
                    key_padding_mask[:, :, None, None], ctx, 0.0
                )
            elif self.use_flash_attn:
                if self.mesh is not None and self.shard_seq_ring and (
                        self.shard_seq_axis is not None):
                    from flash_attn_tpu.parallel.ring_attention import (
                        ring_flash_attn_func,
                    )

                    assert alibi is None and self.softcap == 0.0 and (
                        self.window_size == (-1, -1)), (
                        "ring SP supports plain/causal attention")
                    ctx = ring_flash_attn_func(
                        self.mesh, q, k, v,
                        seq_axis=self.shard_seq_axis,
                        batch_axis=self.shard_batch_axis,
                        head_axis=self.shard_head_axis,
                        softmax_scale=scale, causal=self.causal,
                    )
                elif self.mesh is not None:
                    from flash_attn_tpu.parallel.sharded_attention import (
                        sharded_flash_attn_func,
                    )

                    ctx = sharded_flash_attn_func(
                        self.mesh, q, k, v,
                        batch_axis=self.shard_batch_axis,
                        head_axis=self.shard_head_axis,
                        seq_axis=self.shard_seq_axis,
                        softmax_scale=scale, causal=self.causal,
                        window_size=self.window_size, softcap=self.softcap,
                        alibi_slopes=alibi,
                    )
                else:
                    ctx = flash_attn_func(
                        q, k, v,
                        dropout_p=0.0 if deterministic else self.dropout,
                        softmax_scale=scale, causal=self.causal,
                        window_size=self.window_size, softcap=self.softcap,
                        alibi_slopes=alibi,
                    )
            else:
                ctx, _ = attention_ref(
                    q, k, v, key_padding_mask=key_padding_mask,
                    causal=self.causal, softmax_scale=scale,
                    window_size=self.window_size, softcap=self.softcap,
                    upcast=False,
                )
            new_inference_params = None
        else:
            ctx, new_inference_params = self._cached_attention(
                q, k, v, inference_params, rotary, scale, alibi
            )

        out = nn.Dense(self.embed_dim, use_bias=self.out_proj_bias,
                       name="out_proj", **wkw)(ctx.reshape(b, s, h * d))
        if self.tensor_parallel:
            out = shard_param(out, ("data", None, None))
        if inference_params is not None:
            return out, new_inference_params
        if self.return_residual:
            return out, x
        return out

    def _cached_attention(self, q, k, v, inference_params, rotary, scale,
                          alibi):
        """Prefill or decode against the KV cache
        (`_update_kv_cache:496` / `_apply_rotary_update_kvcache_attention:502`)."""
        h, hk, d = self._heads()
        b, s = q.shape[0], q.shape[1]
        lengths = inference_params.lengths_per_sample  # (b,)
        kv_dict = dict(inference_params.key_value_memory_dict)
        if self.layer_idx not in kv_dict:
            kc = jnp.zeros(
                (inference_params.max_batch_size, hk,
                 inference_params.max_seqlen, d), dtype=q.dtype,
            )
            vc = jnp.zeros_like(kc)
        else:
            kc, vc = kv_dict[self.layer_idx]

        if rotary is not None:
            rotary._update(inference_params.max_seqlen)
            from flash_attn_tpu.layers.rotary import apply_rotary_emb
            q = apply_rotary_emb(q, rotary._cos, rotary._sin,
                                 self.rotary_emb_interleaved,
                                 seqlen_offsets=lengths)
            k = apply_rotary_emb(k, rotary._cos, rotary._sin,
                                 self.rotary_emb_interleaved,
                                 seqlen_offsets=lengths)

        # scatter new k/v into the cache at per-sample offsets
        bidx = jnp.arange(b, dtype=jnp.int32)
        hidx = jnp.arange(hk, dtype=jnp.int32)
        sidx = lengths[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
        kc = kc.at[bidx[:, None, None], hidx[None, None, :],
                   sidx[:, :, None]].set(k)
        vc = vc.at[bidx[:, None, None], hidx[None, None, :],
                   sidx[:, :, None]].set(v)
        new_len = lengths + s

        qt = jnp.swapaxes(q, 1, 2)  # (b, h, s, d)
        if s <= 16:
            ctx, _ = decode_attn_bhsd(
                qt, kc, vc, new_len, softmax_scale=scale, causal=True,
                window_size=self.window_size, softcap=self.softcap,
                alibi_slopes=alibi,
            )
        else:
            ctx, _ = flash_attn_fwd_bhsd(
                qt, kc, vc,
                seqused_q=jnp.full((b,), s, jnp.int32),
                seqused_k=new_len,
                softmax_scale=scale, causal=self.causal,
                window_size=self.window_size, softcap=self.softcap,
                alibi_slopes=alibi,
            )
        ctx = jnp.swapaxes(ctx, 1, 2)

        kv_dict[self.layer_idx] = (kc, vc)
        # NOTE: lengths_per_sample is advanced once per model forward by the
        # caller (GPTModel / the decode loop), not per layer.
        new_params = inference_params.replace(key_value_memory_dict=kv_dict)
        return ctx, new_params


class ParallelMHA(MHA):
    """`ParallelMHA:707` — MHA with head-sharded weights (GSPMD)."""

    tensor_parallel: bool = True
