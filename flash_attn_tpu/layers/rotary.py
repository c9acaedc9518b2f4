"""Rotary position embeddings.

Counterpart of `flash_attn/layers/rotary.py` (`apply_rotary_emb:93`, fused
QKV variant `:236`, `RotaryEmbedding:331` with xPos support).  The reference
backs these with a Triton kernel (`ops/triton/rotary.py`); on TPU the
rotation is a handful of VPU ops that XLA fuses into neighbouring matmuls,
so the ops are expressed directly in jnp (differentiable as-is — no
custom_vjp needed since cos/sin are constants to autodiff).

All functions use (batch, seqlen, nheads, headdim) layout like the
reference; `seqlen_offset` supports decode-time application.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rotate_half(x, interleaved=False):
    if not interleaved:
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _expand_cos(c, interleaved):
    # (s, d/2) -> (s, 1, d) duplicating per rotated pair
    if not interleaved:
        c = jnp.concatenate([c, c], axis=-1)
    else:
        c = jnp.stack([c, c], axis=-1).reshape(*c.shape[:-1], -1)
    return c[:, None, :]


def apply_rotary_emb(x, cos, sin, interleaved=False, seqlen_offsets=0,
                     inplace=False, cu_seqlens=None, max_seqlen=None):
    """x: (b, s, h, d); cos/sin: (s_max, rotary_dim/2).

    Rotates the first `rotary_dim` features of x (`rotary.py:93`).
    `seqlen_offsets` may be an int or a (b,) array (decode).
    """
    del inplace  # functional on TPU; jit donation gives in-place behaviour
    if cu_seqlens is not None:
        # Packed varlen stream (`rotary.py:93` cu_seqlens path): x is
        # (total, h, d) and positions restart at each cu_seqlens boundary.
        # One gather builds per-token positions; the rotation itself is the
        # same VPU math, so XLA fuses it like the fixed-length path.
        assert x.ndim == 3, "varlen x must be (total_tokens, h, d)"
        total = x.shape[0]
        cu = jnp.asarray(cu_seqlens, jnp.int32)
        t = jnp.arange(total, dtype=jnp.int32)
        seg = jnp.clip(
            jnp.searchsorted(cu, t, side="right") - 1, 0, cu.shape[0] - 2)
        pos = t - cu[seg]
        if isinstance(seqlen_offsets, int):
            if seqlen_offsets:
                pos = pos + seqlen_offsets
        else:
            pos = pos + jnp.asarray(seqlen_offsets, jnp.int32)[seg]
        pos = jnp.clip(pos, 0, cos.shape[0] - 1)
        rd = cos.shape[-1] * 2
        c = _expand_cos(cos[pos].astype(jnp.float32), interleaved)
        sn = _expand_cos(sin[pos].astype(jnp.float32), interleaved)
        x_rot = x[..., :rd].astype(jnp.float32)
        out = x_rot * c + rotate_half(x_rot, interleaved) * sn
        return jnp.concatenate([out.astype(x.dtype), x[..., rd:]], axis=-1)
    b, s, h, d = x.shape
    rd = cos.shape[-1] * 2
    if isinstance(seqlen_offsets, int):
        idx = seqlen_offsets + np.arange(s)
        c = cos[idx]
        sn = sin[idx]
        c = _expand_cos(c.astype(jnp.float32), interleaved)[None]
        sn = _expand_cos(sn.astype(jnp.float32), interleaved)[None]
    else:
        idx = jnp.asarray(seqlen_offsets)[:, None] + jnp.arange(s)[None, :]
        c = cos[idx].astype(jnp.float32)
        sn = sin[idx].astype(jnp.float32)
        if not interleaved:
            c = jnp.concatenate([c, c], axis=-1)
            sn = jnp.concatenate([sn, sn], axis=-1)
        else:
            c = jnp.stack([c, c], axis=-1).reshape(*c.shape[:-1], -1)
            sn = jnp.stack([sn, sn], axis=-1).reshape(*sn.shape[:-1], -1)
        c = c[:, :, None, :]
        sn = sn[:, :, None, :]
    x_rot = x[..., :rd].astype(jnp.float32)
    out = x_rot * c + rotate_half(x_rot, interleaved) * sn
    return jnp.concatenate([out.astype(x.dtype), x[..., rd:]], axis=-1)


def apply_rotary_emb_qkv_(qkv, cos, sin, cos_k=None, sin_k=None,
                          interleaved=False, seqlen_offsets=0,
                          num_heads_q=None):
    """qkv: (b, s, 3, h, d) or (b, s, h_total, d) for GQA-packed.

    Rotates q and k in place-equivalent fashion (`rotary.py:236`).
    """
    cos_k = cos if cos_k is None else cos_k
    sin_k = sin if sin_k is None else sin_k
    if qkv.ndim == 5:
        q = apply_rotary_emb(qkv[:, :, 0], cos, sin, interleaved, seqlen_offsets)
        k = apply_rotary_emb(qkv[:, :, 1], cos_k, sin_k, interleaved, seqlen_offsets)
        return jnp.stack([q, k, qkv[:, :, 2]], axis=2)
    assert num_heads_q is not None
    h_total = qkv.shape[2]
    hk = (h_total - num_heads_q) // 2
    q = apply_rotary_emb(qkv[:, :, :num_heads_q], cos, sin, interleaved,
                         seqlen_offsets)
    k = apply_rotary_emb(
        qkv[:, :, num_heads_q:num_heads_q + hk], cos_k, sin_k, interleaved,
        seqlen_offsets,
    )
    return jnp.concatenate([q, k, qkv[:, :, num_heads_q + hk:]], axis=2)


def apply_rotary_emb_kv_(kv, cos, sin, interleaved=False, seqlen_offsets=0):
    """kv: (b, s, 2, hk, d) (`rotary.py:308`)."""
    k = apply_rotary_emb(kv[:, :, 0], cos, sin, interleaved, seqlen_offsets)
    return jnp.stack([k, kv[:, :, 1]], axis=2)


class RotaryEmbedding:
    """Precomputed rotary tables with optional xPos scaling
    (`rotary.py:331`).  Stateless w.r.t. jit: tables are numpy constants
    baked into the program."""

    def __init__(self, dim, base=10000.0, interleaved=False, scale_base=None,
                 pos_idx_in_fp32=True, interpolation_factor=1.0):
        self.dim = dim
        self.base = float(base)
        self.interleaved = interleaved
        self.scale_base = scale_base
        self.pos_idx_in_fp32 = pos_idx_in_fp32
        # position-interpolation / NTK context extension
        # (`rotary.py:331` interpolation_factor semantics: positions are
        # divided by the factor)
        self.interpolation_factor = float(interpolation_factor)
        self.inv_freq = 1.0 / (
            self.base ** (np.arange(0, dim, 2, dtype=np.float32) / dim)
        )
        self.scale = (
            (np.arange(0, dim, 2, dtype=np.float32) + 0.4 * dim) / (1.4 * dim)
            if scale_base is not None
            else None
        )
        self._cached_len = 0
        self._cos = self._sin = self._cos_k = self._sin_k = None

    def _update(self, seqlen):
        if seqlen <= self._cached_len and self._cos is not None:
            return
        self._cached_len = seqlen
        t = np.arange(seqlen, dtype=np.float32)
        if self.interpolation_factor != 1.0:
            t = t / self.interpolation_factor
        freqs = np.outer(t, self.inv_freq)
        if self.scale is None:
            self._cos = jnp.asarray(np.cos(freqs))
            self._sin = jnp.asarray(np.sin(freqs))
        else:
            power = (t - seqlen // 2) / self.scale_base
            scale = self.scale[None, :] ** power[:, None]
            self._cos = jnp.asarray(np.cos(freqs) * scale)
            self._sin = jnp.asarray(np.sin(freqs) * scale)
            self._cos_k = jnp.asarray(np.cos(freqs) / scale)
            self._sin_k = jnp.asarray(np.sin(freqs) / scale)

    def __call__(self, qkv, kv=None, seqlen_offset=0, max_seqlen=None,
                 num_heads_q=None):
        """qkv: (b, s, 3, h, d) (+ optional separate kv (b, s, 2, hk, d))."""
        seqlen = qkv.shape[1]
        if max_seqlen is not None:
            self._update(max_seqlen)
        elif isinstance(seqlen_offset, int):
            self._update(seqlen + seqlen_offset)
        if kv is None:
            return apply_rotary_emb_qkv_(
                qkv, self._cos, self._sin, self._cos_k, self._sin_k,
                interleaved=self.interleaved, seqlen_offsets=seqlen_offset,
                num_heads_q=num_heads_q,
            )
        q = apply_rotary_emb(
            qkv, self._cos, self._sin, self.interleaved, seqlen_offset
        )
        kv = apply_rotary_emb_kv_(
            kv, self._cos_k if self._cos_k is not None else self._cos,
            self._sin_k if self._sin_k is not None else self._sin,
            interleaved=self.interleaved, seqlen_offsets=seqlen_offset,
        )
        return q, kv
