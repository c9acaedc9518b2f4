"""LSE-weighted combination of partial attention outputs.

The math of the reference's split-KV combine kernels
(`csrc/flash_attn/src/flash_fwd_kernel.h:1111`
`combine_attn_seqk_parallel`, FA3 `hopper/flash_fwd_combine_kernel.h`):
given per-split normalised outputs o_i and their log-sum-exps lse_i over
disjoint key sets, the total is

    lse = logsumexp_i(lse_i)
    o   = sum_i exp(lse_i - lse) * o_i

Empty splits carry lse = +inf and o = 0 (the kernel's fully-masked-row
convention) and must contribute zero weight.

On TPU this is a small bandwidth-bound reduction that XLA fuses well, so it
is expressed in jnp rather than a hand-written kernel; it is reused by the
split-KV decode path and by ring attention's per-hop merge.
"""

from __future__ import annotations

import jax.numpy as jnp


def combine_attn_partials(o_parts, lse_parts, axis: int = 0):
    """Combine partial attention results along `axis`.

    o_parts: (..., splits, ..., L, d) float32 per-split normalised outputs.
    lse_parts: same shape minus the trailing d, natural-log LSEs (+inf for
        empty splits).
    Returns (o, lse) with the split axis reduced.
    """
    o_parts = o_parts.astype(jnp.float32)
    lse_parts = lse_parts.astype(jnp.float32)
    # +inf marks "no keys": convert to -inf so it contributes zero weight.
    lse_eff = jnp.where(jnp.isposinf(lse_parts), -jnp.inf, lse_parts)
    m = jnp.max(lse_eff, axis=axis, keepdims=True)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    w = jnp.exp(lse_eff - m_safe)  # (splits, ..., L)
    sumw = jnp.sum(w, axis=axis, keepdims=True)
    lse = jnp.where(
        jnp.isneginf(m),
        jnp.inf,  # all splits empty -> reference +inf convention
        (m_safe + jnp.log(jnp.maximum(sumw, 1e-37))),
    )
    norm = jnp.where(sumw == 0.0, 1.0, sumw)
    o = jnp.sum(o_parts * (w / norm)[..., None], axis=axis)
    return o, jnp.squeeze(lse, axis=axis)


def merge_attn_state(o_a, lse_a, o_b, lse_b):
    """Pairwise merge of two attention states (ring-attention hop merge)."""
    o = jnp.stack([o_a.astype(jnp.float32), o_b.astype(jnp.float32)], axis=0)
    lse = jnp.stack([lse_a, lse_b], axis=0)
    return combine_attn_partials(o, lse, axis=0)
