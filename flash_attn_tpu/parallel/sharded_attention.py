"""Mesh-sharded attention wrappers.

Pallas kernels are opaque to GSPMD auto-partitioning, so multi-device
attention runs the kernel per-shard under `jax.shard_map`: batch on the
"data" axis, heads on the "model" axis (the reference's head-sharded
`ParallelMHA`, `modules/mha.py:707` — no communication inside attention),
and optionally query-sequence on a "seq" axis with all-gathered K/V (the
gather form of sequence parallelism; ring attention in
`parallel/ring_attention.py` streams K/V instead of gathering).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from flash_attn_tpu.interface import _attn_bhsd, flash_attn_func


def sharded_flash_attn_func(
    mesh,
    q,
    k,
    v,
    *,
    batch_axis="data",
    head_axis="model",
    seq_axis=None,
    softmax_scale=None,
    causal=False,
    window_size=(-1, -1),
    softcap=0.0,
    alibi_slopes=None,
):
    """flash_attn_func over a mesh: (b, s, h, d) inputs, heads TP-sharded.

    With `seq_axis`, q is sequence-sharded; each shard receives full K/V
    (all-gathered at the shard_map boundary) and causal alignment is
    restored by passing `seqused_k = (i+1)*chunk` per shard — the same
    bottom-right-offset trick the kernel already uses for varlen.
    """
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(q.shape[-1])
    qspec = P(batch_axis, seq_axis, head_axis, None)
    kvspec = P(batch_axis, None, head_axis, None)

    if seq_axis is None:
        def f(q, k, v):
            return flash_attn_func(
                q, k, v, softmax_scale=softmax_scale, causal=causal,
                window_size=window_size, softcap=softcap,
                alibi_slopes=alibi_slopes,
            )

        return jax.shard_map(
            f, mesh=mesh, in_specs=(qspec, qspec, qspec), out_specs=qspec,
            check_vma=False,
        )(q, k, v)

    assert alibi_slopes is None, "alibi + seq parallel: use ring attention"
    nseq = mesh.shape[seq_axis]
    chunk = q.shape[1] // nseq
    sk = k.shape[1]

    def f(q_shard, k_full, v_full):
        i = jax.lax.axis_index(seq_axis)
        b = q_shard.shape[0]
        seqused_q = jnp.full((b,), chunk, jnp.int32)
        if causal:
            # shard i's rows are global rows [i*chunk, (i+1)*chunk); with
            # seqused_k = (i+1)*chunk the kernel's bottom-right alignment
            # offset becomes i*chunk — exactly the global causal diagonal.
            seqused_k = jnp.full((b,), (i + 1) * chunk, jnp.int32)
        else:
            seqused_k = jnp.full((b,), sk, jnp.int32)
        o, _ = _attn_bhsd(
            jnp.swapaxes(q_shard, 1, 2),
            jnp.swapaxes(k_full, 1, 2),
            jnp.swapaxes(v_full, 1, 2),
            softmax_scale=softmax_scale, causal=causal,
            window_size=window_size, softcap=softcap, alibi_slopes=None,
            seqused_q=seqused_q, seqused_k=seqused_k,
        )
        return jnp.swapaxes(o, 1, 2)

    return jax.shard_map(
        f, mesh=mesh, in_specs=(qspec, kvspec, kvspec), out_specs=qspec,
        check_vma=False,
    )(q, k, v)
