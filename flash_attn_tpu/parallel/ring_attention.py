"""Ring attention over the ICI mesh.

The reference has **no** context parallelism (SURVEY §2.3: long context via
kernel memory-linearity + split-KV only); this is the new layer the TPU
build adds for 100k+ contexts across chips/hosts.  Design:

* q/k/v are sequence-sharded over a mesh axis.  Each device computes
  flash attention of its q chunk against the K/V chunk it currently
  holds, then rotates K/V one step around the ring with `lax.ppermute`
  while merging the partial result via the LSE-weighted state merge
  (the same math as the split-KV combine kernel,
  `flash_fwd_combine_kernel.h`).
* Causal masking across chunks uses the kernel's bottom-right `seqused_k`
  offset: a *future* source chunk gets seqused_k=0 (fully skipped inside
  the kernel — only grid overhead), the *diagonal* chunk gets chunk-aligned
  causal, *past* chunks get an offset that disables the mask.  One kernel
  instantiation serves all three cases with a traced scalar.
* The ppermute for hop t+1 is independent of hop t's attention output, so
  XLA's latency-hiding scheduler overlaps communication with the mainloop
  — the compiler version of the reference's async-NCCL overlap pattern
  (`ops/fused_dense.py:63-75`).
* Differentiable end-to-end: the flash core exposes (o, lse) with a
  dLSE-aware backward, so autodiff through scan + ppermute + merge yields
  the ring backward (a reverse rotation of dK/dV) for free.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from flash_attn_tpu.interface import _make_core
from flash_attn_tpu.kernels.combine import merge_attn_state


def _ring_shard_fn(q, k, v, *, axis, n, scale, causal, block_q, block_k):
    """Per-shard ring attention body; q/k/v are (b, chunk, h|hk, d)."""
    b, chunk, h, d = q.shape
    core = _make_core(scale, causal, (-1, -1), 0.0, False, block_q, block_k,
                      0.0)
    i = jax.lax.axis_index(axis)
    qt = jnp.swapaxes(q, 1, 2)

    o0 = jnp.zeros((b, h, chunk, d), jnp.float32)
    lse0 = jnp.full((b, h, chunk), -jnp.inf, jnp.float32)
    perm = [(j, (j + 1) % n) for j in range(n)]

    def hop(carry, t):
        k_cur, v_cur, o, lse = carry
        src = (i - t) % n  # which global chunk this device holds at hop t
        if causal:
            # future chunk -> 0 keys (kernel skips every tile);
            # diagonal -> chunk-aligned causal;
            # past -> causal mask disabled by shifting the bottom-right
            # offset (seqused_q=1 -> offset = chunk-1 admits every column)
            # while the padding mask stays at the true chunk length.
            seqused_k = jnp.where(src > i, 0, chunk)
            seqused_q = jnp.where(src < i, 1, chunk)
        else:
            seqused_k = chunk
            seqused_q = chunk
        seqused_k = jnp.full((b,), seqused_k, jnp.int32)
        seqused_q = jnp.full((b,), seqused_q, jnp.int32)
        # rotate early: independent of this hop's compute, so XLA overlaps
        # the ICI transfer with the attention mainloop
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        o_t, lse_t = core(
            qt, jnp.swapaxes(k_cur, 1, 2), jnp.swapaxes(v_cur, 1, 2),
            None, None, seqused_q, seqused_k, jnp.int32(0),
        )
        o, lse = merge_attn_state(o, lse, o_t.astype(jnp.float32), lse_t)
        return (k_nxt, v_nxt, o, lse), None

    (k_f, v_f, o, lse), _ = jax.lax.scan(
        hop, (k, v, o0, lse0), jnp.arange(n)
    )
    del k_f, v_f
    return jnp.swapaxes(o, 1, 2).astype(q.dtype)


def ring_flash_attn_func(
    mesh,
    q,
    k,
    v,
    *,
    seq_axis: str = "seq",
    batch_axis: str | None = "data",
    head_axis: str | None = "model",
    softmax_scale: float | None = None,
    causal: bool = False,
    block_q: int | None = None,
    block_k: int | None = None,
):
    """Ring attention: (b, s, h, d) inputs sequence-sharded over `seq_axis`
    (optionally batch/head-sharded too).  Sequence length must divide the
    ring size.  Returns o with q's sharding."""
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(q.shape[-1])
    n = mesh.shape[seq_axis]
    assert q.shape[1] % n == 0 and k.shape[1] % n == 0
    assert q.shape[1] == k.shape[1], "ring attention needs sq == sk"
    spec = P(batch_axis, seq_axis, head_axis, None)
    f = partial(
        _ring_shard_fn, axis=seq_axis, n=n, scale=float(softmax_scale),
        causal=causal, block_q=block_q, block_k=block_k,
    )
    return jax.shard_map(
        f, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
