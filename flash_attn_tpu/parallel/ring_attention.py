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
* Causal masking across chunks rides the kernel's bottom-right
  `seqused` offset: the desired per-chunk-pair offset
  `row_global - col_global` shift is synthesized by choosing
  (seqused_q, seqused_k) — a *future* chunk gets seqused_k=0 (fully
  skipped inside the kernel), a *past* chunk an offset that admits every
  column, the *diagonal* the exact shifted causal.  One kernel
  instantiation serves all cases with traced scalars, and sq != sk
  (bottom-right alignment) falls out of the same arithmetic.
* **Zigzag load balancing** (`zigzag=True`): with plain chunking, causal
  device i does ~i/n of the work — a ~2x tail imbalance.  Zigzag gives
  each device global chunks (i, 2n-1-i) so per-device work is uniform;
  inputs must be pre-permuted with `zigzag_permute` (one-time reorder,
  standard context-parallel practice).
* The ppermute for hop t+1 is independent of hop t's attention output, so
  XLA's latency-hiding scheduler overlaps communication with the mainloop
  — the compiler version of the reference's async-NCCL overlap pattern
  (`ops/fused_dense.py:63-75`).
* Differentiable end-to-end: autodiff through scan + ppermute + merge
  yields the ring backward (a reverse rotation of dK/dV) for free.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from flash_attn_tpu.interface import _make_core
from flash_attn_tpu.kernels.combine import merge_attn_state


def zigzag_permute(x, n, axis=1):
    """Reorder a (…, s, …) sequence so contiguous device shards hold the
    zigzag chunk pair (i, 2n-1-i): chunk order [0, 2n-1, 1, 2n-2, ...]."""
    s = x.shape[axis]
    assert s % (2 * n) == 0, (s, n)
    c = s // (2 * n)
    order = []
    for i in range(n):
        order += [i, 2 * n - 1 - i]
    idx = jnp.concatenate(
        [jnp.arange(c) + z * c for z in order]).astype(jnp.int32)
    return jnp.take(x, idx, axis=axis)


def zigzag_unpermute(x, n, axis=1):
    """Inverse of `zigzag_permute`."""
    s = x.shape[axis]
    c = s // (2 * n)
    order = []
    for i in range(n):
        order += [i, 2 * n - 1 - i]
    inv = [0] * (2 * n)
    for pos, z in enumerate(order):
        inv[z] = pos
    idx = jnp.concatenate(
        [jnp.arange(c) + pos * c for pos in inv]).astype(jnp.int32)
    return jnp.take(x, idx, axis=axis)


def _chunk_seqused(off_l, cq, ck, b):
    """(seqused_q, seqused_k) synthesizing bottom-right offset `off_l`
    (local cols visible iff col <= row + off_l), with full-skip when no
    row sees any column."""
    skip = off_l <= -cq
    sk_b = jnp.where(skip, 0, ck)
    sq_b = jnp.maximum(ck - off_l, 1)
    return (jnp.full((b,), 0, jnp.int32) + sq_b.astype(jnp.int32),
            jnp.full((b,), 0, jnp.int32) + sk_b.astype(jnp.int32))


def _ring_shard_fn(q, k, v, *, axis, n, scale, causal, block_q, block_k,
                   off_g, zigzag):
    """Per-shard ring attention body; q (b, cq, h, d), k/v (b, ck, hk, d)."""
    b, cq, h, d = q.shape
    ck = k.shape[1]
    core = _make_core(scale, causal, (-1, -1), 0.0, False, block_q, block_k,
                      0.0)
    i = jax.lax.axis_index(axis)
    perm = [(j, (j + 1) % n) for j in range(n)]
    seed = jnp.int32(0)

    def attend(qt, k_cur, v_cur, off_l):
        """One (q view, k chunk) attention with synthesized offset."""
        sq_b, sk_b = _chunk_seqused(off_l, qt.shape[2], k_cur.shape[1], b)
        o_t, lse_t = core(
            qt, jnp.swapaxes(k_cur, 1, 2), jnp.swapaxes(v_cur, 1, 2),
            None, None, sq_b, sk_b, seed,
        )
        return o_t.astype(jnp.float32), lse_t

    if not zigzag:
        qt = jnp.swapaxes(q, 1, 2)
        o0 = jnp.zeros((b, h, cq, d), jnp.float32)
        lse0 = jnp.full((b, h, cq), -jnp.inf, jnp.float32)

        def hop(carry, t):
            k_cur, v_cur, o, lse = carry
            src = (i - t) % n
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            if causal:
                off_l = i * cq + off_g - src * ck
            else:
                off_l = ck - 1 + cq  # everything visible
            o_t, lse_t = attend(qt, k_cur, v_cur, off_l)
            o, lse = merge_attn_state(o, lse, o_t, lse_t)
            return (k_nxt, v_nxt, o, lse), None

        (_, _, o, lse), _ = jax.lax.scan(hop, (k, v, o0, lse0),
                                         jnp.arange(n))
        return jnp.swapaxes(o, 1, 2).astype(q.dtype)

    # ---- zigzag: device holds global q chunks (i, 2n-1-i) and, at hop t,
    # k chunks (src, 2n-1-src).  4 (q half, k half) pairs per hop. ----
    c2q, c2k = cq // 2, ck // 2
    q_halves = [jnp.swapaxes(q[:, :c2q], 1, 2),
                jnp.swapaxes(q[:, c2q:], 1, 2)]
    o0 = jnp.zeros((2, b, h, c2q, d), jnp.float32)
    lse0 = jnp.full((2, b, h, c2q), -jnp.inf, jnp.float32)

    def hop(carry, t):
        k_cur, v_cur, o, lse = carry
        src = (i - t) % n
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        k_halves = [k_cur[:, :c2k], k_cur[:, c2k:]]
        v_halves = [v_cur[:, :c2k], v_cur[:, c2k:]]
        qz = [i, 2 * n - 1 - i]
        kz = [src, 2 * n - 1 - src]
        o_new, lse_new = [], []
        for a in range(2):
            o_a, lse_a = o[a], lse[a]
            for c in range(2):
                if causal:
                    off_l = qz[a] * c2q + off_g - kz[c] * c2k
                else:
                    off_l = c2k - 1 + c2q
                o_t, lse_t = attend(q_halves[a], k_halves[c], v_halves[c],
                                    off_l)
                o_a, lse_a = merge_attn_state(o_a, lse_a, o_t, lse_t)
            o_new.append(o_a)
            lse_new.append(lse_a)
        return (k_nxt, v_nxt, jnp.stack(o_new), jnp.stack(lse_new)), None

    (_, _, o, lse), _ = jax.lax.scan(hop, (k, v, o0, lse0), jnp.arange(n))
    o = jnp.concatenate([jnp.swapaxes(o[0], 1, 2),
                         jnp.swapaxes(o[1], 1, 2)], axis=1)
    return o.astype(q.dtype)


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
    zigzag: bool = False,
    block_q: int | None = None,
    block_k: int | None = None,
):
    """Ring attention: (b, s, h, d) inputs sequence-sharded over `seq_axis`
    (optionally batch/head-sharded too).  Supports sq != sk (bottom-right
    causal) and GQA.  With `zigzag=True` (causal load balancing) the
    caller passes inputs already reordered by `zigzag_permute` and gets
    outputs in the same order (`zigzag_unpermute` restores them)."""
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(q.shape[-1])
    n = mesh.shape[seq_axis]
    sq, sk = q.shape[1], k.shape[1]
    div = 2 * n if zigzag else n
    assert sq % div == 0 and sk % div == 0, (sq, sk, div)
    off_g = sk - sq
    spec = P(batch_axis, seq_axis, head_axis, None)
    f = partial(
        _ring_shard_fn, axis=seq_axis, n=n, scale=float(softmax_scale),
        causal=causal, block_q=block_q, block_k=block_k, off_g=off_g,
        zigzag=zigzag,
    )
    return jax.shard_map(
        f, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
