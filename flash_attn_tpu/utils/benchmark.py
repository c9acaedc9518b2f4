"""Micro-benchmark harness (counterpart of `flash_attn/utils/benchmark.py`).

Timing on this TPU environment has two traps:

1. `block_until_ready()` returns before real device execution completes on
   tunneled/async backends — only a host readback of a value forces
   completion.  All timing here reads back a scalar reduction.
2. Host<->device round-trip jitter (tens of ms) swamps single-kernel times,
   so the op under test is *chained on device* N times inside one program
   (carry -> carry), and time is the difference between a 2N-iteration and an
   N-iteration program, median over repeats.  Pallas kernels are opaque to
   XLA so chaining re-executes them; pure-XLA elementwise chains would be
   fused into one pass and must not be timed this way.

FLOPs accounting matches the reference
(`benchmarks/benchmark_flash_attention.py:27-33`):
fwd = 4*b*s^2*h*d (halved if causal), bwd = 2.5x fwd, fwd+bwd = 3.5x fwd.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _scalarize(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)


def benchmark_chained(step_fn, carry, *consts, iters: int = 32, reps: int = 3,
                      donate: bool = False, agg: str = "median"):
    """Per-iteration seconds of `carry -> step_fn(carry, *consts)`.

    Large loop-invariant operands (weights, KV caches) must be passed via
    `consts`, NOT closed over — closure arrays are inlined into the HLO as
    literals and can overflow the remote-compile request.

    `donate=True` donates the carry buffers between timing calls (halves
    the resident state — needed when the carry is a full train state) but
    INVALIDATES the caller's carry arrays.

    `agg`: "median" takes the median of per-rep (t2N - tN) differences;
    "min" takes min(t2N) - min(tN) across reps.  Tunnel/host jitter here is
    strictly additive, so the min of each leg is its cleanest estimate and
    the difference of mins rejects outliers that a median of noisy
    differences lets through (the reference's best-of-timeit pattern,
    `flash_attn/utils/benchmark.py:8`)."""
    import functools

    def chain(n):
        def run(c, *cs):
            c = jax.lax.fori_loop(
                0, n, lambda i, c: step_fn(c, *cs), c
            )
            return (c, _scalarize(c)) if donate else _scalarize(c)

        if donate:
            return jax.jit(run, donate_argnums=0)
        return jax.jit(run)

    g1, g2 = chain(iters), chain(2 * iters)
    if donate:
        c = carry
        c, s = g1(c, *consts)
        float(s)
        c, s = g2(c, *consts)
        float(s)
        t1s, t2s = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            c, s = g1(c, *consts)
            float(s)
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            c, s = g2(c, *consts)
            float(s)
            t2s.append(time.perf_counter() - t0)
        return _aggregate(t1s, t2s, iters, agg)
    float(g1(carry, *consts))
    float(g2(carry, *consts))
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g1(carry, *consts))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(g2(carry, *consts))
        t2s.append(time.perf_counter() - t0)
    return _aggregate(t1s, t2s, iters, agg)


def _aggregate(t1s, t2s, iters, agg):
    if agg == "min":
        return float((min(t2s) - min(t1s)) / iters)
    return float(np.median([(b - a) / iters for a, b in zip(t1s, t2s)]))


def attention_flops(b, sq, sk, h, d, causal=False, mode="fwd"):
    """Reference FLOPs model (`benchmarks/benchmark_flash_attention.py:27`)."""
    f = 4 * b * sq * sk * h * d // (2 if causal else 1)
    return {"fwd": f, "bwd": int(2.5 * f), "fwd_bwd": int(3.5 * f)}[mode]


def benchmark_attention_fwd(
    flash_fn, q, k, v, iters: int = 32, reps: int = 3, agg: str = "median",
    **kw
):
    """Time `flash_fn(q, k, v, **kw)` chained through q (same shape as out)."""

    def step(q, k, v):
        o = flash_fn(q, k, v, **kw)
        return o.astype(q.dtype)

    return benchmark_chained(step, q, k, v, iters=iters, reps=reps, agg=agg)


def benchmark_attention_fwd_bwd(flash_fn, q, k, v, iters=16, reps=3,
                                agg: str = "median", **kw):
    """Time fwd+bwd chained through (q, k, v) gradients."""

    def loss(q, k, v):
        return jnp.sum(flash_fn(q, k, v, **kw).astype(jnp.float32))

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def step(carry):
        q, k, v = carry
        dq, dk, dv = grad(q, k, v)
        return (dq.astype(q.dtype) * 1e-3 + q,
                dk.astype(k.dtype) * 1e-3 + k,
                dv.astype(v.dtype) * 1e-3 + v)

    return benchmark_chained(step, (q, k, v), iters=iters, reps=reps,
                             agg=agg)
