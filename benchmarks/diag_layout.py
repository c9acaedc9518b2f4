"""Isolate the bshd-wrapper cost vs the bhsd kernel core (bench gap diag).

  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/diag_layout.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import flash_attn_tpu as fa
from flash_attn_tpu.kernels.flash_fwd import flash_attn_fwd_bhsd
from flash_attn_tpu.utils.benchmark import attention_flops, benchmark_chained

b, h, s, d = 1, 16, 8192, 128
rng = np.random.default_rng(0)
flops = attention_flops(b, s, s, h, d, False, "fwd")

# bshd wrapper (what bench.py times)
q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)


def step_bshd(q, k, v):
    return fa.flash_attn_func(q, k, v, causal=False).astype(q.dtype)


# bhsd core
qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
su = jnp.full((b,), s, jnp.int32)


def step_bhsd(q, k, v):
    o, _ = flash_attn_fwd_bhsd(
        q, k, v, su, su, softmax_scale=d ** -0.5, causal=False,
        full_lengths=True, emit_lse=False)
    return o.astype(q.dtype)


for name, fn, args in (("bshd-wrapper", step_bshd, (q, k, v)),
                       ("bhsd-core   ", step_bhsd, (qt, kt, vt))):
    for rep in range(3):
        dt = benchmark_chained(fn, *args, iters=16, reps=7, agg="min")
        print(f"{name}: {flops / dt / 1e12:.1f} TF/s ({dt*1e3:.3f} ms)",
              flush=True)
