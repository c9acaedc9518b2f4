"""Scheduled fused backward (causal/local tile tables) vs the rectangular
predicated grid — must be bit-exact (same tile math, different schedule).

Reference analogue: the bwd LPT scheduler + masked/unmasked mainloop split
(`hopper/tile_scheduler.hpp:368`, `flash_bwd_kernel.h` n_masking_steps).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.kernels.flash_bwd import flash_attn_bwd_bhsd
from flash_attn_tpu.kernels.flash_fwd import flash_attn_fwd_bhsd


def _run_both(sq, sk, h, hk, causal, window, chunk=0, dropout_p=0.0):
    rng = np.random.default_rng(0)
    b, d = 1, 64
    q = jnp.asarray(rng.standard_normal((b, h, sq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, hk, sk, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, hk, sk, d)), jnp.bfloat16)
    do = jnp.asarray(rng.standard_normal((b, h, sq, d)), jnp.bfloat16)
    su_q = jnp.full((b,), sq, jnp.int32)
    su_k = jnp.full((b,), sk, jnp.int32)
    seed = jnp.asarray(7, jnp.int32)
    o, lse = flash_attn_fwd_bhsd(
        q, k, v, su_q, su_k, softmax_scale=d ** -0.5, causal=causal,
        window_size=window, attention_chunk=chunk, dropout_p=dropout_p,
        dropout_seed=seed, full_lengths=True,
    )
    kw = dict(softmax_scale=d ** -0.5, causal=causal, window_size=window,
              attention_chunk=chunk, dropout_p=dropout_p, dropout_seed=seed,
              block_q=128, block_k=128)
    sched = flash_attn_bwd_bhsd(
        do, q, k, v, o, lse, su_q, su_k, full_lengths=True, **kw)
    os.environ["FLASH_ATTN_TPU_NO_SCHED_BWD"] = "1"
    try:
        rect = flash_attn_bwd_bhsd(
            do, q, k, v, o, lse, su_q, su_k, full_lengths=True, **kw)
    finally:
        del os.environ["FLASH_ATTN_TPU_NO_SCHED_BWD"]
    for a, b_ in zip(sched, rect):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


@pytest.mark.parametrize(
    "sq,sk,h,hk,causal,window",
    [
        (256, 256, 2, 2, True, (-1, -1)),
        (512, 512, 4, 2, True, (-1, -1)),      # GQA group reduce
        (384, 384, 2, 2, True, (-1, -1)),      # non-block-multiple lengths
        (512, 256, 2, 2, True, (-1, -1)),      # sk < sq: unvisited q blocks
        (256, 512, 2, 2, True, (-1, -1)),      # sk > sq: empty kv blocks
        (512, 512, 2, 2, False, (64, 32)),     # sliding window
        (512, 512, 2, 2, True, (128, -1)),     # causal + left window
    ],
)
def test_bwd_sched_matches_rectangular(sq, sk, h, hk, causal, window):
    _run_both(sq, sk, h, hk, causal, window)


def test_bwd_sched_attention_chunk():
    _run_both(512, 512, 2, 2, True, (-1, -1), chunk=128)


def test_bwd_sched_dropout():
    _run_both(256, 256, 2, 2, True, (-1, -1), dropout_p=0.1)
