"""Reference-style parametrized sweeps (compressed).

The reference's kernel tests sweep hundreds of (seqlen_q, seqlen_k, hdim,
dtype, causal, local, ...) combinations (`tests/test_flash_attn.py`
parametrize lists, e.g. `test_flash_attn_output:943`).  This file carries
the same seqlen-pair list at a size that keeps interpret-mode runtime
bounded; deeper per-feature coverage lives in test_flash_attn.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_func
from flash_attn_tpu.utils.testing import attention_ref, check_close

# the reference's seqlen-pair sweep (tests/test_flash_attn.py:943 list)
SEQLEN_PAIRS = [
    (113, 203),
    (128, 217),
    (113, 211),
    (108, 256),
    (256, 512),
    (512, 256),
    (1024, 1024),
    (1023, 1024),
    (1024, 1023),
]


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sq,sk", SEQLEN_PAIRS)
def test_output_seqlen_sweep(sq, sk, causal):
    b, h, d = 1, 2, 64
    rng = np.random.default_rng(sq * 31 + sk)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.bfloat16)
    out = flash_attn_func(q, k, v, causal=causal)
    out_ref, _ = attention_ref(q, k, v, causal=causal)
    out_pt, _ = attention_ref(q, k, v, causal=causal, upcast=False,
                              reorder_ops=True)
    check_close(out, out_ref, out_pt)


@pytest.mark.parametrize("window", [(16, 0), (37, 13), (0, 37)])
@pytest.mark.parametrize("sq,sk", [(113, 203), (256, 128)])
def test_local_window_sweep(sq, sk, window):
    b, h, d = 1, 2, 64
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.bfloat16)
    out = flash_attn_func(q, k, v, window_size=window)
    out_ref, _ = attention_ref(q, k, v, window_size=window)
    out_pt, _ = attention_ref(q, k, v, window_size=window, upcast=False,
                              reorder_ops=True)
    check_close(out, out_ref, out_pt)


@pytest.mark.parametrize("d", [32, 64, 96, 128, 192, 256])
def test_headdim_sweep(d):
    """hdim {32..256} — the reference's supported-envelope sweep
    (`flash_api.cpp:325` hdim <= 256)."""
    b, h, sq, sk = 1, 2, 192, 224
    rng = np.random.default_rng(d)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.bfloat16)
    out = flash_attn_func(q, k, v, causal=True)
    out_ref, _ = attention_ref(q, k, v, causal=True)
    out_pt, _ = attention_ref(q, k, v, causal=True, upcast=False,
                              reorder_ops=True)
    check_close(out, out_ref, out_pt)
