"""Combinatorial KV-cache sweep: paged x rotary x leftpad x append x
batch_idx x splits interacting in one call (model: reference
`tests/test_flash_attn.py:1907` test_flash_attn_kvcache, whose parametrize
lattice covers 20+ interacting params)."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_with_kvcache
from flash_attn_tpu.kernels.flash_decode import _apply_rotary
from flash_attn_tpu.utils.testing import attention_ref, check_close

PAGE = 64


def _combo_id(c):
    names = ["paged", "rot", "lpad", "app", "bidx", "split"]
    return "-".join(n for n, v in zip(names, c) if v) or "plain"


def _all_combos():
    out = []
    for c in itertools.product([False, True], repeat=6):
        paged, rot, lpad, app, bidx, split = c
        if paged and bidx:
            continue  # block_table already selects pages per sequence
        if paged and lpad:
            continue  # reference disallows leftpad with paged KV
        out.append(c)
    return out


_SMOKE = [
    (False, False, False, False, False, False),
    (True, True, False, True, False, True),
    (False, True, True, True, True, False),
    (True, False, False, True, False, False),
    (False, True, False, False, False, True),
    (False, False, True, False, True, False),
]


def run_combo(paged, rot, lpad, app, bidx, split, seed=0):
    b, h, hk, d, sq = 2, 4, 2, 64, 3 if app else 1
    npages = 3
    smax = PAGE * npages
    bc = 4 if bidx else b
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    kc_lin = jnp.asarray(rng.standard_normal((bc, smax, hk, d)), jnp.bfloat16)
    vc_lin = jnp.asarray(rng.standard_normal((bc, smax, hk, d)), jnp.bfloat16)
    lens = jnp.asarray(rng.integers(PAGE, smax - sq - 1, (b,)), jnp.int32)
    leftpad = (jnp.asarray(rng.integers(0, PAGE // 2, (b,)), jnp.int32)
               if lpad else None)
    cbi = (jnp.asarray(rng.permutation(bc)[:b], jnp.int32) if bidx else None)
    knew = vnew = None
    if app:
        knew = jnp.asarray(rng.standard_normal((b, sq, hk, d)), jnp.bfloat16)
        vnew = jnp.asarray(rng.standard_normal((b, sq, hk, d)), jnp.bfloat16)
    cos = sin = None
    if rot:
        ang = np.outer(np.arange(smax), 1.0 / (10000 ** (np.arange(0, d, 2) / d)))
        cos = jnp.asarray(np.cos(ang), jnp.float32)
        sin = jnp.asarray(np.sin(ang), jnp.float32)

    kwargs = {}
    if paged:
        total_pages = b * npages + 2
        perm = rng.permutation(total_pages)[: b * npages]
        block_table = jnp.asarray(perm.reshape(b, npages), jnp.int32)
        k_pages = np.zeros((total_pages, PAGE, hk, d), np.float32)
        v_pages = np.zeros((total_pages, PAGE, hk, d), np.float32)
        for i in range(b):
            for j in range(npages):
                k_pages[perm[i * npages + j]] = np.asarray(
                    kc_lin[i, j * PAGE:(j + 1) * PAGE], np.float32)
                v_pages[perm[i * npages + j]] = np.asarray(
                    vc_lin[i, j * PAGE:(j + 1) * PAGE], np.float32)
        k_in = jnp.asarray(k_pages, jnp.bfloat16)
        v_in = jnp.asarray(v_pages, jnp.bfloat16)
        kwargs["block_table"] = block_table
    else:
        k_in, v_in = kc_lin, vc_lin
        if bidx:
            kwargs["cache_batch_idx"] = cbi

    out = flash_attn_with_kvcache(
        q, k_in, v_in, knew, vnew, rotary_cos=cos, rotary_sin=sin,
        cache_seqlens=lens, cache_leftpad=leftpad, causal=True,
        num_splits=3 if split else 1, **kwargs,
    )

    # ---- oracle: compose rotary + append + gather in numpy, then
    # attention_ref with the key-validity mask ----
    sel = np.asarray(cbi) if bidx else np.arange(b)
    kfull = np.asarray(kc_lin, np.float32)[sel].copy()
    vfull = np.asarray(vc_lin, np.float32)[sel].copy()
    lens_np = np.asarray(lens)
    lpad_np = np.asarray(leftpad) if lpad else np.zeros(b, np.int64)
    q_eff = q
    if rot:
        pos = lens_np[:, None] - lpad_np[:, None] + np.arange(sq)[None, :]
        q_eff = _apply_rotary(q, cos, sin, jnp.asarray(pos), False)
        if app:
            knew = _apply_rotary(knew, cos, sin, jnp.asarray(pos), False)
    if app:
        for i in range(b):
            kfull[i, lens_np[i]:lens_np[i] + sq] = np.asarray(knew[i], np.float32)
            vfull[i, lens_np[i]:lens_np[i] + sq] = np.asarray(vnew[i], np.float32)
        lens_np = lens_np + sq
    ar = np.arange(smax)[None, :]
    mask = jnp.asarray((ar >= lpad_np[:, None]) & (ar < lens_np[:, None]))
    kwargs_ref = dict(causal=True)
    if lpad:
        kwargs_ref["key_leftpad"] = jnp.asarray(lpad_np, jnp.int32)
    kf = jnp.asarray(kfull, jnp.bfloat16)
    vf = jnp.asarray(vfull, jnp.bfloat16)
    out_ref, _ = attention_ref(q_eff, kf, vf, None, mask, **kwargs_ref)
    out_pt, _ = attention_ref(q_eff, kf, vf, None, mask, upcast=False,
                              reorder_ops=True, **kwargs_ref)
    check_close(out, out_ref, out_pt)


@pytest.mark.parametrize("combo", _SMOKE, ids=_combo_id)
def test_kvcache_combo_smoke(combo):
    run_combo(*combo)


@pytest.mark.slow
@pytest.mark.parametrize(
    "combo", [c for c in _all_combos() if c not in _SMOKE], ids=_combo_id
)
def test_kvcache_combo_full(combo):
    run_combo(*combo, seed=sum(1 << i for i, v in enumerate(combo)))
