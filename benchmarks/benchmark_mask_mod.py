"""Flex-attention benchmark: mask mods + block sparsity.

TPU counterpart of `benchmarks/cute/benchmark_mask_mod.py` and
`benchmark_block_sparsity.py`: measures the flex kernel with common mask
mods, dense vs block-sparse, and the built-in causal kernel as the ceiling.

Run: python benchmarks/benchmark_mask_mod.py [--quick]
"""

import argparse
import functools

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import flash_attn_tpu as fa
    from flash_attn_tpu.kernels.flex import create_block_mask, flex_attention
    from flash_attn_tpu.utils.benchmark import (
        attention_flops,
        benchmark_attention_fwd,
    )

    b, h, d = 1, 16, 128
    s = 4096 if args.quick else 8192
    bq = bk = 1024  # v5e flex default (1024^2/bh4 sweep optimum)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)

    def causal(b_, h_, qi, ki):
        return qi >= ki

    def sliding(b_, h_, qi, ki, w=1024):
        return (qi >= ki) & (qi - ki <= w)

    def prefix_lm(b_, h_, qi, ki, prefix=s // 4):
        return (qi >= ki) | (ki < prefix)

    fl_causal = attention_flops(b, s, s, h, d, True, "fwd")
    fl_dense = attention_flops(b, s, s, h, d, False, "fwd")
    cases = [
        ("builtin causal (ceiling)",
         functools.partial(fa.flash_attn_func, causal=True), fl_causal),
        ("flex causal dense", functools.partial(
            flex_attention, mask_mod=causal, block_q=bq, block_k=bk,
            head_invariant=True),
         fl_causal),
    ]
    sliding_bm = None
    for name, mm in [("causal", causal), ("sliding1k", sliding),
                     ("prefix_lm", prefix_lm)]:
        bm = create_block_mask(mm, b, h, s, s, block_q=bq, block_k=bk,
                               head_invariant=True)
        if name == "sliding1k":
            sliding_bm = bm
        fl = fl_dense * bm.sparsity
        cases.append((f"flex {name} sparse (density {bm.sparsity:.2f})",
                      functools.partial(flex_attention, mask_mod=mm,
                                        block_mask=bm), fl))
    # builtin local-window row: same mask (and computed block set) as the
    # sliding1k mod — the apples-to-apples per-computed-block comparison
    # (the builtin kernel's scheduled grid walks the same boundary tiles)
    cases.append((
        "builtin sliding1k (same flop basis)",
        functools.partial(fa.flash_attn_func, causal=True,
                          window_size=(1024, -1)),
        fl_dense * sliding_bm.sparsity))
    # document mask (reference benchmark's headline mod): ~8 random docs,
    # causal within each; block structure + in-kernel mod via aux streams
    ndoc = 8
    bounds = np.sort(rng.choice(np.arange(128, s - 128), ndoc - 1,
                                replace=False))
    doc_ids = np.zeros((b, s), np.int32)
    for bd in bounds:
        doc_ids[:, bd:] += 1
    doc_ids = jnp.asarray(doc_ids)

    def document(b_, h_, qi, ki, qa, ka):
        return (qa == ka) & (qi >= ki)

    bm_doc = create_block_mask(document, b, h, s, s, block_q=bq,
                               block_k=bk, head_invariant=True,
                               q_aux=doc_ids, kv_aux=doc_ids)
    cases.append((
        f"flex document sparse (density {bm_doc.sparsity:.2f})",
        functools.partial(flex_attention, mask_mod=document,
                          block_mask=bm_doc, q_aux=doc_ids,
                          kv_aux=doc_ids),
        fl_dense * bm_doc.sparsity))
    # builtin counterpart of the document mask: the scheduled packed-varlen
    # kernel over the same document boundaries (same flop basis, so the
    # TF/s are directly comparable to the flex document row)
    cu = jnp.asarray(np.concatenate([[0], bounds, [s]]), jnp.int32)

    def varlen_doc(q, k, v):
        out = fa.flash_attn_varlen_func(
            q[0], k[0], v[0], cu, cu, int(np.diff(np.asarray(cu)).max()),
            int(np.diff(np.asarray(cu)).max()), causal=True)
        return out[None]

    cases.append(("builtin varlen-doc (same flop basis)", varlen_doc,
                  fl_dense * bm_doc.sparsity))

    for name, fn, fl in cases:
        dt = benchmark_attention_fwd(fn, q, k, v, iters=8, reps=3,
                                     agg="min")
        print(f"{name:44s}: {fl/dt/1e12:7.1f} TF/s  ({dt*1e3:.2f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
