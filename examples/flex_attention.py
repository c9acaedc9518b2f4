"""Example: programmable attention — mods, block sparsity, packed varlen.

Run: python examples/flex_attention.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import flash_attn_tpu as fa

    rng = np.random.default_rng(0)
    B, S, H, D = 2, 512, 4, 64
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)

    # 1. sliding-window causal via mask_mod + block sparsity
    def sliding(b, h, qi, ki, w=128):
        return (qi >= ki) & (qi - ki <= w)

    bm = fa.create_block_mask(sliding, B, H, S, S, block_q=128, block_k=128)
    out = fa.flex_attention(q, k, v, mask_mod=sliding, block_mask=bm)
    print("sliding-window out:", out.shape, f"block density {bm.sparsity:.2f}")

    # 2. relative-position score mod (trainable-free ALiBi-like)
    def score_mod(s, b, h, qi, ki):
        return s - 0.05 * jnp.abs(qi - ki).astype(jnp.float32)

    out = fa.flex_attention(q, k, v, score_mod=score_mod, block_q=128,
                            block_k=128)
    print("score-mod out    :", out.shape)

    # 3. document masking through aux tensors
    doc_ids = jnp.asarray(
        np.cumsum(rng.random((B, S)) < 0.01, axis=1), jnp.int32)

    def doc_mask(b, h, qi, ki, qa, ka):
        return qa == ka

    bm = fa.create_block_mask(doc_mask, B, H, S, S, block_q=128,
                              block_k=128, q_aux=doc_ids, kv_aux=doc_ids)
    out = fa.flex_attention(q, k, v, mask_mod=doc_mask, block_mask=bm,
                            q_aux=doc_ids, kv_aux=doc_ids)
    print("document-mask out:", out.shape, f"block density {bm.sparsity:.2f}")

    # 4. packed varlen: three sequences in one token stream
    lens = np.array([300, 100, 500], np.int32)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    t = int(cu[-1])
    qp = jnp.asarray(rng.standard_normal((t, H, D)), jnp.bfloat16)
    outp = fa.flash_attn_varlen_packed_func(qp, qp, qp, cu, cu, causal=True)
    print("packed varlen out:", outp.shape)


if __name__ == "__main__":
    main()
