"""Correctness spot-check of scheduled-causal tile configs vs the fp32
oracle on real TPU.  Configs given as bq,bk,bks,brs,bh CLI args."""

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from flash_attn_tpu.kernels.flash_fwd import flash_attn_fwd_bhsd
from flash_attn_tpu.utils.testing import attention_ref


def main():
    b, h, s, d = 2, 4, 2048, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    su = jnp.full((b,), s, jnp.int32)
    qs = jnp.swapaxes(q, 1, 2)
    ks = jnp.swapaxes(k, 1, 2)
    vs = jnp.swapaxes(v, 1, 2)
    o_ref, _ = attention_ref(qs, ks, vs, causal=True, upcast=True)
    o_pt, _ = attention_ref(qs, ks, vs, causal=True, upcast=False,
                            reorder_ops=True)
    gate = 2 * jnp.abs(o_pt - o_ref).max() + 1e-5

    cfgs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]] or [
        (1024, 1024, 256, 256, 4),
        (512, 2048, 256, 256, 4),
        (512, 1024, 256, 256, 4),
        (512, 512, 256, 256, 4),
        (1024, 1024, 512, 256, 4),
    ]
    for (bq, bk, bks, brs, bh) in cfgs:
        o, lse = flash_attn_fwd_bhsd(
            q, k, v, su, su, softmax_scale=d ** -0.5, causal=True,
            block_q=bq, block_k=bk, block_k_sub=bks,
            block_q_sub=brs or None, block_h=bh, full_lengths=True)
        err = jnp.abs(jnp.swapaxes(o, 1, 2) - o_ref).max()
        ok = "OK " if err <= gate else "FAIL"
        print(f"{ok} bq{bq} bk{bk} bks{bks} brs{brs} bh{bh}: "
              f"err {float(err):.5f} gate {float(gate):.5f}", flush=True)


if __name__ == "__main__":
    main()
