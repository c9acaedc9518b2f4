"""Measure the dense-vs-scheduled router crossover for varlen batches
(VERDICT r2 item 7: replace the "exactly uniform" threshold with a
measured padding-ratio crossover).

For a family of batches with increasing raggedness (padding ratio =
b * max_seqlen / total_tokens), times BOTH paths on identical inputs:

  sched : the packed scheduled-grid kernel (`kernels/varlen_sched.py`)
  padded: scatter to (b, max, h, d) + the dense pipelined kernel with
          seqused (what `flash_attn_varlen_func` does off-route)

and prints us/call for each, so the router threshold in
`interface.flash_attn_varlen_func` can be set at the measured crossover.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/sweep_varlen_router.py
"""

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from flash_attn_tpu import interface as I
from flash_attn_tpu.kernels.varlen_sched import flash_attn_varlen_sched_func
from flash_attn_tpu.utils.benchmark import benchmark_chained

# name -> sequence lengths (8 seqs, max 4096 unless noted)
CASES = {
    "uniform r1.00":  [4096] * 8,
    "mild    r1.14":  [4096, 4096, 3584, 3584, 3584, 3584, 3072, 3072],
    "medium  r1.50":  [4096, 4096, 3072, 3072, 2560, 2048, 2048, 1024],
    "ragged  r2.00":  [4096, 3072, 2048, 2048, 1536, 1536, 1024, 1024],
    "heavy   r3.05":  [4096, 2048, 1024, 1024, 768, 768, 512, 512],
    "extreme r5.27":  [4096, 512, 512, 256, 256, 256, 256, 74 * 2],
}


def main():
    h, d = 16, 128
    rng = np.random.default_rng(0)
    for name, lens in CASES.items():
        lens = np.asarray(lens, np.int32)
        b = len(lens)
        cu_np = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        cu = jnp.asarray(cu_np)
        t = int(cu_np[-1])
        mx = int(lens.max())
        ratio = b * mx / t
        q = jnp.asarray(rng.standard_normal((t, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((t, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((t, h, d)), jnp.bfloat16)
        scale = d ** -0.5

        def sched(qc, k, v):
            return flash_attn_varlen_sched_func(
                qc, k, v, cu, cu, mx, mx,
                softmax_scale=scale, causal=True,
            ).astype(qc.dtype)

        lens_j = cu[1:] - cu[:-1]

        def padded(qc, k, v):
            qp = I._varlen_to_padded(qc, cu, mx)
            kp = I._varlen_to_padded(k, cu, mx)
            vp = I._varlen_to_padded(v, cu, mx)
            o, _ = I._attn_bhsd(
                jnp.swapaxes(qp, 1, 2), jnp.swapaxes(kp, 1, 2),
                jnp.swapaxes(vp, 1, 2), softmax_scale=scale, causal=True,
                window_size=(-1, -1), softcap=0.0, alibi_slopes=None,
                seqused_q=lens_j, seqused_k=lens_j, return_lse=False,
                dropout_p=0.0, dropout_seed=None,
            )
            o = jnp.swapaxes(o, 1, 2)
            return I._padded_to_varlen(o, cu, t)

        row = f"{name} (b{b} mx{mx} tot{t}, pad x{ratio:.2f})"
        for tag, fn in (("sched ", sched), ("padded", padded)):
            try:
                dt = benchmark_chained(fn, q, k, v, iters=16, reps=3)
                print(f"{row:44s} {tag}: {dt*1e6:8.0f} us", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{row:44s} {tag}: FAIL {type(e).__name__} "
                      f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
