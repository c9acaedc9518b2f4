"""Round-4 causal-forward A/B sweep: schedule ordering (diag-first vs
diag-last finalize placement), full-tile diagonal bodies, and brs/bks
retune at the diagonal.  Target: close 150.4 -> >=160 TF/s at
hdim128/seq8k (VERDICT round-3 item 2).

Run: PYTHONPATH=. python benchmarks/sweep_causal_r4.py
"""

import os
import subprocess
import sys

CASES = [
    ("baseline (diag-last)", {"FLASH_ATTN_TPU_SCHED_DIAG_LAST": "1"}),
    ("diag-first", {}),
    ("diag-first + full-tile diag", {"FLASH_ATTN_TPU_SCHED_DIAG_FULL": "1"}),
    ("diag-last + full-tile diag", {"FLASH_ATTN_TPU_SCHED_DIAG_LAST": "1",
                                    "FLASH_ATTN_TPU_SCHED_DIAG_FULL": "1"}),
]

INNER = r"""
import jax, jax.numpy as jnp, numpy as np
import flash_attn_tpu as fa
from flash_attn_tpu.utils.benchmark import (attention_flops,
                                            benchmark_attention_fwd,
                                            benchmark_attention_fwd_bwd)
b, h, s, d = 1, 16, 8192, 128
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
dt = benchmark_attention_fwd(fa.flash_attn_func, q, k, v, causal=True,
                             iters=16, reps=5, agg="min")
print("fwd ", round(attention_flops(b, s, s, h, d, True, "fwd")/dt/1e12, 1))
import sys
if "--fwdbwd" in sys.argv:
    dt2 = benchmark_attention_fwd_bwd(fa.flash_attn_func, q, k, v,
                                      causal=True, iters=8, reps=3,
                                      agg="min")
    print("fwd+bwd ",
          round(attention_flops(b, s, s, h, d, True, "fwd_bwd")/dt2/1e12, 1))
"""


def main():
    fwdbwd = "--fwdbwd" in sys.argv
    for name, env in CASES:
        e = dict(os.environ)
        e.update(env)
        e["PYTHONPATH"] = "/root/repo:" + e.get("PYTHONPATH", "")
        args = [sys.executable, "-c", INNER]
        if fwdbwd:
            args.append("--fwdbwd")
        r = subprocess.run(args, env=e, capture_output=True, text=True,
                           timeout=560)
        out = " ".join(line.strip() for line in r.stdout.splitlines()
                       if line.strip() and not line.startswith("WARNING"))
        print(f"{name:32s}: {out or r.stderr.splitlines()[-1:]}", flush=True)


if __name__ == "__main__":
    main()
