import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax, time
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
import flash_attn_tpu as fa
from flash_attn_tpu.utils.benchmark import attention_flops, benchmark_attention_fwd

b,h,s,d = 1,16,8192,128
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((b,s,h,d)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((b,s,h,d)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((b,s,h,d)), jnp.bfloat16)
fl = attention_flops(b,s,s,h,d,True,"fwd")
for trial in range(5):
    dt = benchmark_attention_fwd(fa.flash_attn_func, q,k,v, causal=True,
                                 iters=16, reps=15, agg="min")
    print(f"trial {trial}: {fl/dt/1e12:.1f} TF/s", flush=True)
