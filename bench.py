"""Headline benchmark suite: every flagship path, one JSON line.

Prints ONE JSON line.  The headline keys ({"metric", "value", "unit",
"vs_baseline"}) carry the dense BF16 forward (hdim128 seq8k) as before;
the "extras" dict regression-gates the other headline paths: causal fwd,
causal fwd+bwd, decode tok/s (bf16 + int8 cache), and packed-varlen
ragged fwd+bwd throughput.

Baseline: the reference's flagship forward-kernel utilisation — FA3 reaches
~740 TFLOPs/s FP16 on H100 = 75% of the 989 TFLOPs/s peak (README.md:31-35;
BASELINE.md).  `vs_baseline` is our fraction-of-chip-peak divided by that
0.75, i.e. 1.0 means we match the reference's utilisation on our silicon.
"""

import json
import sys
import time

import jax

_T0 = time.time()


def _stage(name):
    # stderr breadcrumb so slow runs can be profiled; stdout stays one line
    print(f"[bench {time.time() - _T0:7.1f}s] {name}", file=sys.stderr, flush=True)

try:  # persistent compile cache: the driver re-runs this file cold
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np


def main():
    on_tpu = jax.default_backend() == "tpu"
    import flash_attn_tpu as fa
    from flash_attn_tpu.utils.benchmark import (
        attention_flops,
        benchmark_attention_fwd,
        benchmark_attention_fwd_bwd,
        benchmark_chained,
    )

    if on_tpu:
        b, h, s, d = 1, 16, 8192, 128
        iters = 16  # run-to-run tunnel variance is ~5%; more samples
        peak_tflops = 197.0  # TPU v5e bf16
    else:  # CI smoke: interpret mode, tiny shape
        b, h, s, d = 1, 2, 256, 64
        iters = 1
        peak_tflops = 1.0

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)

    reps = 7 if on_tpu else 1
    agg = "min" if on_tpu else "median"

    _stage("dense fwd")
    dt = benchmark_attention_fwd(
        fa.flash_attn_func, q, k, v, causal=False, iters=iters,
        reps=reps, agg=agg,
    )
    tflops = attention_flops(b, s, s, h, d, False, "fwd") / dt / 1e12
    frac = tflops / peak_tflops

    extras = {}

    # --- causal forward (the training shape) ---
    _stage("causal fwd")
    dt_c = benchmark_attention_fwd(
        fa.flash_attn_func, q, k, v, causal=True, iters=iters,
        reps=reps, agg=agg,
    )
    extras["causal_fwd_TFLOPs"] = round(
        attention_flops(b, s, s, h, d, True, "fwd") / dt_c / 1e12, 1)

    # --- causal fwd+bwd (the training step cost) ---
    _stage("causal fwd+bwd")
    dt_fb = benchmark_attention_fwd_bwd(
        fa.flash_attn_func, q, k, v, causal=True,
        iters=max(iters // 2, 1), reps=max(reps - 2, 1), agg=agg,
    )
    extras["causal_fwd_bwd_TFLOPs"] = round(
        attention_flops(b, s, s, h, d, True, "fwd_bwd") / dt_fb / 1e12, 1)

    # --- paged GQA decode, bf16 and int8 caches (Llama-3-8B shapes) ---
    hb, hkb, db, page = (32, 8, 128, 256) if on_tpu else (4, 2, 64, 64)
    bd = 8 if on_tpu else 2
    cache_len = 16384 if on_tpu else 256
    npp = cache_len // page
    kc = jnp.asarray(
        rng.standard_normal((bd * npp, page, hkb, db)), jnp.bfloat16)
    vc = jnp.asarray(
        rng.standard_normal((bd * npp, page, hkb, db)), jnp.bfloat16)
    table = jnp.arange(bd * npp, dtype=jnp.int32).reshape(bd, npp)
    qd = jnp.asarray(rng.standard_normal((bd, 1, hb, db)), jnp.bfloat16)
    lens = jnp.full((bd,), cache_len, jnp.int32)

    def decode_step(q, kc, vc, **kw):
        o = fa.flash_attn_with_kvcache(
            q, kc, vc, cache_seqlens=lens, block_table=table, causal=True,
            **kw)
        return q + o.astype(q.dtype) * 1e-3

    _stage("decode bf16")
    dt_dec = benchmark_chained(
        decode_step, qd, kc, vc, iters=32 if on_tpu else 2,
        reps=max(reps - 2, 1), agg=agg)
    extras["decode_bf16_tok_s"] = round(bd / dt_dec, 0)

    def quant(x):
        # per-(sequence, kv-head) scales: pages i*npp..(i+1)*npp belong to
        # sequence i (block_table is the identity layout above)
        xs = x.reshape(bd, npp * page, hkb, db).astype(jnp.float32)
        amax = jnp.max(jnp.abs(xs), axis=(1, 3))            # (bd, hkb)
        scale = jnp.maximum(amax, 1e-9) / 127.0
        xq = jnp.clip(jnp.round(xs / scale[:, None, :, None]), -127, 127)
        return xq.astype(jnp.int8).reshape(x.shape), scale

    kq, kdsc = quant(kc)
    vq, vdsc = quant(vc)
    _stage("decode int8")
    dt_dec8 = benchmark_chained(
        lambda q, kq, vq: decode_step(q, kq, vq, k_descale=kdsc,
                                      v_descale=vdsc),
        qd, kq, vq, iters=32 if on_tpu else 2, reps=max(reps - 2, 1),
        agg=agg)
    extras["decode_int8_tok_s"] = round(bd / dt_dec8, 0)

    # --- fused KV pages (one DMA per page covering K and V; the serving
    # configuration for small pages — see DESIGN.md decode notes) ---
    kv_f = fa.fuse_kv_cache(kc, vc)
    _stage("decode fused bf16")
    dt_fus = benchmark_chained(
        lambda q, kvf: decode_step(q, kvf, None),
        qd, kv_f, iters=32 if on_tpu else 2, reps=max(reps - 2, 1), agg=agg)
    extras["decode_fused_bf16_tok_s"] = round(bd / dt_fus, 0)
    kv_f8 = fa.fuse_kv_cache(kq, vq)
    _stage("decode fused int8")
    dt_fus8 = benchmark_chained(
        lambda q, kvf: decode_step(q, kvf, None, k_descale=kdsc,
                                   v_descale=vdsc),
        qd, kv_f8, iters=32 if on_tpu else 2, reps=max(reps - 2, 1), agg=agg)
    extras["decode_fused_int8_tok_s"] = round(bd / dt_fus8, 0)

    # --- packed varlen ragged fwd+bwd (first-class varlen backward) ---
    lens_r = ([8192] + [256] * 31) if on_tpu else [128, 64]
    cu = jnp.asarray(np.cumsum([0] + lens_r), jnp.int32)
    total = int(cu[-1])
    hv = 16 if on_tpu else 2
    qv_ = jnp.asarray(rng.standard_normal((total, hv, d)), jnp.bfloat16)
    kv_ = jnp.asarray(rng.standard_normal((total, hv, d)), jnp.bfloat16)
    vv_ = jnp.asarray(rng.standard_normal((total, hv, d)), jnp.bfloat16)
    mx = max(lens_r)

    def vl_loss(q, k, v):
        o = fa.flash_attn_varlen_func(q, k, v, cu, cu, mx, mx, causal=True)
        return jnp.sum(o.astype(jnp.float32))

    vgrad = jax.grad(vl_loss, argnums=(0, 1, 2))

    def vl_step(carry):
        q, k, v = carry
        dq, dk, dv = vgrad(q, k, v)
        return (q + dq.astype(q.dtype) * 1e-3,
                k + dk.astype(k.dtype) * 1e-3,
                v + dv.astype(v.dtype) * 1e-3)

    _stage("varlen ragged fwd+bwd")
    dt_vl = benchmark_chained(
        vl_step, (qv_, kv_, vv_), iters=max(iters // 4, 1),
        reps=max(reps - 4, 1), agg=agg)
    vl_flops = sum(
        attention_flops(1, L, L, hv, d, True, "fwd_bwd") for L in lens_r)
    extras["varlen_ragged_fwd_bwd_TFLOPs"] = round(dt_vl and
                                                   vl_flops / dt_vl / 1e12, 1)

    _stage("done")
    print(json.dumps({
        "metric": "flash_attn_fwd_bf16_hdim128_seq8k_TFLOPs",
        "value": round(tflops, 1),
        "unit": "TFLOP/s",
        "vs_baseline": round(frac / 0.75, 3),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
