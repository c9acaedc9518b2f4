"""Training-step MFU decomposition (VERDICT r2 item 8: 57.0% -> >=60.6%).

Times the 839M recipe's pieces separately so the gap between the measured
step MFU and the ~180 TF/s harmonic-mean estimate (92% GEMM at ~190 + 8.5%
attention at ~115) can be attributed:

  fwd        : forward pass only (loss value)
  fwd+bwd    : value_and_grad, no optimizer
  step       : + adamw update (the headline number)
  attn       : causal fwd+bwd attention alone at training shapes
  gemm-chain : the per-layer GEMM skeleton alone (qkv/proj/fc1/fc2 fwd+bwd
               as plain matmuls) + LM head

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/diag_mfu.py [--batch N] [--remat-policy]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--remat-policy", action="store_true",
                    help="policy remat: save GEMM outputs, recompute "
                         "elementwise (fits larger batch)")
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import optax
    from transformers import GPT2Config

    from flash_attn_tpu.models.gpt import GPTLMHeadModel
    from flash_attn_tpu.training.loss import chunked_lm_loss
    from flash_attn_tpu.utils.benchmark import benchmark_chained

    n_embd, n_layer, n_head, vocab = 2048, 16, 16, 32768
    b, s = args.batch, args.seqlen
    cfg = GPT2Config(
        n_embd=n_embd, n_head=n_head, n_layer=n_layer, vocab_size=vocab,
        n_positions=s, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    cfg.rms_norm = True
    cfg.rotary_emb_fraction = 1.0
    cfg.activation_function = "swiglu"
    cfg.qkv_proj_bias = False
    cfg.out_proj_bias = False
    cfg.mlp_fc1_bias = False
    cfg.mlp_fc2_bias = False
    cfg.residual_in_fp32 = True
    cfg.tie_word_embeddings = True
    if args.remat_policy:
        cfg.remat_blocks = True
        cfg.remat_policy = "dots"

    model = GPTLMHeadModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, vocab, (b, s + 1)), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids[:, :s])
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    tokens = b * s
    d_head = n_embd // n_head
    dense_flops = 6 * n_params * tokens
    attn_flops = 3.5 * (4 * b * s * s * n_head * d_head // 2) * n_layer
    flops_step = dense_flops + attn_flops

    def loss_fn(params, batch):
        return chunked_lm_loss(model, params, batch, chunk_tokens=16384)

    only = set(args.only.split(",")) if args.only else None

    def report(name, dt, fl):
        print(f"{name:10s}: {dt*1e3:8.2f} ms  {fl/dt/1e12:6.1f} TF/s  "
              f"MFU {fl/dt/PEAK*100:5.1f}%", flush=True)

    # Each stage donates its carry for HBM headroom, but donation deletes
    # the donated buffers — so every stage gets a fresh device copy of
    # `params` and the caller's tree stays live for the later stages.
    copy_tree = jax.jit(lambda t: jax.tree.map(jnp.copy, t))

    if only is None or "fwd" in only:
        def fwd_step(p, batch):
            # tiny param perturbation keeps the carry dependency honest
            loss = loss_fn(p, batch)
            return jax.tree.map(lambda x: x + (loss * 0).astype(x.dtype), p)
        dt = benchmark_chained(fwd_step, copy_tree(params), ids,
                               iters=8, reps=3, donate=True)
        report("fwd", dt, (flops_step - attn_flops) / 3 +
               attn_flops / 3.5)

    if only is None or "bwd" in only:
        def fb_step(p, batch):
            _, grads = jax.value_and_grad(loss_fn)(p, batch)
            return jax.tree.map(
                lambda x, g: x - 0.0 * g.astype(x.dtype), p, grads)
        dt = benchmark_chained(fb_step, copy_tree(params), ids,
                               iters=8, reps=3, donate=True)
        report("fwd+bwd", dt, flops_step)

    if only is None or "step" in only:
        # Last params consumer: donates the ORIGINAL tree (params + f32
        # adamw moments don't fit twice in HBM, so no copy here).
        opt = optax.adamw(3e-4)
        opt_state = jax.jit(opt.init)(params)

        def train_step(carry, batch):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, batch)
            updates, o = opt.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o)
        dt = benchmark_chained(train_step, (params, opt_state), ids,
                               iters=8, reps=3, donate=True)
        report("step", dt, flops_step)
        del params, opt_state

    if only is not None and "opt" in only:
        # adamw update alone (synthetic grads derived from params keep the
        # chain dependency; no fwd/bwd).  HBM roofline: p f32 rw + mu rw +
        # nu rw = 24 B/param  ->  ~24.6 ms at 819 GB/s for 839M params.
        opt = optax.adamw(3e-4)
        opt_state = jax.jit(opt.init)(params)

        def opt_step(carry, batch):
            del batch
            p, o = carry
            g = jax.tree.map(lambda x: x * jnp.asarray(1e-9, x.dtype), p)
            updates, o = opt.update(g, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o)
        dt = benchmark_chained(opt_step, (params, opt_state), ids,
                               iters=8, reps=3, donate=True)
        gb = 24 * n_params / 1e9
        print(f"{'opt':10s}: {dt*1e3:8.2f} ms  {gb/dt:6.1f} GB/s "
              f"(roofline 819)", flush=True)
        del params, opt_state

    if only is None or "attn" in only:
        import flash_attn_tpu as fa
        q = jnp.asarray(
            rng.standard_normal((b, s, n_head, d_head)), jnp.bfloat16)
        kk = jnp.asarray(
            rng.standard_normal((b, s, n_head, d_head)), jnp.bfloat16)
        vv = jnp.asarray(
            rng.standard_normal((b, s, n_head, d_head)), jnp.bfloat16)

        def attn_fb(q, kk, vv):
            def f(q):
                return fa.flash_attn_func(q, kk, vv, causal=True).sum()
            g = jax.grad(f)(q)
            return q + g * 0.0
        one_layer = 3.5 * (4 * b * s * s * n_head * d_head // 2)
        dt = benchmark_chained(attn_fb, q, kk, vv, iters=16, reps=3)
        report("attn", dt, one_layer)

    if only is None or "gemm" in only:
        hidden = 5504  # swiglu inner, rounded
        wqkv = jnp.asarray(rng.standard_normal(
            (n_embd, 3 * n_embd)) * 0.02, jnp.bfloat16)
        wo = jnp.asarray(rng.standard_normal(
            (n_embd, n_embd)) * 0.02, jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal(
            (n_embd, 2 * hidden)) * 0.02, jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal(
            (hidden, n_embd)) * 0.02, jnp.bfloat16)
        wv = jnp.asarray(rng.standard_normal(
            (n_embd, vocab)) * 0.02, jnp.bfloat16)
        x0 = jnp.asarray(rng.standard_normal(
            (tokens, n_embd)), jnp.bfloat16)

        def layer(x):
            qkv = x @ wqkv
            x = x + qkv[:, :n_embd] @ wo
            h12 = x @ w1
            h = h12[:, :hidden] * jax.nn.silu(h12[:, hidden:])
            return x + h @ w2

        def net(x):
            for _ in range(n_layer):
                x = layer(x)
            return (x @ wv).astype(jnp.float32).sum()

        def gemm_fb(x):
            g = jax.grad(net)(x)
            return x + g * 0.0

        fl = 0
        per_layer = (3 * n_embd + n_embd + 2 * hidden) * n_embd + \
            hidden * n_embd
        fl = 6 * tokens * (per_layer * n_layer + n_embd * vocab)
        dt = benchmark_chained(gemm_fb, x0, iters=8, reps=3)
        report("gemm-chain", dt, fl)

    print(f"params={n_params/1e6:.0f}M batch={b}x{s} "
          f"attn_share={attn_flops/flops_step*100:.1f}%")


if __name__ == "__main__":
    main()
