"""End-to-end GPT training-step throughput (tokens/s, TFLOP/s, MFU).

TPU counterpart of the reference's training headline numbers
(`README.md:496-501` up to 225 TFLOPs/s/A100 = 72% MFU;
`training/README.md:5-8` 189 TFLOPs/s = 60.6% MFU): one fwd+bwd+adamw step
of a LLaMA-style GPT (RMSNorm, rotary, SwiGLU) in bf16 on a single chip.

FLOPs model: 6 * params * tokens  +  attention 3.5 * (4*b*s^2*h*d / 2)
(causal fwd+bwd, `benchmarks/benchmark_flash_attention.py:27-33`).

Run: python benchmarks/benchmark_training.py [--quick]
"""

import argparse

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--large", action="store_true",
                    help="~870M params (n_embd 2048), batch 4")
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--remat", action="store_true",
                    help="per-block activation checkpointing")
    ap.add_argument("--remat-policy", type=str, default="none",
                    choices=["none", "dots", "dots_no_batch"],
                    help="what remat may keep: dots = save matmul outputs, "
                         "recompute only elementwise/attention")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation micro-batches per adamw "
                         "update (reference recipes' accumulate_grad_batches)")
    ap.add_argument("--accum-dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--accum-unroll", action="store_true",
                    help="unroll the micro-batch loop instead of lax.scan")
    ap.add_argument("--param-dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="bfloat16 = Lightning precision=bf16-true role: "
                         "params stored bf16 (no fp32 master copy, no "
                         "per-use cast temps); float32 = bf16-mixed")
    args = ap.parse_args()

    import optax
    from transformers import GPT2Config

    from flash_attn_tpu.models.gpt import GPTLMHeadModel
    from flash_attn_tpu.training.loss import chunked_lm_loss
    from flash_attn_tpu.utils.benchmark import benchmark_chained

    if args.quick:
        n_embd, n_layer, n_head, vocab = 512, 4, 8, 32000
        b, s = 2, 1024
    elif args.large:
        n_embd, n_layer, n_head, vocab = 2048, 16, 16, 32768
        b, s = min(args.batch, 4), args.seqlen
    else:
        # ~350M params: the largest that fits one v5e core with optimizer
        # state at seq 2048 comfortably
        n_embd, n_layer, n_head, vocab = 1024, 24, 16, 50304
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
    cfg.tie_word_embeddings = bool(args.large)
    cfg.remat_blocks = args.remat or args.remat_policy != "none"
    cfg.remat_policy = args.remat_policy

    model = GPTLMHeadModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    accum = max(1, args.accum)
    bshape = (accum, b, s + 1) if accum > 1 else (b, s + 1)
    ids = jnp.asarray(rng.integers(0, vocab, bshape), jnp.int32)
    ids0 = ids[0] if accum > 1 else ids
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids0[:, :s])
    if args.param_dtype == "bfloat16":
        params = jax.jit(lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, t))(params)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    opt = optax.adamw(3e-4)
    opt_state = opt.init(params)

    def loss_fn(params, batch):
        # chunked LM-head CE: never materialises (b*s, vocab) fp32 logits
        return chunked_lm_loss(model, params, batch, chunk_tokens=16384)

    def train_step(carry, batch):
        params, opt_state = carry
        if accum > 1:
            # micro-batch scan, fp32 grad accumulator, one adamw update
            # (trainer.py grad_fn counterpart)
            acc_dt = getattr(jnp, args.accum_dtype)

            if args.accum_unroll:
                # straight-line (no lax.scan): lets XLA schedule buffer
                # reuse across micros instead of keeping loop-hoisted bf16
                # weight casts live for the whole scan
                gacc = None
                for i in range(accum):
                    _, grads = jax.value_and_grad(loss_fn)(params, batch[i])
                    gacc = (jax.tree_util.tree_map(
                                lambda g: g.astype(acc_dt), grads)
                            if gacc is None else
                            jax.tree_util.tree_map(
                                lambda a, g: a + g.astype(acc_dt),
                                gacc, grads))
            else:
                def micro(c, mb):
                    loss_sum, gacc = c
                    loss, grads = jax.value_and_grad(loss_fn)(params, mb)
                    gacc = jax.tree_util.tree_map(
                        lambda a, g: a + g.astype(acc_dt), gacc, grads)
                    return (loss_sum + loss, gacc), None
                g0 = jax.tree_util.tree_map(
                    lambda p: jnp.zeros(p.shape, acc_dt), params)
                (_, gacc), _ = jax.lax.scan(
                    micro, (jnp.float32(0.0), g0), batch)
            grads = jax.tree_util.tree_map(
                lambda g, p: (g / accum).astype(p.dtype), gacc, params)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state)

    dt = benchmark_chained(train_step, (params, opt_state), ids,
                           iters=4 if args.quick else 8, reps=3,
                           donate=True)

    tokens = b * s * accum
    d_head = n_embd // n_head
    dense_flops = 6 * n_params * tokens
    attn_flops = 3.5 * (4 * b * s * s * n_head * d_head // 2) * n_layer * accum
    flops = dense_flops + attn_flops
    peak = 197e12  # v5e bf16
    print(f"params={n_params/1e6:.0f}M  batch={b}x{s}"
          + (f"  accum={accum}" if accum > 1 else ""))
    print(f"step: {dt*1e3:.1f} ms   {tokens/dt:,.0f} tokens/s   "
          f"{flops/dt/1e12:.1f} TFLOP/s   MFU {flops/dt/peak*100:.1f}%")


if __name__ == "__main__":
    main()
