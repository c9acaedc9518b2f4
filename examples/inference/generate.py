"""Example: KV-cache generation with a LLaMA-style model.

Counterpart of the reference `examples/inference/` walkthrough: build a
config-driven GPT (RMSNorm + rotary + GQA + SwiGLU), run greedy/sampled
decode with the jit/scan KV-cache loop, then the same prompts through the
continuous-batching serving engine.

Run: python examples/inference/generate.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from transformers import GPT2Config

    from flash_attn_tpu.models.gpt import GPTLMHeadModel
    from flash_attn_tpu.serving import ServingEngine
    from flash_attn_tpu.utils.generation import decode

    cfg = GPT2Config(
        n_embd=256, n_head=8, n_layer=4, vocab_size=1024, n_positions=512,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    cfg.rms_norm = True
    cfg.rotary_emb_fraction = 1.0
    cfg.n_head_kv = 2          # GQA
    cfg.activation_function = "swiglu"
    cfg.qkv_proj_bias = False
    cfg.out_proj_bias = False
    cfg.mlp_fc1_bias = False
    cfg.mlp_fc2_bias = False

    model = GPTLMHeadModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 1024, (1, 12)), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), prompt)
    apply_fn = lambda p, x, ip: model.apply(p, x, inference_params=ip)

    # --- single-sequence decode (jit + lax.scan; CUDA-graph analogue) ---
    out = decode(prompt, apply_fn, params, max_length=40)
    print("greedy      :", np.asarray(out.sequences[0, 12:]))

    out = decode(prompt, apply_fn, params, max_length=40, top_k=20,
                 temperature=0.9, rng=jax.random.PRNGKey(7))
    print("top-k sample:", np.asarray(out.sequences[0, 12:]))

    # --- continuous batching: several requests through one decode batch ---
    engine = ServingEngine(apply_fn, params, max_batch=2, max_seqlen=256,
                           chunk_steps=8, prefill_buckets=(16, 32))
    uids = [
        engine.submit(rng.integers(0, 1024, (n,)), max_new_tokens=16)
        for n in (9, 14, 23)
    ]
    results = engine.run()
    for uid in uids:
        print(f"request {uid}:", results[uid])
    print("engine stats:", engine.stats)


if __name__ == "__main__":
    main()
