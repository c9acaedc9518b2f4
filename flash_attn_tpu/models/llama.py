"""LLaMA family: config conversion + HF/Meta weight remap.

Counterpart of `flash_attn/models/llama.py` (`remap_state_dict_meta_llama:19`,
`remap_state_dict_hf_llama:115`, `inv_remap_state_dict_hf_llama:219`,
`llama_config_to_gpt2_config:393`).
"""

from __future__ import annotations

import numpy as np

from flash_attn_tpu.models.common import canonical_to_flax, np_


def llama_config_to_gpt2_config(llama_config):
    """`models/llama.py:393`."""
    from transformers import GPT2Config

    c = llama_config
    cfg = GPT2Config(
        vocab_size=c.vocab_size,
        n_positions=0,
        n_embd=c.hidden_size,
        n_layer=c.num_hidden_layers,
        n_head=c.num_attention_heads,
        n_inner=c.intermediate_size,
        activation_function="swiglu",
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
        layer_norm_epsilon=c.rms_norm_eps,
        initializer_range=c.initializer_range,
        bos_token_id=c.bos_token_id,
        eos_token_id=c.eos_token_id,
    )
    cfg.pad_token_id = c.pad_token_id
    cfg.rms_norm = True
    cfg.rotary_emb_fraction = 1.0
    cfg.rotary_emb_interleaved = True
    cfg.tie_word_embeddings = False
    cfg.qkv_proj_bias = False
    cfg.out_proj_bias = False
    cfg.mlp_fc1_bias = False
    cfg.mlp_fc2_bias = False
    cfg.rotary_emb_base = getattr(c, "rope_theta", 10000.0)
    cfg.n_head_kv = getattr(c, "num_key_value_heads", c.num_attention_heads)
    return cfg


def _inv_permute(w, nheads, headdim):
    """HF's rotate-half weight permutation -> interleaved rotary order
    (inverse of HF convert_llama_weights_to_hf permute)."""
    return (
        w.reshape(nheads, 2, headdim // 2, -1)
        .swapaxes(1, 2)
        .reshape(nheads * headdim, -1)
    )


def remap_state_dict_hf_llama(state_dict, config):
    """HF LlamaForCausalLM -> flax params (`models/llama.py:115`)."""
    sd = {k: np_(v) for k, v in state_dict.items()}
    hd = config.hidden_size // config.num_attention_heads
    h = config.num_attention_heads
    hk = getattr(config, "n_head_kv", h)
    cd = {}
    cd["transformer.embeddings.word_embeddings.weight"] = sd.pop(
        "model.embed_tokens.weight"
    )
    cd["lm_head.weight"] = sd.pop("lm_head.weight")
    cd["transformer.ln_f.weight"] = sd.pop("model.norm.weight")
    for l in range(config.num_hidden_layers):
        hf = f"model.layers.{l}."
        our = f"transformer.layers.{l}."
        cd[our + "norm1.weight"] = sd.pop(hf + "input_layernorm.weight")
        cd[our + "norm2.weight"] = sd.pop(hf + "post_attention_layernorm.weight")
        wq = _inv_permute(sd.pop(hf + "self_attn.q_proj.weight"), h, hd)
        wk = _inv_permute(sd.pop(hf + "self_attn.k_proj.weight"), hk, hd)
        wv = sd.pop(hf + "self_attn.v_proj.weight")
        cd[our + "mixer.Wqkv.weight"] = np.concatenate([wq, wk, wv], axis=0)
        cd[our + "mixer.out_proj.weight"] = sd.pop(hf + "self_attn.o_proj.weight")
        gate = sd.pop(hf + "mlp.gate_proj.weight")
        up = sd.pop(hf + "mlp.up_proj.weight")
        # our GatedMlp packs [gate ; up]
        cd[our + "mlp.fc1.weight"] = np.concatenate([gate, up], axis=0)
        cd[our + "mlp.fc2.weight"] = sd.pop(hf + "mlp.down_proj.weight")
        sd.pop(hf + "self_attn.rotary_emb.inv_freq", None)
    return canonical_to_flax(cd, config)


def remap_state_dict_meta_llama(state_dict, config):
    """Meta (original) llama checkpoint -> flax params
    (`models/llama.py:19`).  Meta stores rotary in interleaved order
    already — no permutation needed."""
    sd = {k: np_(v) for k, v in state_dict.items()}
    cd = {}
    cd["transformer.embeddings.word_embeddings.weight"] = sd.pop(
        "tok_embeddings.weight"
    )
    cd["lm_head.weight"] = sd.pop("output.weight")
    cd["transformer.ln_f.weight"] = sd.pop("norm.weight")
    for l in range(config.num_hidden_layers):
        hf = f"layers.{l}."
        our = f"transformer.layers.{l}."
        cd[our + "norm1.weight"] = sd.pop(hf + "attention_norm.weight")
        cd[our + "norm2.weight"] = sd.pop(hf + "ffn_norm.weight")
        cd[our + "mixer.Wqkv.weight"] = np.concatenate(
            [
                sd.pop(hf + "attention.wq.weight"),
                sd.pop(hf + "attention.wk.weight"),
                sd.pop(hf + "attention.wv.weight"),
            ],
            axis=0,
        )
        cd[our + "mixer.out_proj.weight"] = sd.pop(hf + "attention.wo.weight")
        gate = sd.pop(hf + "feed_forward.w1.weight")
        up = sd.pop(hf + "feed_forward.w3.weight")
        cd[our + "mlp.fc1.weight"] = np.concatenate([gate, up], axis=0)
        cd[our + "mlp.fc2.weight"] = sd.pop(hf + "feed_forward.w2.weight")
        sd.pop(hf + "attention.inner_attention.rope.freqs", None)
    sd.pop("rope.freqs", None)
    return canonical_to_flax(cd, config)
