"""GPT-NeoX: config conversion + HF weight remap (counterpart of
`flash_attn/models/gpt_neox.py`)."""

from __future__ import annotations

import math

import numpy as np

from flash_attn_tpu.models.common import canonical_to_flax, np_


def gpt_neox_config_to_gpt2_config(neox_config):
    from transformers import GPT2Config

    c = neox_config
    cfg = GPT2Config(
        vocab_size=c.vocab_size,
        n_positions=0,
        n_embd=c.hidden_size,
        n_layer=c.num_hidden_layers,
        n_head=c.num_attention_heads,
        n_inner=c.intermediate_size,
        activation_function=c.hidden_act,
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
        layer_norm_epsilon=c.layer_norm_eps,
        initializer_range=c.initializer_range,
        bos_token_id=c.bos_token_id,
        eos_token_id=c.eos_token_id,
    )
    cfg.rotary_emb_fraction = c.rotary_pct
    cfg.rotary_emb_base = c.rotary_emb_base
    cfg.rotary_emb_interleaved = False  # NeoX rotate-half style
    cfg.tie_word_embeddings = c.tie_word_embeddings
    cfg.parallel_block = c.use_parallel_residual
    cfg.parallel_block_tied_norm = False
    return cfg


def remap_state_dict_hf_gpt_neox(state_dict, config):
    sd = {k: np_(v) for k, v in state_dict.items()}
    h = config.num_attention_heads
    hd = config.hidden_size // h
    cd = {}
    cd["transformer.embeddings.word_embeddings.weight"] = sd.pop(
        "gpt_neox.embed_in.weight"
    )
    if "embed_out.weight" in sd:
        cd["lm_head.weight"] = sd.pop("embed_out.weight")
    cd["transformer.ln_f.weight"] = sd.pop("gpt_neox.final_layer_norm.weight")
    cd["transformer.ln_f.bias"] = sd.pop("gpt_neox.final_layer_norm.bias")
    for l in range(config.num_hidden_layers):
        hf = f"gpt_neox.layers.{l}."
        our = f"transformer.layers.{l}."
        cd[our + "norm1.weight"] = sd.pop(hf + "input_layernorm.weight")
        cd[our + "norm1.bias"] = sd.pop(hf + "input_layernorm.bias")
        cd[our + "norm2.weight"] = sd.pop(hf + "post_attention_layernorm.weight")
        cd[our + "norm2.bias"] = sd.pop(hf + "post_attention_layernorm.bias")
        # HF NeoX fuses qkv interleaved per head: (h, 3, hd, in) -> (3, h*hd, in)
        wqkv = sd.pop(hf + "attention.query_key_value.weight")
        wqkv = wqkv.reshape(h, 3, hd, -1).swapaxes(0, 1).reshape(3 * h * hd, -1)
        bqkv = sd.pop(hf + "attention.query_key_value.bias")
        bqkv = bqkv.reshape(h, 3, hd).swapaxes(0, 1).reshape(-1)
        cd[our + "mixer.Wqkv.weight"] = wqkv
        cd[our + "mixer.Wqkv.bias"] = bqkv
        cd[our + "mixer.out_proj.weight"] = sd.pop(hf + "attention.dense.weight")
        cd[our + "mixer.out_proj.bias"] = sd.pop(hf + "attention.dense.bias")
        cd[our + "mlp.fc1.weight"] = sd.pop(hf + "mlp.dense_h_to_4h.weight")
        cd[our + "mlp.fc1.bias"] = sd.pop(hf + "mlp.dense_h_to_4h.bias")
        cd[our + "mlp.fc2.weight"] = sd.pop(hf + "mlp.dense_4h_to_h.weight")
        cd[our + "mlp.fc2.bias"] = sd.pop(hf + "mlp.dense_4h_to_h.bias")
        for junk in ("attention.bias", "attention.masked_bias",
                     "attention.rotary_emb.inv_freq"):
            sd.pop(hf + junk, None)
    return canonical_to_flax(cd, config)
