"""Baichuan: config conversion + HF weight remap (counterpart of
`flash_attn/models/baichuan.py`).  LLaMA-like with a fused W_pack QKV;
13B uses ALiBi instead of rotary."""

from __future__ import annotations

import numpy as np

from flash_attn_tpu.models.common import canonical_to_flax, np_
from flash_attn_tpu.models.llama import _inv_permute


def baichuan_config_to_gpt2_config(baichuan_config):
    from transformers import GPT2Config

    c = baichuan_config
    use_alibi = getattr(c, "position_embedding_type", "rope") == "alibi" or (
        c.hidden_size >= 5120  # 13B family is alibi
    )
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
    cfg.rms_norm = True
    cfg.use_alibi = use_alibi
    cfg.rotary_emb_fraction = 0.0 if use_alibi else 1.0
    cfg.rotary_emb_interleaved = True
    cfg.tie_word_embeddings = False
    cfg.qkv_proj_bias = False
    cfg.out_proj_bias = False
    cfg.mlp_fc1_bias = False
    cfg.mlp_fc2_bias = False
    return cfg


def remap_state_dict_hf_baichuan(state_dict, config):
    sd = {k: np_(v) for k, v in state_dict.items()}
    h = config.num_attention_heads
    hd = config.hidden_size // h
    rotary = getattr(config, "rotary_emb_fraction", 0.0) > 0
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
        wpack = sd.pop(hf + "self_attn.W_pack.weight")
        wq, wk, wv = np.split(wpack, 3, axis=0)
        if rotary:
            wq = _inv_permute(wq, h, hd)
            wk = _inv_permute(wk, h, hd)
        cd[our + "mixer.Wqkv.weight"] = np.concatenate([wq, wk, wv], axis=0)
        cd[our + "mixer.out_proj.weight"] = sd.pop(hf + "self_attn.o_proj.weight")
        gate = sd.pop(hf + "mlp.gate_proj.weight")
        up = sd.pop(hf + "mlp.up_proj.weight")
        cd[our + "mlp.fc1.weight"] = np.concatenate([gate, up], axis=0)
        cd[our + "mlp.fc2.weight"] = sd.pop(hf + "mlp.down_proj.weight")
        sd.pop(hf + "self_attn.rotary_emb.inv_freq", None)
    return canonical_to_flax(cd, config)
