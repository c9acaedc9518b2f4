"""GPT-BigCode (StarCoder): config conversion + HF weight remap
(counterpart of `flash_attn/models/bigcode.py`)."""

from __future__ import annotations

import numpy as np

from flash_attn_tpu.models.common import canonical_to_flax, np_


def bigcode_config_to_gpt2_config(bigcode_config):
    from transformers import GPT2Config

    c = bigcode_config
    cfg = GPT2Config(
        vocab_size=c.vocab_size,
        n_positions=c.n_positions,
        n_embd=c.n_embd,
        n_layer=c.n_layer,
        n_head=c.n_head,
        n_inner=c.n_inner,
        activation_function=c.activation_function,
        resid_pdrop=c.resid_pdrop,
        embd_pdrop=c.embd_pdrop,
        attn_pdrop=c.attn_pdrop,
        layer_norm_epsilon=c.layer_norm_epsilon,
        initializer_range=c.initializer_range,
        bos_token_id=c.bos_token_id,
        eos_token_id=c.eos_token_id,
    )
    cfg.n_head_kv = 1 if c.multi_query else c.n_head
    cfg.tie_word_embeddings = True
    return cfg


def remap_state_dict_hf_bigcode(state_dict, config):
    sd = {k: np_(v) for k, v in state_dict.items()}
    cd = {}
    cd["transformer.embeddings.word_embeddings.weight"] = sd.pop(
        "transformer.wte.weight"
    )
    cd["transformer.embeddings.position_embeddings.weight"] = sd.pop(
        "transformer.wpe.weight"
    )
    sd.pop("lm_head.weight", None)  # tied
    cd["transformer.ln_f.weight"] = sd.pop("transformer.ln_f.weight")
    cd["transformer.ln_f.bias"] = sd.pop("transformer.ln_f.bias")
    for l in range(config.num_hidden_layers):
        hf = f"transformer.h.{l}."
        our = f"transformer.layers.{l}."
        cd[our + "norm1.weight"] = sd.pop(hf + "ln_1.weight")
        cd[our + "norm1.bias"] = sd.pop(hf + "ln_1.bias")
        cd[our + "norm2.weight"] = sd.pop(hf + "ln_2.weight")
        cd[our + "norm2.bias"] = sd.pop(hf + "ln_2.bias")
        # HF BigCode c_attn is already [q ; kv] packed (Linear orientation)
        cd[our + "mixer.Wqkv.weight"] = sd.pop(hf + "attn.c_attn.weight")
        cd[our + "mixer.Wqkv.bias"] = sd.pop(hf + "attn.c_attn.bias")
        cd[our + "mixer.out_proj.weight"] = sd.pop(hf + "attn.c_proj.weight")
        cd[our + "mixer.out_proj.bias"] = sd.pop(hf + "attn.c_proj.bias")
        cd[our + "mlp.fc1.weight"] = sd.pop(hf + "mlp.c_fc.weight")
        cd[our + "mlp.fc1.bias"] = sd.pop(hf + "mlp.c_fc.bias")
        cd[our + "mlp.fc2.weight"] = sd.pop(hf + "mlp.c_proj.weight")
        cd[our + "mlp.fc2.bias"] = sd.pop(hf + "mlp.c_proj.bias")
        sd.pop(hf + "attn.bias", None)
    return canonical_to_flax(cd, config)
