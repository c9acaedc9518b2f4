"""GPT-J: config conversion + HF weight remap (counterpart of
`flash_attn/models/gptj.py`)."""

from __future__ import annotations

import numpy as np

from flash_attn_tpu.models.common import canonical_to_flax, np_


def gptj_config_to_gpt2_config(gptj_config):
    from transformers import GPT2Config

    c = gptj_config
    cfg = GPT2Config(
        vocab_size=c.vocab_size,
        n_positions=0,  # rotary only
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
    cfg.rotary_emb_fraction = c.rotary_dim / (c.n_embd // c.n_head)
    cfg.rotary_emb_interleaved = True  # GPT-J style
    cfg.tie_word_embeddings = False
    cfg.qkv_proj_bias = False
    cfg.out_proj_bias = False
    cfg.parallel_block = True
    cfg.parallel_block_tied_norm = True
    cfg.lm_head_bias = True
    return cfg


def remap_state_dict_hf_gptj(state_dict, config):
    sd = {k: np_(v) for k, v in state_dict.items()}
    cd = {}
    cd["transformer.embeddings.word_embeddings.weight"] = sd.pop(
        "transformer.wte.weight"
    )
    cd["lm_head.weight"] = sd.pop("lm_head.weight")
    cd["lm_head.bias"] = sd.pop("lm_head.bias")
    cd["transformer.ln_f.weight"] = sd.pop("transformer.ln_f.weight")
    cd["transformer.ln_f.bias"] = sd.pop("transformer.ln_f.bias")
    for l in range(config.num_hidden_layers):
        hf = f"transformer.h.{l}."
        our = f"transformer.layers.{l}."
        cd[our + "norm1.weight"] = sd.pop(hf + "ln_1.weight")
        cd[our + "norm1.bias"] = sd.pop(hf + "ln_1.bias")
        cd[our + "mixer.Wqkv.weight"] = np.concatenate(
            [
                sd.pop(hf + "attn.q_proj.weight"),
                sd.pop(hf + "attn.k_proj.weight"),
                sd.pop(hf + "attn.v_proj.weight"),
            ],
            axis=0,
        )
        cd[our + "mixer.out_proj.weight"] = sd.pop(hf + "attn.out_proj.weight")
        cd[our + "mlp.fc1.weight"] = sd.pop(hf + "mlp.fc_in.weight")
        cd[our + "mlp.fc1.bias"] = sd.pop(hf + "mlp.fc_in.bias")
        cd[our + "mlp.fc2.weight"] = sd.pop(hf + "mlp.fc_out.weight")
        cd[our + "mlp.fc2.bias"] = sd.pop(hf + "mlp.fc_out.bias")
        for junk in ("attn.bias", "attn.masked_bias"):
            sd.pop(hf + junk, None)
    return canonical_to_flax(cd, config)
