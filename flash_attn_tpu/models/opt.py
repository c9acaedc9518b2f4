"""OPT: config conversion + HF weight remap (counterpart of
`flash_attn/models/opt.py`)."""

from __future__ import annotations

import numpy as np

from flash_attn_tpu.models.common import canonical_to_flax, np_


def opt_config_to_gpt2_config(opt_config):
    from transformers import GPT2Config

    c = opt_config
    assert c.layerdrop == 0.0 and c.do_layer_norm_before
    word_embed_proj_dim = (
        None if c.word_embed_proj_dim == c.hidden_size else c.word_embed_proj_dim
    )
    cfg = GPT2Config(
        vocab_size=c.vocab_size,
        n_positions=c.max_position_embeddings,
        n_embd=c.hidden_size,
        n_layer=c.num_hidden_layers,
        n_head=c.num_attention_heads,
        n_inner=c.ffn_dim,
        activation_function=c.activation_function,
        resid_pdrop=c.dropout,
        embd_pdrop=c.dropout,
        attn_pdrop=c.attention_dropout,
        initializer_range=c.init_std,
        bos_token_id=c.bos_token_id,
        eos_token_id=c.eos_token_id,
    )
    cfg.word_embed_proj_dim = word_embed_proj_dim
    cfg.prenorm = True
    cfg.tie_word_embeddings = True
    return cfg


def remap_state_dict_hf_opt(state_dict, config):
    sd = {k: np_(v) for k, v in state_dict.items()}
    sd = {k.replace("model.decoder.", "decoder."): v for k, v in sd.items()}
    cd = {}
    cd["transformer.embeddings.word_embeddings.weight"] = sd.pop(
        "decoder.embed_tokens.weight"
    )
    # OPT offsets learned positions by 2 (HF OPTLearnedPositionalEmbedding)
    cd["transformer.embeddings.position_embeddings.weight"] = sd.pop(
        "decoder.embed_positions.weight"
    )[2:]
    if "decoder.project_in.weight" in sd:
        cd["transformer.embeddings.project_in.weight"] = sd.pop(
            "decoder.project_in.weight"
        )
        sd.pop("decoder.project_out.weight", None)
    ln_key = (
        "decoder.final_layer_norm" if "decoder.final_layer_norm.weight" in sd
        else "decoder.layer_norm"
    )
    cd["transformer.ln_f.weight"] = sd.pop(ln_key + ".weight")
    cd["transformer.ln_f.bias"] = sd.pop(ln_key + ".bias")
    sd.pop("lm_head.weight", None)  # tied
    for l in range(config.num_hidden_layers):
        hf = f"decoder.layers.{l}."
        our = f"transformer.layers.{l}."
        for a, b in (("self_attn_layer_norm", "norm1"),
                     ("final_layer_norm", "norm2")):
            cd[our + b + ".weight"] = sd.pop(hf + a + ".weight")
            cd[our + b + ".bias"] = sd.pop(hf + a + ".bias")
        wq = sd.pop(hf + "self_attn.q_proj.weight")
        wk = sd.pop(hf + "self_attn.k_proj.weight")
        wv = sd.pop(hf + "self_attn.v_proj.weight")
        cd[our + "mixer.Wqkv.weight"] = np.concatenate([wq, wk, wv], axis=0)
        cd[our + "mixer.Wqkv.bias"] = np.concatenate(
            [sd.pop(hf + "self_attn.q_proj.bias"),
             sd.pop(hf + "self_attn.k_proj.bias"),
             sd.pop(hf + "self_attn.v_proj.bias")], axis=0,
        )
        cd[our + "mixer.out_proj.weight"] = sd.pop(hf + "self_attn.out_proj.weight")
        cd[our + "mixer.out_proj.bias"] = sd.pop(hf + "self_attn.out_proj.bias")
        cd[our + "mlp.fc1.weight"] = sd.pop(hf + "fc1.weight")
        cd[our + "mlp.fc1.bias"] = sd.pop(hf + "fc1.bias")
        cd[our + "mlp.fc2.weight"] = sd.pop(hf + "fc2.weight")
        cd[our + "mlp.fc2.bias"] = sd.pop(hf + "fc2.bias")
    return canonical_to_flax(cd, config)
