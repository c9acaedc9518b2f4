"""Falcon: config conversion + HF weight remap (counterpart of
`flash_attn/models/falcon.py`)."""

from __future__ import annotations

import numpy as np

from flash_attn_tpu.models.common import canonical_to_flax, np_


def falcon_config_to_gpt2_config(falcon_config):
    from transformers import GPT2Config

    c = falcon_config
    # 7b: multi_query (1 kv head), single ln; 40b: GQA + two norms.
    # NB: HF FalconConfig.num_kv_heads property ignores multi_query for the
    # old decoder architecture, so check multi_query first.
    if getattr(c, "new_decoder_architecture", False):
        n_head_kv = c.num_kv_heads
    elif getattr(c, "multi_query", False):
        n_head_kv = 1
    else:
        n_head_kv = c.num_attention_heads
    parallel_block_tied_norm = not getattr(c, "new_decoder_architecture", False)
    cfg = GPT2Config(
        vocab_size=c.vocab_size,
        n_positions=0,
        n_embd=c.hidden_size,
        n_layer=c.num_hidden_layers,
        n_head=c.num_attention_heads,
        n_inner=c.hidden_size * 4,
        activation_function="gelu",
        resid_pdrop=c.hidden_dropout,
        embd_pdrop=0.0,
        attn_pdrop=c.attention_dropout,
        layer_norm_epsilon=c.layer_norm_epsilon,
        initializer_range=c.initializer_range,
        bos_token_id=c.bos_token_id,
        eos_token_id=c.eos_token_id,
    )
    cfg.rotary_emb_fraction = 1.0
    cfg.rotary_emb_interleaved = False
    cfg.tie_word_embeddings = True
    cfg.qkv_proj_bias = getattr(c, "bias", False)
    cfg.out_proj_bias = getattr(c, "bias", False)
    cfg.mlp_fc1_bias = getattr(c, "bias", False)
    cfg.mlp_fc2_bias = getattr(c, "bias", False)
    cfg.parallel_block = c.parallel_attn
    cfg.parallel_block_tied_norm = parallel_block_tied_norm
    cfg.n_head_kv = n_head_kv
    return cfg


def remap_state_dict_hf_falcon(state_dict, config):
    sd = {k: np_(v) for k, v in state_dict.items()}
    h = config.num_attention_heads
    hk = getattr(config, "n_head_kv", h)
    hd = config.hidden_size // h
    g = h // hk
    cd = {}
    cd["transformer.embeddings.word_embeddings.weight"] = sd.pop(
        "transformer.word_embeddings.weight"
    )
    sd.pop("lm_head.weight", None)  # tied
    cd["transformer.ln_f.weight"] = sd.pop("transformer.ln_f.weight")
    cd["transformer.ln_f.bias"] = sd.pop("transformer.ln_f.bias")
    tied = getattr(config, "parallel_block_tied_norm", False)
    for l in range(config.num_hidden_layers):
        hf = f"transformer.h.{l}."
        our = f"transformer.layers.{l}."
        if tied:
            cd[our + "norm1.weight"] = sd.pop(hf + "input_layernorm.weight")
            cd[our + "norm1.bias"] = sd.pop(hf + "input_layernorm.bias")
        else:
            cd[our + "norm1.weight"] = sd.pop(hf + "ln_attn.weight")
            cd[our + "norm1.bias"] = sd.pop(hf + "ln_attn.bias")
            cd[our + "norm2.weight"] = sd.pop(hf + "ln_mlp.weight")
            cd[our + "norm2.bias"] = sd.pop(hf + "ln_mlp.bias")
        # HF Falcon fuses qkv grouped: (hk, g+2, hd, in) -> [q; k; v]
        wqkv = sd.pop(hf + "self_attention.query_key_value.weight")
        wqkv = wqkv.reshape(hk, g + 2, hd, -1)
        wq = wqkv[:, :g].reshape(h * hd, -1)
        wk = wqkv[:, g].reshape(hk * hd, -1)
        wv = wqkv[:, g + 1].reshape(hk * hd, -1)
        cd[our + "mixer.Wqkv.weight"] = np.concatenate([wq, wk, wv], axis=0)
        cd[our + "mixer.out_proj.weight"] = sd.pop(hf + "self_attention.dense.weight")
        cd[our + "mlp.fc1.weight"] = sd.pop(hf + "mlp.dense_h_to_4h.weight")
        cd[our + "mlp.fc2.weight"] = sd.pop(hf + "mlp.dense_4h_to_h.weight")
    return canonical_to_flax(cd, config)
