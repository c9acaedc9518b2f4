"""BTLM (Cerebras btlm-3b-8k): config conversion + HF weight remap
(counterpart of `flash_attn/models/btlm.py`).  GPT-2-like with SwiGLU,
ALiBi, and muP multipliers."""

from __future__ import annotations

import numpy as np

from flash_attn_tpu.models.common import canonical_to_flax, np_


def btlm_config_to_gpt2_config(btlm_config):
    from transformers import GPT2Config

    c = btlm_config
    cfg = GPT2Config(
        vocab_size=c.vocab_size,
        n_positions=0 if c.position_embedding_type == "alibi" else c.n_positions,
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
    cfg.use_alibi = c.position_embedding_type == "alibi"
    cfg.tie_word_embeddings = True
    cfg.use_mup = getattr(c, "mup_embeddings_scale", 1.0) != 1.0
    cfg.mup_embeddings_multiplier = getattr(c, "mup_embeddings_scale", 1.0)
    cfg.mup_output_multiplier = getattr(c, "mup_output_alpha", 1.0) * getattr(
        c, "mup_width_scale", 1.0
    )
    cfg.mup_attn_multiplier = getattr(c, "mup_scale_qk_dot_by_d", False) and (
        c.n_embd // c.n_head
    ) ** -0.5 or 1.0
    return cfg


def remap_state_dict_hf_btlm(state_dict, config):
    sd = {k: np_(v) for k, v in state_dict.items()}
    cd = {}
    cd["transformer.embeddings.word_embeddings.weight"] = sd.pop(
        "transformer.wte.weight"
    )
    if "transformer.wpe.weight" in sd:
        cd["transformer.embeddings.position_embeddings.weight"] = sd.pop(
            "transformer.wpe.weight"
        )
    sd.pop("lm_head.weight", None)
    cd["transformer.ln_f.weight"] = sd.pop("transformer.ln_f.weight")
    cd["transformer.ln_f.bias"] = sd.pop("transformer.ln_f.bias")
    for l in range(config.num_hidden_layers):
        hf = f"transformer.h.{l}."
        our = f"transformer.layers.{l}."
        cd[our + "norm1.weight"] = sd.pop(hf + "ln_1.weight")
        cd[our + "norm1.bias"] = sd.pop(hf + "ln_1.bias")
        cd[our + "norm2.weight"] = sd.pop(hf + "ln_2.weight")
        cd[our + "norm2.bias"] = sd.pop(hf + "ln_2.bias")
        # Conv1D orientation (in, out): transpose to torch Linear (out, in)
        cd[our + "mixer.Wqkv.weight"] = sd.pop(hf + "attn.c_attn.weight").T
        cd[our + "mixer.Wqkv.bias"] = sd.pop(hf + "attn.c_attn.bias")
        cd[our + "mixer.out_proj.weight"] = sd.pop(hf + "attn.c_proj.weight").T
        cd[our + "mixer.out_proj.bias"] = sd.pop(hf + "attn.c_proj.bias")
        # BTLM SwiGLU: c_fc (gate), c_fc2 (up) -> our [gate ; up]
        w_gate = sd.pop(hf + "mlp.c_fc.weight").T
        w_up = sd.pop(hf + "mlp.c_fc2.weight").T
        b_gate = sd.pop(hf + "mlp.c_fc.bias")
        b_up = sd.pop(hf + "mlp.c_fc2.bias")
        cd[our + "mlp.fc1.weight"] = np.concatenate([w_gate, w_up], axis=0)
        cd[our + "mlp.fc1.bias"] = np.concatenate([b_gate, b_up], axis=0)
        cd[our + "mlp.fc2.weight"] = sd.pop(hf + "mlp.c_proj.weight").T
        cd[our + "mlp.fc2.bias"] = sd.pop(hf + "mlp.c_proj.bias")
        sd.pop(hf + "attn.bias", None)
    return canonical_to_flax(cd, config)
