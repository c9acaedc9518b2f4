"""Logits parity vs HuggingFace for every remapped model family
(model: reference `tests/models/test_llama.py`, `test_falcon.py`, etc. —
parity under fp32 with tiny random checkpoints, no network)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from flash_attn_tpu.models.gpt import GPTLMHeadModel


def run_parity(hf_model, config, remap, atol=2e-3, seed=0):
    state_dict = {k: v for k, v in hf_model.state_dict().items()}
    params = {"params": remap(state_dict, config)}
    model = GPTLMHeadModel(config, dtype=jnp.float32)
    ids = np.random.default_rng(seed).integers(0, config.vocab_size, (2, 48))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.float().numpy()
    out = np.asarray(model.apply(params, jnp.asarray(ids, jnp.int32)).logits)
    err = np.abs(out - ref).max()
    assert err < atol, f"parity err {err}"


def test_llama_parity():
    from transformers import LlamaConfig, LlamaForCausalLM

    from flash_attn_tpu.models.llama import (
        llama_config_to_gpt2_config,
        remap_state_dict_hf_llama,
    )

    hf_cfg = LlamaConfig(
        vocab_size=503, hidden_size=128, intermediate_size=344,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = llama_config_to_gpt2_config(hf_cfg)
    run_parity(hf, cfg, remap_state_dict_hf_llama)


def test_opt_parity():
    from transformers import OPTConfig, OPTForCausalLM

    from flash_attn_tpu.models.opt import (
        opt_config_to_gpt2_config,
        remap_state_dict_hf_opt,
    )

    hf_cfg = OPTConfig(
        vocab_size=507, hidden_size=128, ffn_dim=512, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128, dropout=0.0,
        word_embed_proj_dim=128,
    )
    torch.manual_seed(0)
    hf = OPTForCausalLM(hf_cfg).eval()
    cfg = opt_config_to_gpt2_config(hf_cfg)
    run_parity(hf, cfg, remap_state_dict_hf_opt)


def test_gptj_parity():
    from transformers import GPTJConfig, GPTJForCausalLM

    from flash_attn_tpu.models.gptj import (
        gptj_config_to_gpt2_config,
        remap_state_dict_hf_gptj,
    )

    hf_cfg = GPTJConfig(
        vocab_size=509, n_embd=128, n_layer=2, n_head=4, rotary_dim=16,
        n_positions=128, n_inner=None,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf = GPTJForCausalLM(hf_cfg).eval()
    cfg = gptj_config_to_gpt2_config(hf_cfg)
    run_parity(hf, cfg, remap_state_dict_hf_gptj)


def test_gpt_neox_parity():
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    from flash_attn_tpu.models.gpt_neox import (
        gpt_neox_config_to_gpt2_config,
        remap_state_dict_hf_gpt_neox,
    )

    hf_cfg = GPTNeoXConfig(
        vocab_size=511, hidden_size=128, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.25,
        max_position_embeddings=128, use_parallel_residual=True,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = GPTNeoXForCausalLM(hf_cfg).eval()
    cfg = gpt_neox_config_to_gpt2_config(hf_cfg)
    run_parity(hf, cfg, remap_state_dict_hf_gpt_neox)


def test_falcon_parity():
    from transformers import FalconConfig, FalconForCausalLM

    from flash_attn_tpu.models.falcon import (
        falcon_config_to_gpt2_config,
        remap_state_dict_hf_falcon,
    )

    hf_cfg = FalconConfig(
        vocab_size=513, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, parallel_attn=True, bias=False,
        multi_query=True, new_decoder_architecture=False,
        hidden_dropout=0.0, attention_dropout=0.0, alibi=False,
    )
    torch.manual_seed(0)
    hf = FalconForCausalLM(hf_cfg).eval()
    cfg = falcon_config_to_gpt2_config(hf_cfg)
    run_parity(hf, cfg, remap_state_dict_hf_falcon)


def test_bigcode_parity():
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    from flash_attn_tpu.models.bigcode import (
        bigcode_config_to_gpt2_config,
        remap_state_dict_hf_bigcode,
    )

    hf_cfg = GPTBigCodeConfig(
        vocab_size=517, n_embd=128, n_layer=2, n_head=4, n_positions=128,
        multi_query=True, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        activation_function="gelu",
    )
    torch.manual_seed(0)
    hf = GPTBigCodeForCausalLM(hf_cfg).eval()
    cfg = bigcode_config_to_gpt2_config(hf_cfg)
    run_parity(hf, cfg, remap_state_dict_hf_bigcode)
