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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_baichuan_parity():
    """Baichuan is LLaMA with a fused W_pack: build a LlamaForCausalLM twin,
    re-lay its weights into Baichuan's HF format, and require identical
    logits through `remap_state_dict_hf_baichuan` (reference
    `flash_attn/models/baichuan.py` semantics)."""
    from transformers import LlamaConfig, LlamaForCausalLM

    from flash_attn_tpu.models.baichuan import (
        baichuan_config_to_gpt2_config,
        remap_state_dict_hf_baichuan,
    )

    hf_cfg = LlamaConfig(
        vocab_size=521, hidden_size=128, intermediate_size=344,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128,
    )
    torch.manual_seed(1)
    hf = LlamaForCausalLM(hf_cfg).eval()

    # re-key the Llama checkpoint into Baichuan HF layout (fused W_pack)
    sd = dict(hf.state_dict())
    bsd = {}
    bsd["model.embed_tokens.weight"] = sd["model.embed_tokens.weight"]
    bsd["lm_head.weight"] = sd["lm_head.weight"]
    bsd["model.norm.weight"] = sd["model.norm.weight"]
    for l in range(hf_cfg.num_hidden_layers):
        p = f"model.layers.{l}."
        bsd[p + "input_layernorm.weight"] = sd[p + "input_layernorm.weight"]
        bsd[p + "post_attention_layernorm.weight"] = sd[
            p + "post_attention_layernorm.weight"]
        bsd[p + "self_attn.W_pack.weight"] = torch.cat(
            [sd[p + "self_attn.q_proj.weight"],
             sd[p + "self_attn.k_proj.weight"],
             sd[p + "self_attn.v_proj.weight"]], dim=0)
        bsd[p + "self_attn.o_proj.weight"] = sd[p + "self_attn.o_proj.weight"]
        for w in ("gate_proj", "up_proj", "down_proj"):
            bsd[p + f"mlp.{w}.weight"] = sd[p + f"mlp.{w}.weight"]

    class _BaichuanCfg:
        vocab_size = hf_cfg.vocab_size
        hidden_size = hf_cfg.hidden_size
        num_hidden_layers = hf_cfg.num_hidden_layers
        num_attention_heads = hf_cfg.num_attention_heads
        intermediate_size = hf_cfg.intermediate_size
        rms_norm_eps = hf_cfg.rms_norm_eps
        initializer_range = hf_cfg.initializer_range
        bos_token_id = hf_cfg.bos_token_id
        eos_token_id = hf_cfg.eos_token_id
        position_embedding_type = "rope"

    cfg = baichuan_config_to_gpt2_config(_BaichuanCfg())
    run_parity(hf, cfg, lambda s, c: remap_state_dict_hf_baichuan(bsd, c))


def test_btlm_remap_structure():
    """BTLM needs trust_remote_code (unavailable offline), so the check is
    structural: a synthetic HF-layout checkpoint remaps onto the GPT
    skeleton with every weight consumed, correct shapes, finite logits,
    and muP multipliers threaded through the config."""
    import types

    import numpy as np

    from flash_attn_tpu.models.btlm import (
        btlm_config_to_gpt2_config,
        remap_state_dict_hf_btlm,
    )

    c = types.SimpleNamespace(
        vocab_size=277, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        n_inner=172, activation_function="swiglu", resid_pdrop=0.0,
        embd_pdrop=0.0, attn_pdrop=0.0, layer_norm_epsilon=1e-5,
        initializer_range=0.02, bos_token_id=0, eos_token_id=0,
        position_embedding_type="alibi", mup_embeddings_scale=14.6,
        mup_output_alpha=2.22, mup_width_scale=0.1,
        mup_scale_qk_dot_by_d=True,
    )
    cfg = btlm_config_to_gpt2_config(c)
    assert cfg.use_alibi and cfg.use_mup
    assert abs(cfg.mup_embeddings_multiplier - 14.6) < 1e-9

    rng = np.random.default_rng(0)

    def t(*shape):
        return torch.tensor(rng.standard_normal(shape) * 0.02,
                            dtype=torch.float32)

    d, inner = c.n_embd, c.n_inner
    sd = {"transformer.wte.weight": t(c.vocab_size, d),
          "transformer.ln_f.weight": t(d), "transformer.ln_f.bias": t(d)}
    for l in range(c.n_layer):
        p = f"transformer.h.{l}."
        sd[p + "ln_1.weight"] = t(d)
        sd[p + "ln_1.bias"] = t(d)
        sd[p + "ln_2.weight"] = t(d)
        sd[p + "ln_2.bias"] = t(d)
        sd[p + "attn.c_attn.weight"] = t(d, 3 * d)  # Conv1D (in, out)
        sd[p + "attn.c_attn.bias"] = t(3 * d)
        sd[p + "attn.c_proj.weight"] = t(d, d)
        sd[p + "attn.c_proj.bias"] = t(d)
        sd[p + "mlp.c_fc.weight"] = t(d, inner)
        sd[p + "mlp.c_fc.bias"] = t(inner)
        sd[p + "mlp.c_fc2.weight"] = t(d, inner)
        sd[p + "mlp.c_fc2.bias"] = t(inner)
        sd[p + "mlp.c_proj.weight"] = t(inner, d)
        sd[p + "mlp.c_proj.bias"] = t(d)

    params = {"params": remap_state_dict_hf_btlm(dict(sd), cfg)}
    model = GPTLMHeadModel(cfg, dtype=jnp.float32)
    ids = np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 24))
    logits = model.apply(params, jnp.asarray(ids, jnp.int32)).logits
    assert logits.shape == (2, 24, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))
