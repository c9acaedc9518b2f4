"""GPT model tests: HF logits parity + KV-cache decode consistency.

Model: reference `tests/models/test_gpt.py` (parity vs HuggingFace under
low precision; generation vs full-recompute decode).  Uses a randomly
initialised HF torch GPT-2 (no network) remapped through
`remap_state_dict_hf_gpt2`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.models.gpt import GPTLMHeadModel, remap_state_dict_hf_gpt2
from flash_attn_tpu.modules.mha import InferenceParams


@pytest.fixture(scope="module")
def hf_model_and_config():
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel as HFGPT2

    config = GPT2Config(
        n_embd=192, n_head=6, n_layer=3, vocab_size=997, n_positions=256,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        activation_function="gelu_new",
    )
    torch.manual_seed(0)
    hf = HFGPT2(config).eval()
    return hf, config


def test_gpt2_hf_parity(hf_model_and_config):
    import torch

    hf, config = hf_model_and_config
    state_dict = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    # HF state dict has no "transformer." prefix on the inner model? It does
    # for GPT2LMHeadModel: transformer.wte.weight etc.
    params = {"params": remap_state_dict_hf_gpt2(state_dict, config)}

    model = GPTLMHeadModel(config, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, config.vocab_size, (2, 64))

    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    out = model.apply(params, jnp.asarray(ids, jnp.int32)).logits
    err = float(jnp.abs(out - ref).max())
    assert err < 2e-3, f"HF parity err {err}"


def test_gpt2_decode_matches_full(hf_model_and_config):
    _, config = hf_model_and_config
    model = GPTLMHeadModel(config, dtype=jnp.float32)
    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, config.vocab_size, (2, 48)),
        jnp.int32,
    )
    params = model.init(jax.random.PRNGKey(0), ids)

    # prefill 32, decode 16 one at a time
    ip = InferenceParams(
        max_seqlen=128, max_batch_size=2,
        lengths_per_sample=jnp.zeros((2,), jnp.int32),
    )
    out = model.apply(params, ids[:, :32], inference_params=ip)
    ip = out.inference_params
    logits_steps = [out.logits[:, -1]]
    for t in range(32, 48):
        out = model.apply(params, ids[:, t:t + 1], inference_params=ip)
        ip = out.inference_params
        logits_steps.append(out.logits[:, -1])

    full = model.apply(params, ids).logits
    for i, t in enumerate(range(31, 47)):
        err = float(jnp.abs(logits_steps[i] - full[:, t]).max())
        assert err < 1e-4, (i, err)


@pytest.mark.parametrize("policy", ["none", "dots"])
def test_remat_policy_grad_parity(policy):
    """remat_blocks + remat_policy must not change loss or gradients
    (reference analogue: Lightning gradient_checkpointing changes memory,
    never numbers)."""
    from transformers import GPT2Config

    from flash_attn_tpu.training.loss import chunked_lm_loss

    def make(remat):
        cfg = GPT2Config(
            n_embd=64, n_head=4, n_layer=2, vocab_size=128, n_positions=64,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        )
        cfg.rms_norm = True
        cfg.rotary_emb_fraction = 1.0
        cfg.activation_function = "swiglu"
        if remat:
            cfg.remat_blocks = True
            cfg.remat_policy = policy
        return GPTLMHeadModel(cfg, dtype=jnp.bfloat16)

    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 128, (2, 33)), jnp.int32)
    base = make(False)
    params = jax.jit(base.init)(jax.random.PRNGKey(0), ids[:, :32])

    def loss_of(model):
        return jax.value_and_grad(
            lambda p: chunked_lm_loss(model, p, ids, chunk_tokens=64))(params)

    l0, g0 = loss_of(base)
    l1, g1 = loss_of(make(True))
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
