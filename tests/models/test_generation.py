"""Decode-loop tests (model: reference `tests/models/test_gpt_generation*`):
greedy KV-cache decode must match argmax over full-recompute logits."""

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.models.gpt import GPTLMHeadModel
from flash_attn_tpu.utils.generation import decode, sample_speculative


def make_model():
    from transformers import GPT2Config

    cfg = GPT2Config(
        n_embd=128, n_head=4, n_layer=2, vocab_size=311, n_positions=256,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    model = GPTLMHeadModel(cfg, dtype=jnp.float32)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 311, (2, 16)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), ids)
    return model, params, ids


def test_greedy_decode_matches_full_recompute():
    model, params, ids = make_model()
    out = decode(
        ids,
        lambda p, x, ip: model.apply(p, x, inference_params=ip),
        params,
        max_length=32,
        jit=False,
    )
    seq = out.sequences
    assert seq.shape == (2, 32)
    # naive decode: recompute the full sequence each step, take argmax
    cur = ids
    for _ in range(16):
        logits = model.apply(params, cur).logits[:, -1]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(cur))


def test_sampling_decode_runs():
    model, params, ids = make_model()
    out = decode(
        ids,
        lambda p, x, ip: model.apply(p, x, inference_params=ip),
        params,
        max_length=24,
        top_k=5,
        temperature=0.8,
        rng=jax.random.PRNGKey(1),
        jit=False,
    )
    assert out.sequences.shape == (2, 24)
    assert bool(jnp.all(out.sequences[:, :16] == ids))


def test_sample_speculative_greedy():
    # target greedy: accepted tokens must be the target argmax prefix
    rng = np.random.default_rng(2)
    b, n, v = 2, 4, 50
    logits = jnp.asarray(rng.standard_normal((b, n + 1, v)), jnp.float32)
    draft_tok = jnp.asarray(rng.integers(0, v, (b, n)), jnp.int32)
    toks, num_acc = sample_speculative(
        logits, logits[:, :n], draft_tok, jax.random.PRNGKey(0), top_k=1
    )
    tgt = np.asarray(jnp.argmax(logits, axis=-1))
    toks, num_acc = np.asarray(toks), np.asarray(num_acc)
    for i in range(b):
        na = num_acc[i]
        np.testing.assert_array_equal(
            toks[i, :na], np.asarray(draft_tok)[i, :na]
        )
        # the correction token is the target argmax at the first mismatch
        assert toks[i, na] == tgt[i, na]


def test_speculative_decode_greedy_matches_plain():
    """Greedy speculative decoding is lossless: with any draft model the
    committed sequence must equal plain greedy decode of the target
    (reference `test_gpt_generation` speculative cases)."""
    from flash_attn_tpu.utils.generation import decode_speculative

    model, params, ids = make_model()
    # draft = same architecture, different (worse) weights
    from transformers import GPT2Config

    cfg = GPT2Config(
        n_embd=64, n_head=2, n_layer=1, vocab_size=311, n_positions=256,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    from flash_attn_tpu.models.gpt import GPTLMHeadModel

    draft = GPTLMHeadModel(cfg, dtype=jnp.float32)
    params_d = draft.init(jax.random.PRNGKey(7), ids[:1])

    apply_m = lambda p, x, ip: model.apply(p, x, inference_params=ip)
    apply_d = lambda p, x, ip: draft.apply(p, x, inference_params=ip)

    prompt = ids[:1]
    ref = decode(prompt, apply_m, params, max_length=36, jit=False)
    out = decode_speculative(
        prompt, apply_m, params, apply_d, params_d, max_length=36,
        speculative_lookahead=3,
    )
    np.testing.assert_array_equal(
        np.asarray(out.sequences), np.asarray(ref.sequences)
    )
