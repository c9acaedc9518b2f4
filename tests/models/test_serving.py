"""Continuous-batching engine tests: mixed-length requests through a live
decode batch must reproduce per-request greedy decode exactly."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.models.gpt import GPTLMHeadModel

pytestmark = pytest.mark.slow  # heavy interpret-mode loops; smoke tier skips

from flash_attn_tpu.serving import ServingEngine
from flash_attn_tpu.utils.generation import decode


def make_model():
    from transformers import GPT2Config

    cfg = GPT2Config(
        n_embd=128, n_head=4, n_layer=2, vocab_size=311, n_positions=512,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    model = GPTLMHeadModel(cfg, dtype=jnp.float32)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 311, (1, 16)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), ids)
    return model, params


def test_continuous_batching_matches_single_decode():
    model, params = make_model()
    apply_fn = lambda p, x, ip: model.apply(p, x, inference_params=ip)

    rng = np.random.default_rng(1)
    prompts = [
        rng.integers(0, 311, (n,)).astype(np.int32)
        for n in (7, 19, 33, 12, 25)
    ]
    max_new = [6, 11, 9, 14, 8]

    # reference: per-request greedy decode with the plain loop
    expected = []
    for prompt, mn in zip(prompts, max_new):
        out = decode(
            jnp.asarray(prompt)[None], apply_fn, params,
            max_length=len(prompt) + mn, jit=False,
        )
        expected.append(list(np.asarray(out.sequences[0, len(prompt):])))

    # engine: max_batch=2 forces queueing + continuous admission
    eng = ServingEngine(
        apply_fn, params, max_batch=2, max_seqlen=128, chunk_steps=4,
        prefill_buckets=(16, 32, 64),
    )
    uids = [eng.submit(p, max_new_tokens=mn)
            for p, mn in zip(prompts, max_new)]
    results = eng.run()

    assert eng.stats.finished == len(prompts)
    for uid, exp in zip(uids, expected):
        assert results[uid] == exp, (uid, results[uid], exp)


def test_engine_eos_stops_early():
    model, params = make_model()
    apply_fn = lambda p, x, ip: model.apply(p, x, inference_params=ip)
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, 311, (9,)).astype(np.int32)

    # find the greedy continuation and use its 3rd token as "eos"
    out = decode(jnp.asarray(prompt)[None], apply_fn, params,
                 max_length=9 + 8, jit=False)
    cont = list(np.asarray(out.sequences[0, 9:]))
    eos = cont[2]

    eng = ServingEngine(apply_fn, params, max_batch=2, max_seqlen=128,
                        chunk_steps=4, prefill_buckets=(16,))
    uid = eng.submit(prompt, max_new_tokens=8, eos_token_id=int(eos))
    results = eng.run()
    assert results[uid] == cont[:3]
    assert results[uid][-1] == eos


def test_serving_over_data_mesh():
    """Mesh-sharded continuous batching (multi-host analogue on the virtual
    mesh) must reproduce the single-device engine exactly."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs 2 devices")

    model, params = make_model()
    apply_fn = lambda p, x, ip: model.apply(p, x, inference_params=ip)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, 311, (n,)).astype(np.int32)
               for n in (7, 19, 12, 25)]

    def run(mesh=None):
        eng = ServingEngine(apply_fn, params, max_batch=2, max_seqlen=128,
                            chunk_steps=4, prefill_buckets=(32,), mesh=mesh)
        uids = [eng.submit(p_, max_new_tokens=8) for p_ in prompts]
        results = eng.run()
        return [results[u] for u in uids]

    ref = run()
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    with mesh:
        sharded = run(mesh)
    assert sharded == ref


def test_speculative_serving_matches_greedy():
    """Draft+verify inside the continuous-batching engine (round-3 gap:
    speculative was batch-1-only and never integrated with serving).
    Greedy acceptance is exact, so tokens must be IDENTICAL to the
    non-speculative engine — for a well-matched draft (same model) and a
    mismatched one (different init, mostly rejected)."""
    model, params = make_model()
    apply_fn = lambda p, x, ip: model.apply(p, x, inference_params=ip)

    # a differently-initialised draft: proposals mostly rejected
    ids0 = jnp.asarray(
        np.random.default_rng(0).integers(0, 311, (1, 16)), jnp.int32)
    params_draft_bad = model.init(jax.random.PRNGKey(7), ids0)

    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, 311, (n,)).astype(np.int32)
               for n in (7, 19, 12)]
    max_new = [6, 9, 11]

    eng0 = ServingEngine(apply_fn, params, max_batch=2, max_seqlen=128,
                         chunk_steps=4, prefill_buckets=(16, 32))
    uids0 = [eng0.submit(p, max_new_tokens=mn)
             for p, mn in zip(prompts, max_new)]
    expected = eng0.run()

    for draft_params in (params, params_draft_bad):
        eng = ServingEngine(
            apply_fn, params, max_batch=2, max_seqlen=128, chunk_steps=4,
            prefill_buckets=(16, 32),
            apply_fn_draft=apply_fn, params_draft=draft_params,
            speculative_lookahead=3,
        )
        uids = [eng.submit(p, max_new_tokens=mn)
                for p, mn in zip(prompts, max_new)]
        results = eng.run()
        assert eng.stats.finished == len(prompts)
        for u0, u in zip(uids0, uids):
            assert results[u] == expected[u0], (results[u], expected[u0])
