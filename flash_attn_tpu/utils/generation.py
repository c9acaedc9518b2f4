"""Generation runtime: KV-cache decode loop, sampling, speculative decoding.

Counterpart of `flash_attn/utils/generation.py`: `InferenceParams:24` (in
modules/mha.py here), `decode:99` (prefill + 1-token steps, greedy/top-k/
top-p/min-p sampling `sample:40`), CUDA-graph decode
(`DecodingCGCache:606` / `capture_graph:693`), speculative decoding
(`sample_speculative:209`, `decode_speculative:269`), `GenerationMixin:566`.

TPU design: instead of CUDA-graph capture, the whole decode loop is one
`jax.lax.scan` inside a single jit — the compiled program replays with zero
dispatch overhead, buffers donated so cache updates are in-place.  This is
the XLA-native equivalent of graph capture.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.modules.mha import InferenceParams


@dataclasses.dataclass
class GenerationOutput:
    sequences: Any  # (b, prompt + generated)
    scores: Any = None  # (steps, b, vocab) when requested


def modify_logits_for_top_k_filtering(logits, top_k):
    """`generation.py:52` — set everything below the k-th logit to -inf."""
    kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
    return jnp.where(logits < kth, -jnp.inf, logits)


def modify_logits_for_top_p_filtering(logits, top_p):
    """`generation.py:60` — nucleus filtering."""
    if top_p <= 0.0 or top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)  # ascending
    cumprobs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    # keep the smallest set whose prob mass >= top_p (from the top)
    cutoff_mask = cumprobs <= (1.0 - top_p)
    thresholds = jnp.where(cutoff_mask, sorted_logits, -jnp.inf).max(
        axis=-1, keepdims=True
    )
    return jnp.where(logits <= thresholds, -jnp.inf, logits)


def modify_logits_for_min_p_filtering(logits, min_p):
    """`generation.py:73` — min-p filtering."""
    if min_p <= 0.0 or min_p >= 1.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    max_prob = probs.max(axis=-1, keepdims=True)
    return jnp.where(probs < min_p * max_prob, -jnp.inf, logits)


def sample(logits, rng, top_k=1, top_p=0.0, min_p=0.0, temperature=1.0):
    """Sample next token (`generation.py:40` semantics)."""
    if top_k == 1 and top_p == 0.0 and min_p == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / max(temperature, 1e-6)
    if top_k > 0:
        logits = modify_logits_for_top_k_filtering(logits, top_k)
    if min_p > 0.0:
        logits = modify_logits_for_min_p_filtering(logits, min_p)
    if top_p > 0.0:
        logits = modify_logits_for_top_p_filtering(logits, top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def allocate_inference_cache(max_batch_size, max_seqlen, batch_size=None):
    """`generation.py:589` — empty cache container; layers allocate lazily."""
    b = batch_size or max_batch_size
    return InferenceParams(
        max_seqlen=max_seqlen,
        max_batch_size=max_batch_size,
        lengths_per_sample=jnp.zeros((b,), jnp.int32),
    )


def decode(
    input_ids,
    apply_fn: Callable,
    params,
    max_length: int,
    *,
    top_k: int = 1,
    top_p: float = 0.0,
    min_p: float = 0.0,
    temperature: float = 1.0,
    eos_token_id: Optional[int] = None,
    teacher_outputs=None,
    rng=None,
    return_scores: bool = False,
    jit: bool = True,
):
    """Greedy/sampling decode with KV cache (`generation.py:99`).

    apply_fn(params, input_ids, inference_params) -> object with
    .logits (b, s, vocab) and .inference_params.  The prefill and the whole
    token-by-token loop are compiled into one program (lax.scan).
    """
    b, prompt_len = input_ids.shape
    steps = max_length - prompt_len
    assert steps > 0
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    teacher = (
        jnp.asarray(teacher_outputs, jnp.int32)
        if teacher_outputs is not None
        else None
    )

    def run(params, input_ids, rng):
        ip = allocate_inference_cache(b, max_length, b)
        out = apply_fn(params, input_ids, ip)
        logits0 = out.logits[:, -1].astype(jnp.float32)
        ip = out.inference_params
        rng, sub = jax.random.split(rng)
        if teacher is not None and teacher.shape[1] > prompt_len:
            tok0 = teacher[:, prompt_len]
        else:
            tok0 = sample(logits0, sub, top_k, top_p, min_p, temperature)
        finished0 = (
            tok0 == eos_token_id
            if eos_token_id is not None
            else jnp.zeros((b,), bool)
        )

        def step(carry, i):
            tok, ip, rng, finished = carry
            out = apply_fn(params, tok[:, None], ip)
            logits = out.logits[:, -1].astype(jnp.float32)
            rng, sub = jax.random.split(rng)
            if teacher is not None:
                nxt = jnp.where(
                    prompt_len + 1 + i < teacher.shape[1],
                    teacher[:, jnp.minimum(prompt_len + 1 + i,
                                           teacher.shape[1] - 1)],
                    sample(logits, sub, top_k, top_p, min_p, temperature),
                )
            else:
                nxt = sample(logits, sub, top_k, top_p, min_p, temperature)
            if eos_token_id is not None:
                nxt = jnp.where(finished, eos_token_id, nxt)
                finished = finished | (nxt == eos_token_id)
            return (nxt, out.inference_params, rng, finished), (
                nxt, logits if return_scores else jnp.zeros((b, 0)),
            )

        (_, _, _, _), (toks, scores) = jax.lax.scan(
            step, (tok0, ip, rng, finished0), jnp.arange(steps - 1)
        )
        seq = jnp.concatenate(
            [input_ids, tok0[:, None], jnp.swapaxes(toks, 0, 1)], axis=1
        )
        return seq, (jnp.concatenate([logits0[None], scores], axis=0)
                     if return_scores else None)

    if jit:
        run = jax.jit(run)
    seq, scores = run(params, jnp.asarray(input_ids, jnp.int32), rng)
    return GenerationOutput(sequences=seq, scores=scores)


def sample_speculative(logits, logits_draft, tokens_draft, rng,
                       top_k=1, top_p=0.0, min_p=0.0, temperature=1.0):
    """Speculative rejection sampling (`generation.py:209`).

    logits: (b, n+1, v) target model; logits_draft: (b, n, v);
    tokens_draft: (b, n).  Returns (tokens (b, n+1), num_accepted (b,)).
    Runs the standard accept/bonus scheme in a vectorised, jit-able form.
    """
    b, n, v = logits_draft.shape
    logits = logits.astype(jnp.float32) / max(temperature, 1e-6)
    logits_draft = logits_draft.astype(jnp.float32) / max(temperature, 1e-6)
    if top_k > 1:
        logits = modify_logits_for_top_k_filtering(logits, top_k)
        logits_draft = modify_logits_for_top_k_filtering(logits_draft, top_k)
    if top_p > 0.0:
        logits = modify_logits_for_top_p_filtering(logits, top_p)
        logits_draft = modify_logits_for_top_p_filtering(logits_draft, top_p)
    p = jax.nn.softmax(logits, axis=-1)  # (b, n+1, v)
    q = jax.nn.softmax(logits_draft, axis=-1)  # (b, n, v)

    rng, r_accept, r_resample, r_bonus = jax.random.split(rng, 4)
    tok_idx = tokens_draft[..., None]
    p_tok = jnp.take_along_axis(p[:, :n], tok_idx, axis=-1)[..., 0]
    q_tok = jnp.take_along_axis(q, tok_idx, axis=-1)[..., 0]
    if top_k == 1 and top_p == 0.0:
        # greedy target: accept iff draft token == argmax
        accept = tokens_draft == jnp.argmax(logits[:, :n], axis=-1)
    else:
        u = jax.random.uniform(r_accept, (b, n))
        accept = u < jnp.minimum(1.0, p_tok / jnp.maximum(q_tok, 1e-9))
    # number of leading accepts
    accepted_prefix = jnp.cumprod(accept.astype(jnp.int32), axis=-1)
    num_accepted = accepted_prefix.sum(axis=-1)  # (b,)

    # resample at the first rejection from max(p - q, 0)
    first_rej = jnp.minimum(num_accepted, n - 1)
    p_rej = jnp.take_along_axis(
        p[:, :n], first_rej[:, None, None].repeat(v, -1), axis=1
    )[:, 0]
    q_rej = jnp.take_along_axis(
        q, first_rej[:, None, None].repeat(v, -1), axis=1
    )[:, 0]
    resid = jnp.maximum(p_rej - q_rej, 0.0)
    resid = resid / jnp.maximum(resid.sum(-1, keepdims=True), 1e-9)
    tok_resample = jax.random.categorical(
        r_resample, jnp.log(jnp.maximum(resid, 1e-30)), axis=-1
    ).astype(jnp.int32)
    if top_k == 1 and top_p == 0.0:
        tok_resample = jnp.argmax(p[:, :n], axis=-1).astype(jnp.int32)
        tok_resample = jnp.take_along_axis(
            tok_resample, first_rej[:, None], axis=1
        )[:, 0]
    # bonus token when everything accepted
    tok_bonus = (
        jnp.argmax(p[:, n], axis=-1).astype(jnp.int32)
        if top_k == 1 and top_p == 0.0
        else jax.random.categorical(
            r_bonus, jnp.log(jnp.maximum(p[:, n], 1e-30)), axis=-1
        ).astype(jnp.int32)
    )

    # assemble output tokens: accepted draft tokens, then resample/bonus
    out = jnp.where(
        jnp.arange(n)[None, :] < num_accepted[:, None], tokens_draft, 0
    )
    all_accepted = num_accepted == n
    nxt = jnp.where(all_accepted, tok_bonus, tok_resample)
    out = jnp.concatenate([out, jnp.zeros((b, 1), jnp.int32)], axis=1)
    out = jnp.where(
        jnp.arange(n + 1)[None, :] == num_accepted[:, None], nxt[:, None], out
    )
    return out, num_accepted


def decode_speculative(
    input_ids,
    apply_fn: Callable,
    params,
    apply_fn_draft: Callable,
    params_draft,
    max_length: int,
    *,
    speculative_lookahead: int = 3,
    top_k: int = 1,
    top_p: float = 0.0,
    temperature: float = 1.0,
    rng=None,
    max_seqlen: Optional[int] = None,
):
    """Speculative decoding with a draft model (`generation.py:269`).

    Batch size 1 (reference `decode_speculative` restriction).  The draft
    model proposes `speculative_lookahead` tokens autoregressively; the
    target model scores them in one forward; `sample_speculative` keeps the
    accepted prefix plus one corrected/bonus token.  Both models keep KV
    caches whose lengths are rewound to the committed prefix after each
    round — rejected rows are simply overwritten later (functional caches,
    no copy).
    """
    input_ids = jnp.asarray(input_ids, jnp.int32)
    b, prompt_len = input_ids.shape
    assert b == 1, "speculative decoding supports batch_size=1 (reference)"
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    smax = max_seqlen or (max_length + speculative_lookahead + 1)

    def fresh_cache():
        return allocate_inference_cache(b, smax, b)

    def run(fn, prms, ip, toks, length):
        ip = ip.replace(lengths_per_sample=jnp.full((b,), length, jnp.int32))
        out = fn(prms, toks, ip)
        return out.logits.astype(jnp.float32), out.inference_params

    # prefill both models on the prompt
    ip_m = ip_d = None
    logits_m, ip_m = run(apply_fn, params, fresh_cache(), input_ids, 0)
    _, ip_d = run(apply_fn_draft, params_draft, fresh_cache(), input_ids, 0)
    rng, sub = jax.random.split(rng)
    pending = sample(logits_m[:, -1], sub, top_k, top_p, 0.0, temperature)
    committed = [int(pending[0])]
    fed_m = fed_d = prompt_len  # tokens each cache has absorbed

    while prompt_len + len(committed) < max_length:
        n = min(speculative_lookahead,
                max_length - prompt_len - len(committed))
        # --- draft proposes n tokens (feeding any not-yet-fed committed) ---
        to_feed = committed[fed_d - prompt_len:]  # unfed committed tokens
        draft_tokens = []
        draft_logits = []
        cur = jnp.asarray([to_feed], jnp.int32)
        for i in range(n):
            lg, ip_d = run(apply_fn_draft, params_draft, ip_d, cur, fed_d)
            fed_d += cur.shape[1]
            rng, sub = jax.random.split(rng)
            t = sample(lg[:, -1], sub, top_k, top_p, 0.0, temperature)
            draft_tokens.append(t)
            draft_logits.append(lg[:, -1])
            cur = t[:, None]
        tokens_draft = jnp.stack(draft_tokens, axis=1)  # (1, n)
        logits_draft = jnp.stack(draft_logits, axis=1)  # (1, n, v)

        # --- target scores [unfed committed ... + drafts] in one forward ---
        to_feed_m = committed[fed_m - prompt_len:]
        main_in = jnp.concatenate(
            [jnp.asarray([to_feed_m], jnp.int32), tokens_draft], axis=1
        )
        lg_m, ip_m = run(apply_fn, params, ip_m, main_in, fed_m)
        fed_m += main_in.shape[1]
        logits_m = lg_m[:, -(n + 1):]

        rng, sub = jax.random.split(rng)
        out, num_acc = sample_speculative(
            logits_m, logits_draft, tokens_draft, sub,
            top_k=top_k, top_p=top_p, temperature=temperature,
        )
        na = int(num_acc[0])
        new_toks = [int(t) for t in np.asarray(out[0, :na + 1])]
        committed.extend(new_toks)
        # rewind caches to the committed prefix (rows past it are stale and
        # will be overwritten by the next rounds' writes)
        fed_m = min(fed_m, prompt_len + len(committed) - 1)
        fed_d = min(fed_d, prompt_len + len(committed) - 1)

    seq = jnp.concatenate(
        [input_ids,
         jnp.asarray([committed[:max_length - prompt_len]], jnp.int32)],
        axis=1,
    )
    return GenerationOutput(sequences=seq)


class GenerationMixin:
    """`generation.py:566` — adds .generate to a model wrapper that holds
    (module, params)."""

    def generate(self, input_ids, max_length, **kwargs):
        return decode(
            input_ids,
            lambda p, ids, ip: self.module.apply(
                p, ids, inference_params=ip
            ),
            self.params,
            max_length,
            **kwargs,
        )
