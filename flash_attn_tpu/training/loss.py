"""LM loss computed in vocab chunks.

The naive trainer loss materialises (b*s, vocab) fp32 logits — at GPT-2
scale that is a multi-GB activation spike the reference's fused CE kernel
exists to avoid (`flash_attn/losses/cross_entropy.py` inplace_backward).
The TPU-native equivalent: compute the LM head *inside* the loss in
sequence chunks under `jax.checkpoint`, so neither forward nor backward
ever holds more than (chunk, vocab) logits; XLA fuses the per-chunk
matmul + log-softmax, and the backward recomputes each chunk's logits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from flash_attn_tpu.losses.cross_entropy import cross_entropy_loss


def lm_head_weight(model, params):
    """(vocab, d) output-projection weight and the muP logit multiplier."""
    p = params["params"] if "params" in params else params
    cfg = model.config
    tied = getattr(cfg, "tie_word_embeddings", True)
    if tied:
        w = p["transformer"]["embeddings"]["wte"]["embedding"]
    else:
        w = p["lm_head"]["kernel"].T
    mult = 1.0
    if getattr(cfg, "use_mup", False):
        mult = getattr(cfg, "mup_output_multiplier", 1.0)
    return w, mult


def chunked_lm_loss(
    model,
    params,
    batch,
    chunk_tokens: int = 16384,
    label_smoothing: float = 0.0,
    lse_square_scale: float = 0.0,
    ignore_index: int = -100,
):
    """Mean next-token loss of `batch` (b, s+1) int32 token ids.

    Runs the transformer once, then folds the LM head + cross-entropy over
    `chunk_tokens`-token chunks of the flattened hidden states.  With
    chunk_tokens <= 0 the full logits tensor is materialised (debug).
    """
    inputs, targets = batch[:, :-1], batch[:, 1:]
    hidden = model.apply(
        params, inputs, method=lambda m, ids: m.transformer(ids)
    )
    b, s, d = hidden.shape
    n = b * s
    h2 = hidden.reshape(n, d)
    t2 = targets.reshape(n)
    w, mult = lm_head_weight(model, params)

    if chunk_tokens <= 0 or chunk_tokens >= n:
        logits = (h2 @ w.T.astype(h2.dtype)).astype(jnp.float32) * mult
        losses, _ = cross_entropy_loss(
            logits, t2, label_smoothing=label_smoothing,
            lse_square_scale=lse_square_scale, ignore_index=ignore_index,
        )
        valid = (t2 != ignore_index).astype(jnp.float32)
        return jnp.sum(losses * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    nchunks = -(-n // chunk_tokens)
    n_pad = nchunks * chunk_tokens
    if n_pad != n:
        h2 = jnp.pad(h2, ((0, n_pad - n), (0, 0)))
        t2 = jnp.pad(t2, (0, n_pad - n), constant_values=ignore_index)
    hc = h2.reshape(nchunks, chunk_tokens, d)
    tc = t2.reshape(nchunks, chunk_tokens)

    @jax.checkpoint
    def chunk_fn(h_c, t_c):
        logits = (h_c @ w.T.astype(h_c.dtype)).astype(jnp.float32) * mult
        losses, _ = cross_entropy_loss(
            logits, t_c, label_smoothing=label_smoothing,
            lse_square_scale=lse_square_scale, ignore_index=ignore_index,
        )
        valid = (t_c != ignore_index).astype(jnp.float32)
        return jnp.sum(losses * valid), jnp.sum(valid)

    def body(carry, xs):
        h_c, t_c = xs
        ls, nv = chunk_fn(h_c, t_c)
        return (carry[0] + ls, carry[1] + nv), None

    (loss_sum, n_valid), _ = jax.lax.scan(body, (0.0, 0.0), (hc, tc))
    return loss_sum / jnp.maximum(n_valid, 1.0)
