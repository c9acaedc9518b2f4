"""Training callbacks + metrics.

Counterparts of `training/src/callbacks/` and `training/src/metrics/`:
SpeedMonitor (`speed_monitor.py:13`), FlopCount (`flop_count.py:14`),
NormMonitor, CausalityMonitor (`causality_monitor.py` — perturb future
tokens, assert past logits unchanged), Perplexity / NumTokens metrics.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


class SpeedMonitor:
    """steps/s and tokens/s over a sliding window."""

    def __init__(self, tokens_per_step: int):
        self.tokens_per_step = tokens_per_step
        self._t0 = None
        self._steps = 0

    def step(self):
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            self._steps = 0
            return {}
        self._steps += 1
        dt = now - self._t0
        return {
            "steps_per_s": self._steps / dt,
            "tokens_per_s": self._steps * self.tokens_per_step / dt,
        }


def model_flops_per_token(config) -> int:
    """6*N + attention flops per token (reference `flop_count.py` uses
    fvcore; the 6N approximation matches its output for transformers)."""
    n_embd = config.hidden_size
    n_layer = config.num_hidden_layers
    vocab = config.vocab_size
    seq = getattr(config, "n_positions", 1024) or 1024
    n_params = 12 * n_layer * n_embd * n_embd + vocab * n_embd
    attn = 12 * n_layer * n_embd * seq // 2  # causal
    return 6 * n_params + 2 * attn  # fwd+bwd


class FlopCount:
    def __init__(self, config, tokens_per_step: int):
        self.flops_per_step = model_flops_per_token(config) * tokens_per_step

    def tflops(self, steps_per_s: float) -> float:
        return self.flops_per_step * steps_per_s / 1e12


def global_norm(tree) -> float:
    return float(
        jnp.sqrt(
            sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                for x in jax.tree_util.tree_leaves(tree))
        )
    )


class NormMonitor:
    def __call__(self, params, grads):
        return {
            "param_norm": global_norm(params),
            "grad_norm": global_norm(grads),
        }


def causality_check(apply_fn, params, input_ids, pos: int, atol=1e-3) -> bool:
    """Perturb tokens after `pos`; logits at <= pos must be unchanged
    (`callbacks/causality_monitor.py`)."""
    logits = apply_fn(params, input_ids).logits
    perturbed = input_ids.at[:, pos + 1:].set(
        (input_ids[:, pos + 1:] + 1) % int(logits.shape[-1])
    )
    logits_p = apply_fn(params, perturbed).logits
    diff = jnp.abs(
        logits[:, : pos + 1].astype(jnp.float32)
        - logits_p[:, : pos + 1].astype(jnp.float32)
    ).max()
    return bool(diff <= atol)


class Perplexity:
    """Running perplexity (torchmetrics Perplexity counterpart)."""

    def __init__(self):
        self.total_nll = 0.0
        self.total_tokens = 0

    def update(self, loss_sum: float, n_tokens: int):
        self.total_nll += loss_sum
        self.total_tokens += n_tokens

    def compute(self) -> float:
        if self.total_tokens == 0:
            return float("nan")
        return float(np.exp(self.total_nll / self.total_tokens))


class NumTokens:
    """Monotone token counter that survives checkpoint resume."""

    def __init__(self, count: int = 0):
        self.count = count

    def update(self, n: int):
        self.count += n
