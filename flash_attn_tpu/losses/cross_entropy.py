"""Cross-entropy with label smoothing, z-loss, and vocab-parallel TP.

Counterpart of `flash_attn/losses/cross_entropy.py:9` `CrossEntropyLoss`
(backed by the Triton kernels in `ops/triton/cross_entropy.py:25/:104`).
Features: `ignore_index`, `reduction`, `label_smoothing`, `logit_scale`,
`lse_square_scale` (z-loss), and **tensor-parallel vocab-split CE** — the
reference allreduces max/sumexp inside the kernel wrapper
(`ops/triton/cross_entropy.py:149`); here the same math runs under
`shard_map` with `jax.lax.pmax/psum` over the model axis when `axis_name`
is given.

`inplace_backward` is a CUDA memory trick with no TPU meaning; autodiff
through this function is already a single fused backward pass under XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits,
    labels,
    label_smoothing: float = 0.0,
    logit_scale: float = 1.0,
    lse_square_scale: float = 0.0,
    ignore_index: int = -100,
    axis_name: str | None = None,
):
    """Per-token losses.

    logits: (n, vocab) — under `axis_name`, the *local* vocab shard.
    labels: (n,) global vocab indices.
    Returns (losses (n,), z_losses (n,)) like the reference function.
    """
    n, v_local = logits.shape
    logits = logits.astype(jnp.float32)
    if logit_scale != 1.0:
        logits = logits * logit_scale

    if axis_name is not None:
        rank = jax.lax.axis_index(axis_name)
        vocab_start = rank * v_local
    else:
        vocab_start = 0

    m_local = jnp.max(logits, axis=-1)
    if axis_name is not None:
        m = jax.lax.pmax(m_local, axis_name)
    else:
        m = m_local
    sumexp = jnp.sum(jnp.exp(logits - m[:, None]), axis=-1)
    if axis_name is not None:
        sumexp = jax.lax.psum(sumexp, axis_name)
    lse = m + jnp.log(sumexp)

    # gather the label logit (zero when outside the local shard)
    idx_local = labels - vocab_start
    in_shard = (idx_local >= 0) & (idx_local < v_local)
    idx_safe = jnp.clip(idx_local, 0, v_local - 1)
    x_label = jnp.take_along_axis(logits, idx_safe[:, None], axis=-1)[:, 0]
    x_label = jnp.where(in_shard, x_label, 0.0)
    if axis_name is not None:
        x_label = jax.lax.psum(x_label, axis_name)

    if label_smoothing > 0.0:
        sum_logits = jnp.sum(logits, axis=-1)
        if axis_name is not None:
            sum_logits = jax.lax.psum(sum_logits, axis_name)
            v_total = v_local * jax.lax.axis_size(axis_name)
        else:
            v_total = v_local
        smooth = sum_logits / v_total
        losses = (1.0 - label_smoothing) * (lse - x_label) + label_smoothing * (
            lse - smooth
        )
    else:
        losses = lse - x_label

    z_losses = lse_square_scale * lse * lse
    losses = losses + z_losses

    valid = labels != ignore_index
    losses = jnp.where(valid, losses, 0.0)
    z_losses = jnp.where(valid, z_losses, 0.0)
    return losses, z_losses


class CrossEntropyLoss:
    """Module form of `losses/cross_entropy.py:9`."""

    def __init__(
        self,
        ignore_index: int = -100,
        reduction: str = "mean",
        label_smoothing: float = 0.0,
        logit_scale: float = 1.0,
        lse_square_scale: float = 0.0,
        inplace_backward: bool = False,  # accepted for parity; no-op on TPU
        axis_name: str | None = None,
        return_z_loss: bool = False,
    ):
        assert reduction in ("mean", "none", "sum")
        self.ignore_index = ignore_index
        self.reduction = reduction
        self.label_smoothing = label_smoothing
        self.logit_scale = logit_scale
        self.lse_square_scale = lse_square_scale
        self.axis_name = axis_name
        self.return_z_loss = return_z_loss

    def __call__(self, logits, labels):
        losses, z_losses = cross_entropy_loss(
            logits,
            labels,
            label_smoothing=self.label_smoothing,
            logit_scale=self.logit_scale,
            lse_square_scale=self.lse_square_scale,
            ignore_index=self.ignore_index,
            axis_name=self.axis_name,
        )
        if self.reduction == "mean":
            nvalid = jnp.maximum(jnp.sum(labels != self.ignore_index), 1)
            loss = jnp.sum(losses) / nvalid
            z_loss = jnp.sum(z_losses) / nvalid
        elif self.reduction == "sum":
            loss = jnp.sum(losses)
            z_loss = jnp.sum(z_losses)
        else:
            loss, z_loss = losses, z_losses
        if self.return_z_loss:
            return loss, z_loss
        return loss
