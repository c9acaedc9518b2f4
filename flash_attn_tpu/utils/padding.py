"""Varlen pack/unpack glue.

TPU-native counterpart of the reference's `flash_attn/bert_padding.py`
(`unpad_input:98`, `pad_input:204`, `IndexFirstAxis:8`,
`unpad_input_for_concatenated_sequences:131`).

These helpers produce data-dependent shapes, so they are host-side utilities:
call them *outside* `jit` (data preparation / test fixtures), exactly how the
reference uses them as glue around varlen kernels.  Inside-jit code paths use
the `seqused`/`cu_seqlens` scalar tensors instead.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def index_first_axis(x, indices):
    """Gather rows of `x` (flattened over the first two dims) at `indices`."""
    return jnp.take(x, indices, axis=0)


def index_put_first_axis(values, indices, first_axis_dim):
    """Scatter `values` into a zero tensor of leading dim `first_axis_dim`."""
    out = jnp.zeros((first_axis_dim, *values.shape[1:]), dtype=values.dtype)
    return out.at[indices].set(values)


def unpad_input(hidden_states, attention_mask, unused_mask=None):
    """Remove padding tokens.

    Arguments:
        hidden_states: (batch, seqlen, ...)
        attention_mask: (batch, seqlen), bool / int, 1 = valid token.
        unused_mask: (batch, seqlen), bool / int, 1 = allocated but unused.

    Returns:
        hidden_states: (total_nnz, ...) with used + unused tokens kept.
        indices: (total_nnz,) flat indices of kept tokens.
        cu_seqlens: (batch + 1,) int32 cumulative (used+unused) lengths.
        max_seqlen_in_batch: int
        seqused: (batch,) int32 number of *used* tokens per sequence.
    """
    attention_mask = np.asarray(attention_mask).astype(bool)
    all_masks = (
        attention_mask
        if unused_mask is None
        else attention_mask | np.asarray(unused_mask).astype(bool)
    )
    seqlens_in_batch = all_masks.sum(axis=-1, dtype=np.int32)
    used_seqlens_in_batch = attention_mask.sum(axis=-1, dtype=np.int32)
    indices = np.nonzero(all_masks.reshape(-1))[0]
    max_seqlen_in_batch = int(seqlens_in_batch.max()) if seqlens_in_batch.size else 0
    cu_seqlens = np.zeros(len(seqlens_in_batch) + 1, dtype=np.int32)
    np.cumsum(seqlens_in_batch, out=cu_seqlens[1:])
    batch, seqlen = all_masks.shape
    flat = jnp.reshape(hidden_states, (batch * seqlen, *hidden_states.shape[2:]))
    return (
        index_first_axis(flat, jnp.asarray(indices)),
        jnp.asarray(indices, dtype=jnp.int32),
        jnp.asarray(cu_seqlens),
        max_seqlen_in_batch,
        jnp.asarray(used_seqlens_in_batch),
    )


def pad_input(hidden_states, indices, batch, seqlen):
    """Inverse of :func:`unpad_input`.

    Arguments:
        hidden_states: (total_nnz, ...)
        indices: (total_nnz,) flat indices into (batch*seqlen).
    Returns:
        (batch, seqlen, ...)
    """
    out = index_put_first_axis(hidden_states, indices, batch * seqlen)
    return jnp.reshape(out, (batch, seqlen, *hidden_states.shape[1:]))


def unpad_input_for_concatenated_sequences(hidden_states, attention_mask_in_length):
    """Varlen unpad where each row packs multiple sequences.

    Counterpart of `bert_padding.py:131`: `attention_mask_in_length` is
    (batch, seqlen) holding the length of each packed sequence in that row
    (zeros elsewhere).
    """
    length = np.asarray(attention_mask_in_length)
    batch, seqlen = length.shape
    real_num = (length > 0).sum(axis=-1)
    seqlens_in_batch = length.reshape(-1)[np.nonzero(length.reshape(-1))[0]].astype(
        np.int32
    )
    # Tokens used per row = sum of the packed sequence lengths in that row.
    used_per_row = length.sum(axis=-1).astype(np.int32)
    row_mask = (
        np.arange(seqlen)[None, :] < used_per_row[:, None]
    )  # (batch, seqlen) keep-prefix mask
    indices = np.nonzero(row_mask.reshape(-1))[0]
    max_seqlen_in_batch = int(seqlens_in_batch.max()) if seqlens_in_batch.size else 0
    cu_seqlens = np.zeros(len(seqlens_in_batch) + 1, dtype=np.int32)
    np.cumsum(seqlens_in_batch, out=cu_seqlens[1:])
    flat = jnp.reshape(hidden_states, (batch * seqlen, *hidden_states.shape[2:]))
    del real_num
    return (
        index_first_axis(flat, jnp.asarray(indices)),
        jnp.asarray(indices, dtype=jnp.int32),
        jnp.asarray(cu_seqlens),
        max_seqlen_in_batch,
    )
