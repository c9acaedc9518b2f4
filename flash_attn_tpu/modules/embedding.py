"""Embeddings (counterpart of `flash_attn/modules/embedding.py`).

`GPT2Embeddings:11` (word + learned position), with the vocab/column
parallel variants (`VocabParallelEmbedding:114`,
`ColumnParallelEmbedding:146`, `ParallelGPT2Embeddings:161`) realised as
PartitionSpec annotations on the embedding tables: GSPMD turns a
vocab-sharded lookup into the same gather + allreduce the reference
hand-codes.  `attend` supports weight tying with the LM head.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp


class GPT2Embeddings(nn.Module):
    embed_dim: int
    vocab_size: int
    max_position_embeddings: int = 0  # 0 -> no position embeddings (rotary)
    word_embed_proj_dim: Optional[int] = None  # OPT-style factorised embed
    dtype: Any = jnp.float32
    vocab_parallel: bool = False

    def setup(self):
        dim = self.word_embed_proj_dim or self.embed_dim
        # vocab_parallel sharding is applied via gpt_partition_specs +
        # device_put (GSPMD), not flax param boxing — keeps the tree plain.
        init = nn.initializers.normal(stddev=0.02)
        self.wte = nn.Embed(
            self.vocab_size, dim, embedding_init=init, dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        if self.word_embed_proj_dim is not None:
            self.project_in = nn.Dense(
                self.embed_dim, use_bias=False, dtype=self.dtype
            )
        if self.max_position_embeddings > 0:
            self.wpe = nn.Embed(
                self.max_position_embeddings, self.embed_dim,
                embedding_init=nn.initializers.normal(stddev=0.02),
                dtype=self.dtype, param_dtype=jnp.float32,
            )

    def __call__(self, input_ids, position_ids=None):
        b, s = input_ids.shape
        x = self.wte(input_ids)
        if self.word_embed_proj_dim is not None:
            x = self.project_in(x)
        if self.max_position_embeddings > 0:
            if position_ids is None:
                position_ids = jnp.arange(s, dtype=jnp.int32)[None, :]
            x = x + self.wpe(position_ids)
        return x

    def attend(self, hidden_states):
        """Tied-LM-head projection (token logits)."""
        logits = self.wte.attend(hidden_states)
        if self.word_embed_proj_dim is not None:
            # OPT-style project_out omitted: reference ties only wte
            pass
        return logits


VocabParallelEmbedding = GPT2Embeddings  # vocab_parallel=True
ParallelGPT2Embeddings = GPT2Embeddings
