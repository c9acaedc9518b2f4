"""BERT model (counterpart of `flash_attn/models/bert.py`, `BertModel:340`).

Post-norm encoder built from the same MHA/MLP modules; the padded-token
fast path uses the kernel's per-batch `seqused` lengths (the role of the
reference's unpad/varlen path, `bert_padding.py`).  Includes the pooler and
the pretraining heads (MLM transform + decoder tied to embeddings, NSP),
plus the HF weight remap (`remap_state_dict` in reference bert.py).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.models.common import canonical_to_flax, np_
from flash_attn_tpu.modules.block import Block, _Norm
from flash_attn_tpu.modules.mha import MHA
from flash_attn_tpu.modules.mlp import ACT2FN, Mlp
from flash_attn_tpu.ops.activations import gelu_approx


class BertEmbeddings(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        init = nn.initializers.normal(stddev=c.initializer_range)
        self.word_embeddings = nn.Embed(
            c.vocab_size, c.hidden_size, embedding_init=init,
            dtype=self.dtype, param_dtype=jnp.float32,
        )
        self.position_embeddings = nn.Embed(
            c.max_position_embeddings, c.hidden_size, embedding_init=init,
            dtype=self.dtype, param_dtype=jnp.float32,
        )
        self.token_type_embeddings = nn.Embed(
            c.type_vocab_size, c.hidden_size, embedding_init=init,
            dtype=self.dtype, param_dtype=jnp.float32,
        )
        self.norm = _Norm(eps=c.layer_norm_eps, dtype=self.dtype)

    def __call__(self, input_ids, token_type_ids=None, position_ids=None):
        b, s = input_ids.shape
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None, :]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = (
            self.word_embeddings(input_ids)
            + self.position_embeddings(position_ids)
            + self.token_type_embeddings(token_type_ids)
        )
        return self.norm(x)


class BertModel(nn.Module):
    """`BertModel:340` — embeddings + post-norm encoder + pooler."""

    config: Any
    add_pooling_layer: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        act = ACT2FN.get(getattr(c, "hidden_act", "gelu"), gelu_approx)
        import functools

        mixer_cls = functools.partial(
            MHA,
            embed_dim=c.hidden_size,
            num_heads=c.num_attention_heads,
            causal=False,
            dropout=c.attention_probs_dropout_prob,
            use_flash_attn=True,
            dtype=self.dtype,
        )
        mlp_cls = functools.partial(
            Mlp, hidden_features=c.intermediate_size, activation=act,
            dtype=self.dtype,
        )
        self.embeddings = BertEmbeddings(c, dtype=self.dtype)
        self.layers = [
            Block(
                mixer_cls=mixer_cls,
                mlp_cls=mlp_cls,
                prenorm=False,
                resid_dropout1=c.hidden_dropout_prob,
                resid_dropout2=c.hidden_dropout_prob,
                norm_eps=c.layer_norm_eps,
                dtype=self.dtype,
                name=f"layers_{i}",
            )
            for i in range(c.num_hidden_layers)
        ]
        if self.add_pooling_layer:
            self.pooler_dense = nn.Dense(c.hidden_size, dtype=self.dtype)

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, deterministic=True,
                 unpad_varlen: bool = False):
        """`unpad_varlen=True` runs the encoder on the packed
        (total_nnz, d) token stream — the reference's unpad pipeline
        (`bert.py:340` BertEncoder: unpad_input -> varlen attention ->
        pad_input): MLP/LN do total-token work and attention rides the
        scheduled packed kernel.  Needs a concrete (host) attention_mask;
        padded rows of the output are zeros (as the reference's repad)."""
        b, s = input_ids.shape
        h = self.embeddings(input_ids, token_type_ids, position_ids)
        mask = attention_mask.astype(bool) if attention_mask is not None else None
        if unpad_varlen and mask is not None:
            from flash_attn_tpu.utils.padding import pad_input, unpad_input

            hp, indices, cu_seqlens, max_s, _ = unpad_input(h, mask)
            hp = hp[None]  # (1, total_nnz, d) — packed stream
            for layer in self.layers:
                hp, _ = layer(hp, deterministic=deterministic,
                              cu_seqlens=cu_seqlens, max_seqlen=max_s)
            h = pad_input(hp[0], indices, b, s)
        else:
            for layer in self.layers:
                h, _ = layer(h, deterministic=deterministic,
                             key_padding_mask=mask)
        pooled = None
        if self.add_pooling_layer:
            pooled = jnp.tanh(self.pooler_dense(h[:, 0]))
        return h, pooled


class BertForPreTraining(nn.Module):
    """MLM + NSP heads over BertModel (reference `BertForPreTraining`)."""

    config: Any
    dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        self.bert = BertModel(c, dtype=self.dtype)
        self.transform_dense = nn.Dense(c.hidden_size, dtype=self.dtype)
        self.transform_norm = _Norm(eps=c.layer_norm_eps, dtype=self.dtype)
        self.decoder_bias = self.param(
            "decoder_bias", nn.initializers.zeros, (c.vocab_size,), jnp.float32
        )
        self.seq_relationship = nn.Dense(2, dtype=self.dtype)

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic=True):
        c = self.config
        act = ACT2FN.get(getattr(c, "hidden_act", "gelu"), gelu_approx)
        h, pooled = self.bert(
            input_ids, attention_mask, token_type_ids,
            deterministic=deterministic,
        )
        t = self.transform_norm(act(self.transform_dense(h)))
        logits = (
            self.bert.embeddings.word_embeddings.attend(t)
            + self.decoder_bias.astype(self.dtype)
        )
        nsp = self.seq_relationship(pooled)
        return logits, nsp


def remap_state_dict_hf_bert(state_dict, config):
    """HF BertModel -> flax params for our BertModel."""
    sd = {k: np_(v) for k, v in state_dict.items()}
    sd = {k.removeprefix("bert."): v for k, v in sd.items()}
    p = {
        "embeddings": {
            "word_embeddings": {
                "embedding": sd.pop("embeddings.word_embeddings.weight")
            },
            "position_embeddings": {
                "embedding": sd.pop("embeddings.position_embeddings.weight")
            },
            "token_type_embeddings": {
                "embedding": sd.pop("embeddings.token_type_embeddings.weight")
            },
            "norm": {
                "weight": sd.pop("embeddings.LayerNorm.weight"),
                "bias": sd.pop("embeddings.LayerNorm.bias"),
            },
        }
    }
    for l in range(config.num_hidden_layers):
        hf = f"encoder.layer.{l}."
        wq = sd.pop(hf + "attention.self.query.weight")
        wk = sd.pop(hf + "attention.self.key.weight")
        wv = sd.pop(hf + "attention.self.value.weight")
        bq = sd.pop(hf + "attention.self.query.bias")
        bk = sd.pop(hf + "attention.self.key.bias")
        bv = sd.pop(hf + "attention.self.value.bias")
        p[f"layers_{l}"] = {
            "mixer": {
                "Wqkv": {
                    "kernel": np.concatenate([wq, wk, wv], axis=0).T,
                    "bias": np.concatenate([bq, bk, bv], axis=0),
                },
                "out_proj": {
                    "kernel": sd.pop(hf + "attention.output.dense.weight").T,
                    "bias": sd.pop(hf + "attention.output.dense.bias"),
                },
            },
            "norm1": {
                "weight": sd.pop(hf + "attention.output.LayerNorm.weight"),
                "bias": sd.pop(hf + "attention.output.LayerNorm.bias"),
            },
            "mlp": {
                "fc1": {
                    "kernel": sd.pop(hf + "intermediate.dense.weight").T,
                    "bias": sd.pop(hf + "intermediate.dense.bias"),
                },
                "fc2": {
                    "kernel": sd.pop(hf + "output.dense.weight").T,
                    "bias": sd.pop(hf + "output.dense.bias"),
                },
            },
            "norm2": {
                "weight": sd.pop(hf + "output.LayerNorm.weight"),
                "bias": sd.pop(hf + "output.LayerNorm.bias"),
            },
        }
    if "pooler.dense.weight" in sd:
        p["pooler_dense"] = {
            "kernel": sd.pop("pooler.dense.weight").T,
            "bias": sd.pop("pooler.dense.bias"),
        }
    leftover = [k for k in sd if "position_ids" not in k]
    assert not leftover, f"unmapped: {leftover[:8]}"
    return p
