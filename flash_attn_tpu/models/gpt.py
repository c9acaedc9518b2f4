"""Config-driven GPT model family skeleton.

Counterpart of `flash_attn/models/gpt.py`: factory functions
(`create_mixer_cls:62`, `create_mlp_cls:123`, `create_block:262`),
`GPTModel:409`, `GPTLMHeadModel:577` (tied embeddings), HF remap
(`remap_state_dict_hf_gpt2:930`), and the TP checkpoint resharding
(`shard_state_dict_tp:698` / `combine_state_dicts_tp:814` — realised here
as PartitionSpec trees + `jax.device_put`, since GSPMD checkpoints reshard
by construction).

The config object is `transformers.GPT2Config` with the same extended
attributes the reference reads (rms_norm, rotary_emb_fraction, n_head_kv,
parallel_block, multiple_of, …) so every model family (LLaMA/OPT/Falcon/
GPT-J/NeoX/BigCode/Baichuan/BTLM) maps onto this one skeleton via a config
converter, exactly like the reference.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from flash_attn_tpu.modules.block import Block, ParallelBlock, _Norm
from flash_attn_tpu.modules.embedding import GPT2Embeddings
from flash_attn_tpu.modules.mha import MHA, InferenceParams
from flash_attn_tpu.modules.mlp import ACT2FN, GatedMlp, Mlp
from flash_attn_tpu.ops.activations import gelu_approx, sqrelu_fwd, swiglu_fwd


def _cfg(config, name, default=None):
    return getattr(config, name, default)


def create_mixer_cls(config, layer_idx: int, dtype):
    """`models/gpt.py:62`."""
    head_dim = _cfg(config, "head_dim",
                    config.hidden_size // config.num_attention_heads)
    rotary_dim = (
        int(_cfg(config, "rotary_emb_fraction", 0.0) * head_dim)
    )
    window = _cfg(config, "window_size", (-1, -1))
    return functools.partial(
        MHA,
        embed_dim=config.hidden_size,
        num_heads=config.num_attention_heads,
        num_heads_kv=_cfg(config, "n_head_kv"),
        head_dim=_cfg(config, "head_dim"),
        qkv_proj_bias=_cfg(config, "qkv_proj_bias", True),
        out_proj_bias=_cfg(config, "out_proj_bias", True),
        dropout=_cfg(config, "attn_pdrop", 0.0),
        softmax_scale=(
            head_dim ** (-0.5) * _cfg(config, "mup_attn_multiplier", 1.0)
            if _cfg(config, "use_mup", False)
            else None
        ),
        causal=True,
        layer_idx=layer_idx,
        rotary_emb_dim=rotary_dim,
        rotary_emb_base=_cfg(config, "rotary_emb_base", 10000.0),
        rotary_emb_scale_base=_cfg(config, "rotary_emb_scale_base"),
        rotary_emb_interleaved=_cfg(config, "rotary_emb_interleaved", False),
        use_flash_attn=_cfg(config, "use_flash_attn", True),
        window_size=tuple(window),
        softcap=_cfg(config, "attn_softcap", 0.0),
        use_alibi=_cfg(config, "use_alibi", False),
        dtype=dtype,
        tensor_parallel=_cfg(config, "tensor_parallel", False),
        mesh=_cfg(config, "attn_mesh"),
        shard_seq_axis=_cfg(config, "attn_seq_axis"),
        shard_seq_ring=_cfg(config, "attn_seq_ring", False),
    )


def create_mlp_cls(config, dtype):
    """`models/gpt.py:123`."""
    act = config.activation_function
    inner = _cfg(config, "n_inner") or 4 * config.hidden_size
    bias1 = _cfg(config, "mlp_fc1_bias", True)
    bias2 = _cfg(config, "mlp_fc2_bias", True)
    tp = _cfg(config, "tensor_parallel", False)
    if act in ("glu", "swiglu", "geglu"):
        activation = {
            "glu": lambda x: 1.0 / (1.0 + jnp.exp(-x)),
            "swiglu": swiglu_fwd,
            "geglu": gelu_approx,
        }[act]
        if act == "swiglu":
            activation = swiglu_fwd
        return functools.partial(
            GatedMlp,
            hidden_features=inner,
            activation=activation if act != "glu" else ACT2FN["sigmoid"],
            bias1=bias1,
            bias2=bias2,
            multiple_of=_cfg(config, "multiple_of", 128),
            dtype=dtype,
            tensor_parallel=tp,
        )
    activation = ACT2FN.get(act, gelu_approx)
    if act == "sqrelu":
        activation = sqrelu_fwd
    return functools.partial(
        Mlp,
        hidden_features=inner,
        activation=activation,
        bias1=bias1,
        bias2=bias2,
        dtype=dtype,
        tensor_parallel=tp,
    )


def create_block(config, layer_idx: int, dtype):
    """`models/gpt.py:262`."""
    mixer_cls = create_mixer_cls(config, layer_idx, dtype)
    mlp_cls = create_mlp_cls(config, dtype)
    common = dict(
        resid_dropout1=(
            _cfg(config, "embd_pdrop", 0.0)
            if layer_idx == 0
            else _cfg(config, "resid_pdrop", 0.0)
        ),
        resid_dropout2=_cfg(config, "resid_pdrop", 0.0),
        residual_in_fp32=_cfg(config, "residual_in_fp32", False),
        rms_norm=_cfg(config, "rms_norm", False),
        norm_eps=_cfg(config, "layer_norm_epsilon", 1e-5),
        dtype=dtype,
    )
    block_cls = ParallelBlock if _cfg(config, "parallel_block", False) \
        else Block
    if _cfg(config, "remat_blocks", False):
        # per-layer activation checkpointing (rematerialise each block in
        # the backward; the Lightning `gradient_checkpointing` role) —
        # training-only flag, never set on decode paths.  `remat_policy`
        # picks what the backward may keep: "none" recomputes the whole
        # block (max memory saving), "dots" keeps matmul outputs and
        # recomputes only elementwise/norm/attention (cheap recompute:
        # the MXU work is saved, so counted MFU barely drops while the
        # activation footprint still shrinks enough for larger batches).
        policy = {
            "none": None,
            "dots": jax.checkpoint_policies.dots_saveable,
            "dots_no_batch":
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        }[_cfg(config, "remat_policy", "none")]
        block_cls = nn.remat(block_cls, policy=policy)
    if _cfg(config, "parallel_block", False):
        return functools.partial(
            block_cls,
            mixer_cls=mixer_cls,
            mlp_cls=mlp_cls,
            tied_norm=_cfg(config, "parallel_block_tied_norm", False),
            **common,
        )
    return functools.partial(
        block_cls,
        mixer_cls=mixer_cls,
        mlp_cls=mlp_cls,
        prenorm=_cfg(config, "prenorm", True),
        **common,
    )


@dataclass
class CausalLMOutput:
    logits: Any
    inference_params: Optional[InferenceParams] = None
    hidden_states: Any = None


class GPTModel(nn.Module):
    """`GPTModel:409` — embeddings + N blocks + final norm."""

    config: Any
    dtype: Any = jnp.float32

    def setup(self):
        config = self.config
        self.embeddings = GPT2Embeddings(
            embed_dim=config.hidden_size,
            vocab_size=config.vocab_size,
            max_position_embeddings=(
                0
                if _cfg(config, "rotary_emb_fraction", 0.0) > 0
                or _cfg(config, "use_alibi", False)
                or _cfg(config, "no_abs_pos_emb", False)
                else config.max_position_embeddings
            ),
            word_embed_proj_dim=_cfg(config, "word_embed_proj_dim"),
            dtype=self.dtype,
            vocab_parallel=_cfg(config, "tensor_parallel", False),
        )
        self.layers = [
            create_block(config, i, self.dtype)(name=f"layers_{i}")
            for i in range(config.num_hidden_layers)
        ]
        self.ln_f = _Norm(
            is_rms=_cfg(config, "rms_norm", False),
            eps=_cfg(config, "layer_norm_epsilon", 1e-5),
            dtype=self.dtype,
        )

    def __call__(self, input_ids, position_ids=None, inference_params=None,
                 deterministic=True):
        config = self.config
        parallel_block = _cfg(config, "parallel_block", False)
        prenorm = _cfg(config, "prenorm", True)
        if position_ids is None and inference_params is not None:
            position_ids = (
                inference_params.lengths_per_sample[:, None]
                + jnp.arange(input_ids.shape[1], dtype=jnp.int32)[None, :]
            )
        hidden_states = self.embeddings(input_ids, position_ids)
        residual = None
        hidden_states2 = None

        for block in self.layers:
            if parallel_block:
                if inference_params is not None:
                    hidden_states, hidden_states2, residual, inference_params = block(
                        hidden_states, hidden_states2, residual,
                        inference_params=inference_params,
                    )
                else:
                    hidden_states, hidden_states2, residual = block(
                        hidden_states, hidden_states2, residual,
                        **({} if deterministic
                           else {"deterministic": False}),
                    )
            else:
                if inference_params is not None:
                    hidden_states, residual, inference_params = block(
                        hidden_states, residual,
                        inference_params=inference_params,
                    )
                else:
                    hidden_states, residual = block(
                        hidden_states, residual,
                        **({} if deterministic
                           else {"deterministic": False}),
                    )

        ln_f = self.ln_f
        if prenorm:
            res_dtype = (
                jnp.float32
                if _cfg(config, "residual_in_fp32", False)
                else hidden_states.dtype
            )
            acc = hidden_states.astype(res_dtype)
            if parallel_block and hidden_states2 is not None:
                acc = acc + hidden_states2.astype(res_dtype)
            residual = acc if residual is None else acc + residual
            hidden_states = ln_f(residual.astype(self.dtype))
        else:
            hidden_states = ln_f(hidden_states)

        if inference_params is not None:
            inference_params = inference_params.replace(
                lengths_per_sample=inference_params.lengths_per_sample
                + input_ids.shape[1]
            )
            return hidden_states, inference_params
        return hidden_states


class GPTLMHeadModel(nn.Module):
    """`GPTLMHeadModel:577` — GPTModel + (optionally tied) LM head."""

    config: Any
    dtype: Any = jnp.float32

    def setup(self):
        config = self.config
        self.transformer = GPTModel(config, dtype=self.dtype)
        if not _cfg(config, "tie_word_embeddings", True):
            self.lm_head = nn.Dense(
                config.vocab_size,
                use_bias=_cfg(config, "lm_head_bias", False),
                dtype=self.dtype,
                kernel_init=nn.initializers.normal(stddev=0.02),
            )

    def __call__(self, input_ids, position_ids=None, inference_params=None,
                 deterministic=True, num_last_tokens: int = 0):
        config = self.config
        out = self.transformer(
            input_ids, position_ids=position_ids,
            inference_params=inference_params, deterministic=deterministic,
        )
        if inference_params is not None:
            hidden_states, inference_params = out
        else:
            hidden_states = out
        if num_last_tokens > 0:
            hidden_states = hidden_states[:, -num_last_tokens:]

        if _cfg(config, "tie_word_embeddings", True):
            logits = self.transformer.embeddings.attend(hidden_states)
        else:
            logits = self.lm_head(hidden_states)
        mult = _cfg(config, "mup_output_multiplier", 1.0) if _cfg(
            config, "use_mup", False) else 1.0
        if mult != 1.0:
            logits = logits * mult
        return CausalLMOutput(logits=logits, inference_params=inference_params)


# ---------------------------------------------------------------------------
# Tensor-parallel partition specs (the GSPMD form of shard_state_dict_tp /
# combine_state_dicts_tp, `models/gpt.py:698/814`).
# ---------------------------------------------------------------------------


def gpt_partition_specs(params):
    """PartitionSpec pytree for TP over the "model" mesh axis.

    Column-parallel: Wqkv / fc1 kernels sharded on the output dim.
    Row-parallel: out_proj / fc2 kernels sharded on the input dim.
    Embeddings vocab-sharded.  Everything else replicated.
    """

    def spec_for(path, x):
        names = [getattr(k, "key", str(k)) for k in path]
        joined = "/".join(names)
        if x.ndim == 2:
            if "Wqkv" in joined or "fc1" in joined or "Wq" in joined or "Wkv" in joined:
                return P(None, "model")
            if "out_proj" in joined or "fc2" in joined:
                return P("model", None)
            if joined.endswith("wte/embedding"):
                return P("model", None)
        if x.ndim == 1:
            if any(s in joined for s in ("Wqkv/bias", "fc1/bias")):
                return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params_tp(params, mesh):
    """Reshard a replicated param tree for TP execution
    (TPU-native `shard_state_dict_tp`)."""
    from jax.sharding import NamedSharding

    specs = gpt_partition_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def combine_params_tp(params):
    """Gather TP-sharded params to host replicas
    (TPU-native `combine_state_dicts_tp:814`)."""
    return jax.tree_util.tree_map(lambda x: jax.device_get(x), params)


# ---------------------------------------------------------------------------
# HF weight remap (`remap_state_dict_hf_gpt2`, models/gpt.py:930)
# ---------------------------------------------------------------------------


def remap_state_dict_hf_gpt2(state_dict, config):
    """Map a HuggingFace GPT-2 torch state dict (numpy arrays) onto our
    flax param tree."""
    import numpy as np

    def np_(t):
        return np.asarray(t)

    params = {"transformer": {"embeddings": {}, "ln_f": {}}}
    tr = params["transformer"]
    tr["embeddings"]["wte"] = {
        "embedding": np_(state_dict["transformer.wte.weight"])
    }
    if "transformer.wpe.weight" in state_dict:
        tr["embeddings"]["wpe"] = {
            "embedding": np_(state_dict["transformer.wpe.weight"])
        }
    tr["ln_f"]["weight"] = np_(state_dict["transformer.ln_f.weight"])
    tr["ln_f"]["bias"] = np_(state_dict["transformer.ln_f.bias"])
    for i in range(config.num_hidden_layers):
        pre = f"transformer.h.{i}."
        layer = {
            "norm1": {
                "weight": np_(state_dict[pre + "ln_1.weight"]),
                "bias": np_(state_dict[pre + "ln_1.bias"]),
            },
            "norm2": {
                "weight": np_(state_dict[pre + "ln_2.weight"]),
                "bias": np_(state_dict[pre + "ln_2.bias"]),
            },
            "mixer": {
                # HF GPT-2 uses Conv1D: weight is (in, out) — matches our
                # flax Dense kernel layout directly.
                "Wqkv": {
                    "kernel": np_(state_dict[pre + "attn.c_attn.weight"]),
                    "bias": np_(state_dict[pre + "attn.c_attn.bias"]),
                },
                "out_proj": {
                    "kernel": np_(state_dict[pre + "attn.c_proj.weight"]),
                    "bias": np_(state_dict[pre + "attn.c_proj.bias"]),
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": np_(state_dict[pre + "mlp.c_fc.weight"]),
                    "bias": np_(state_dict[pre + "mlp.c_fc.bias"]),
                },
                "fc2": {
                    "kernel": np_(state_dict[pre + "mlp.c_proj.weight"]),
                    "bias": np_(state_dict[pre + "mlp.c_proj.bias"]),
                },
            },
        }
        tr[f"layers_{i}"] = layer
    return params
