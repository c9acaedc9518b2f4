"""Transformer blocks.

Counterpart of `flash_attn/modules/block.py` (`Block:21` pre/post-norm with
fused dropout-add-LN, `ParallelBlock:259` GPT-J-style parallel residual).
The residual stream is optionally kept in fp32 (`residual_in_fp32`) exactly
as the reference's fused LN kernels do.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from flash_attn_tpu.ops.layer_norm import _norm


class _Norm(nn.Module):
    """LayerNorm or RMSNorm with fp32 math (our fused-op semantics)."""

    is_rms: bool = False
    eps: float = 1e-5
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (dim,), jnp.float32)
        bias = (
            self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
            if (self.use_bias and not self.is_rms)
            else None
        )
        return _norm(x, weight, bias, self.eps, self.is_rms).astype(self.dtype)


class Block(nn.Module):
    """Pre-norm (default) or post-norm block (`block.py:21`).

    Call: (hidden_states, residual) -> (hidden_states, residual) in the
    pre-norm convention; pass residual=None for the first block.
    """

    mixer_cls: Callable  # () -> nn.Module (MHA)
    mlp_cls: Callable  # () -> nn.Module
    prenorm: bool = True
    resid_dropout1: float = 0.0
    resid_dropout2: float = 0.0
    # stochastic depth on the residual branches (timm ViT drop_path role,
    # reference `create_block:262` drop_path1/drop_path2)
    drop_path1: float = 0.0
    drop_path2: float = 0.0
    residual_in_fp32: bool = False
    rms_norm: bool = False
    norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, residual=None, inference_params=None,
                 deterministic=True, **mixer_kwargs):
        norm1 = _Norm(is_rms=self.rms_norm, eps=self.norm_eps,
                      dtype=self.dtype, name="norm1")
        norm2 = _Norm(is_rms=self.rms_norm, eps=self.norm_eps,
                      dtype=self.dtype, name="norm2")
        mixer = self.mixer_cls(name="mixer")
        mlp = self.mlp_cls(name="mlp")

        def dropped(x, rate, rng_name):
            if rate == 0.0 or deterministic:
                return x
            return nn.Dropout(rate, deterministic=False)(
                x, rng=self.make_rng("dropout")
            )

        def drop_path(x, rate):
            if rate == 0.0 or deterministic:
                return x
            import jax

            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - rate,
                (x.shape[0],) + (1,) * (x.ndim - 1))
            return jnp.where(keep, x / (1.0 - rate), 0.0)

        if self.prenorm:
            # residual = drop_path(drop(h)) + residual ; h = norm1(residual)
            res_dtype = jnp.float32 if self.residual_in_fp32 else hidden_states.dtype
            d1 = drop_path(
                dropped(hidden_states, self.resid_dropout1, "dropout"),
                self.drop_path1)
            residual = (
                d1.astype(res_dtype)
                if residual is None
                else d1.astype(res_dtype) + residual
            )
            h = norm1(residual.astype(self.dtype))
            if inference_params is not None:
                h, inference_params = mixer(
                    h, inference_params=inference_params, **mixer_kwargs
                )
            else:
                h = mixer(h, deterministic=deterministic, **mixer_kwargs)
            d2 = drop_path(dropped(h, self.resid_dropout2, "dropout"),
                           self.drop_path2)
            residual = d2.astype(res_dtype) + residual
            h = norm2(residual.astype(self.dtype))
            h = mlp(h)
            if inference_params is not None:
                return h, residual, inference_params
            return h, residual
        else:
            # post-norm: h = norm1(drop(mixer(h)) + h); h = norm2(drop(mlp(h)) + h)
            if inference_params is not None:
                m, inference_params = mixer(
                    hidden_states, inference_params=inference_params,
                    **mixer_kwargs,
                )
            else:
                m = mixer(hidden_states, deterministic=deterministic,
                          **mixer_kwargs)
            h = norm1(dropped(m, self.resid_dropout1, "dropout") + hidden_states)
            h = norm2(dropped(mlp(h), self.resid_dropout2, "dropout") + h)
            if inference_params is not None:
                return h, None, inference_params
            return h, None


class ParallelBlock(nn.Module):
    """GPT-J/NeoX/Falcon parallel attn+MLP block (`block.py:259`).

    out = mlp(norm2(x)) + attn(norm1(x)); residual accumulated in fp32
    optionally; `tied_norm` uses a single norm for both branches.
    """

    mixer_cls: Callable
    mlp_cls: Callable
    tied_norm: bool = False
    resid_dropout1: float = 0.0
    resid_dropout2: float = 0.0
    residual_in_fp32: bool = False
    rms_norm: bool = False
    norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states1, hidden_states2=None, residual=None,
                 inference_params=None, deterministic=True, **mixer_kwargs):
        norm1 = _Norm(is_rms=self.rms_norm, eps=self.norm_eps,
                      dtype=self.dtype, name="norm1")
        norm2 = (
            norm1
            if self.tied_norm
            else _Norm(is_rms=self.rms_norm, eps=self.norm_eps,
                       dtype=self.dtype, name="norm2")
        )
        mixer = self.mixer_cls(name="mixer")
        mlp = self.mlp_cls(name="mlp")

        res_dtype = jnp.float32 if self.residual_in_fp32 else hidden_states1.dtype
        # residual = h1 + h2 + residual (dropout omitted when deterministic)
        acc = hidden_states1.astype(res_dtype)
        if hidden_states2 is not None:
            acc = acc + hidden_states2.astype(res_dtype)
        residual = acc if residual is None else acc + residual
        hn1 = norm1(residual.astype(self.dtype))
        hn2 = norm2(residual.astype(self.dtype)) if not self.tied_norm else hn1
        if inference_params is not None:
            attn_out, inference_params = mixer(
                hn1, inference_params=inference_params, **mixer_kwargs
            )
        else:
            attn_out = mixer(hn1, deterministic=deterministic, **mixer_kwargs)
        mlp_out = mlp(hn2)
        if inference_params is not None:
            return attn_out, mlp_out, residual, inference_params
        return attn_out, mlp_out, residual
