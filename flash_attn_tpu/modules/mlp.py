"""MLP blocks (counterpart of `flash_attn/modules/mlp.py`).

`Mlp:25` / `GatedMlp:99` as flax modules.  The reference's fused-bias-GELU
CUDA epilogues (`FusedMLP`, cuBLASLt, N16) are fusion hints XLA applies
automatically on TPU — matmul + bias + activation compile into one MXU pass
with a fused epilogue, so `FusedMLP is Mlp` here by construction.

Tensor-parallel variants (`ParallelMLP:54`, `ParallelGatedMlp:139`) are the
same modules with weight PartitionSpecs: fc1 column-sharded, fc2
row-sharded over the "model" mesh axis (GSPMD inserts the reduce).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from flash_attn_tpu.ops.activations import gelu_approx, sqrelu_fwd, swiglu_fwd
from flash_attn_tpu.parallel.tp import dense_kernel_init, shard_param

ACT2FN = {
    "gelu_approx": gelu_approx,
    "gelu": gelu_approx,
    "gelu_new": gelu_approx,
    "relu": lambda x: jnp.maximum(x, 0),
    "sqrelu": sqrelu_fwd,
    "sigmoid": lambda x: 1.0 / (1.0 + jnp.exp(-x)),
    "silu": lambda x: x * (1.0 / (1.0 + jnp.exp(-x.astype(jnp.float32)))).astype(x.dtype),
}


class Mlp(nn.Module):
    hidden_features: int
    out_features: Optional[int] = None
    activation: Callable = gelu_approx
    bias1: bool = True
    bias2: bool = True
    dtype: jnp.dtype = jnp.float32
    tensor_parallel: bool = False  # column/row shard fc1/fc2 over "model"

    @nn.compact
    def __call__(self, x):
        out_features = self.out_features or x.shape[-1]
        y = nn.Dense(
            self.hidden_features,
            use_bias=self.bias1,
            dtype=self.dtype,
            kernel_init=dense_kernel_init(),
            name="fc1",
        )(x)
        if self.tensor_parallel:
            y = shard_param(y, ("data", None, "model"))
        y = self.activation(y)
        y = nn.Dense(
            out_features,
            use_bias=self.bias2,
            dtype=self.dtype,
            kernel_init=dense_kernel_init(),
            name="fc2",
        )(y)
        return y


class GatedMlp(nn.Module):
    """`GatedMlp:99` — fc1 produces 2*hidden (gate ‖ up), gated activation."""

    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    activation: Callable = jnp.multiply  # "glu" default; swiglu via config
    bias1: bool = True
    bias2: bool = True
    multiple_of: int = 128
    dtype: jnp.dtype = jnp.float32
    tensor_parallel: bool = False

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        out_features = self.out_features or in_features
        hidden_features = self.hidden_features
        if hidden_features is None:
            # multiple_of rounding applies only to the derived 8/3 default
            # (`modules/mlp.py:117` reference); explicit sizes are exact.
            hidden_features = int(8 * in_features / 3)
            hidden_features = (
                (hidden_features + self.multiple_of - 1)
                // self.multiple_of * self.multiple_of
            )
        y = nn.Dense(
            2 * hidden_features,
            use_bias=self.bias1,
            dtype=self.dtype,
            kernel_init=dense_kernel_init(),
            name="fc1",
        )(x)
        gate, up = jnp.split(y, 2, axis=-1)
        if self.activation is swiglu_fwd or self.activation == "swiglu":
            y = swiglu_fwd(gate, up)
        else:
            y = self.activation(gate) * up
        y = nn.Dense(
            out_features,
            use_bias=self.bias2,
            dtype=self.dtype,
            kernel_init=dense_kernel_init(),
            name="fc2",
        )(y)
        return y


# Fused aliases: XLA fuses bias+activation epilogues on TPU (see module
# docstring) — kept for API parity with `ops/fused_dense.py`.
FusedMLP = Mlp
ParallelMLP = Mlp
ParallelGatedMlp = GatedMlp
