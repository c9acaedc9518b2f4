"""Fused dense / MLP ops and tensor-parallel linear layers.

API-parity layer for `flash_attn/ops/fused_dense.py` (`FusedDenseFunc:27`,
`ColumnParallelLinear:166`, `RowParallelLinear:206`, `FusedMLPFunc:249`,
`ParallelFusedMLP:613`) and the cuBLASLt extension it wraps
(`csrc/fused_dense_lib/fused_dense.cpp:210`).

On TPU there is nothing to hand-fuse: XLA fuses bias and activation
epilogues into the MXU matmul, so these are thin functional wrappers whose
value is (a) the familiar names, (b) the tensor-parallel collectives, which
map to `shard_map` + `psum/all_gather/psum_scatter` (see `parallel/tp.py`).
All functions are differentiable and jit/pjit-compatible.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from flash_attn_tpu.ops.activations import bias_gelu, gelu_approx, swiglu  # noqa: F401
from flash_attn_tpu.ops.activations import sqrelu_fwd as sqrelu  # noqa: F401
from flash_attn_tpu.parallel.tp import (
    all_gather_raw,
    all_reduce_raw,
    column_parallel_linear,
    reduce_scatter_raw,
    row_parallel_linear,
)

__all__ = [
    "fused_dense",
    "fused_mlp",
    "FusedDense",
    "FusedMLP",
    "ColumnParallelLinear",
    "RowParallelLinear",
]


def fused_dense(x, kernel, bias=None, activation=None):
    """Linear + optional bias + optional activation epilogue
    (`linear_act_forward`, `fused_dense.cpp:211`).  x: (..., in);
    kernel: (in, out)."""
    y = x @ kernel.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    if activation is not None:
        act = {"gelu_approx": gelu_approx, "gelu": jax.nn.gelu,
               "relu": jax.nn.relu, "sqrelu": sqrelu}[activation] \
            if isinstance(activation, str) else activation
        y = act(y)
    return y


def fused_mlp(x, kernel1, bias1, kernel2, bias2, activation="gelu_approx"):
    """Dense -> activation -> dense (`FusedMLPFunc:249`)."""
    h = fused_dense(x, kernel1, bias1, activation)
    return fused_dense(h, kernel2, bias2)


class FusedDense:
    """Module-style wrapper holding params explicitly (JAX-functional)."""

    def __init__(self, kernel, bias=None, activation=None):
        self.kernel, self.bias, self.activation = kernel, bias, activation

    def __call__(self, x):
        return fused_dense(x, self.kernel, self.bias, self.activation)


class FusedMLP:
    def __init__(self, kernel1, bias1, kernel2, bias2,
                 activation="gelu_approx"):
        self.params = (kernel1, bias1, kernel2, bias2)
        self.activation = activation

    def __call__(self, x):
        return fused_mlp(x, *self.params, activation=self.activation)


class ColumnParallelLinear:
    """Output-sharded linear (`ops/fused_dense.py:166`): the kernel shard
    lives on each device; with `sequence_parallel` the input is
    all-gathered along the sequence first.  Use inside `shard_map` with
    `axis_name` bound to the model axis."""

    def __init__(self, kernel_shard, bias_shard=None, *,
                 axis_name="model", sequence_parallel=False):
        self.kernel = kernel_shard
        self.bias = bias_shard
        self.axis_name = axis_name
        self.sequence_parallel = sequence_parallel

    def __call__(self, x):
        if self.sequence_parallel:
            x = all_gather_raw(x, self.axis_name, axis=1)
        return column_parallel_linear(x, self.kernel, self.bias)


class RowParallelLinear:
    """Input-sharded linear with output reduction (`ops/fused_dense.py:206`):
    all-reduce, or reduce-scatter along the sequence when
    `sequence_parallel`."""

    def __init__(self, kernel_shard, bias=None, *, axis_name="model",
                 sequence_parallel=False):
        self.kernel = kernel_shard
        self.bias = bias
        self.axis_name = axis_name
        self.sequence_parallel = sequence_parallel

    def __call__(self, x_local):
        y = x_local @ self.kernel.astype(x_local.dtype)
        if self.sequence_parallel:
            y = reduce_scatter_raw(y, self.axis_name, axis=1)
        else:
            y = all_reduce_raw(y, self.axis_name)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y