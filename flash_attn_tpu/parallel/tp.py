"""Tensor-parallel primitives.

Counterpart of the reference's explicit-collective TP stack:
`ColumnParallelLinear` / `RowParallelLinear` (`ops/fused_dense.py:166/206`),
async collective wrappers (`utils/distributed.py:18-103`), and the
sequence-parallel all-gather-overlap trick (`ops/fused_dense.py:27-117`).

Two complementary styles, both provided:

1. **GSPMD (default)** — modules annotate weights and activations with
   PartitionSpecs (`shard_param`); `jit` over a Mesh lets XLA insert and
   *overlap* the collectives (XLA's collective-matmul pass is the compiler
   version of the reference's hand-rolled async all_gather overlap).

2. **Explicit shard_map** — `column_parallel_linear` / `row_parallel_linear`
   below compute with explicit `psum` / `all_gather` / `psum_scatter`, for
   uses that need manual control (tests validating TP math, custom
   schedules).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def dense_kernel_init(scale: float = 0.02):
    return nn.initializers.normal(stddev=scale)


def shard_param(x, spec):
    """Best-effort sharding constraint; no-op outside a mesh context."""
    try:
        return jax.lax.with_sharding_constraint(x, P(*spec))
    except (ValueError, RuntimeError):
        return x


# ---------------------------------------------------------------------------
# Explicit-collective versions (run inside shard_map over axis "model").
# ---------------------------------------------------------------------------


def column_parallel_linear(x, kernel_shard, bias_shard=None,
                           sequence_parallel=False, axis_name="model"):
    """y_local = x @ W_local (+ b_local); output feature-sharded.

    With `sequence_parallel`, x arrives sequence-sharded and is
    all-gathered first (`FusedDenseFunc` fwd, `ops/fused_dense.py:63-75`;
    the overlap the reference hand-codes is done by XLA here).
    """
    if sequence_parallel:
        x = jax.lax.all_gather(x, axis_name, axis=1, tiled=True)
    y = jnp.einsum("...d,df->...f", x, kernel_shard)
    if bias_shard is not None:
        y = y + bias_shard
    return y


def row_parallel_linear(x_local, kernel_shard, bias=None,
                        sequence_parallel=False, axis_name="model"):
    """y = sum_ranks(x_local @ W_local) — allreduce, or reduce-scatter over
    the sequence dim when `sequence_parallel` (`RowParallelLinear:206`)."""
    y = jnp.einsum("...d,df->...f", x_local, kernel_shard)
    if sequence_parallel:
        y = jax.lax.psum_scatter(y, axis_name, scatter_dimension=1, tiled=True)
    else:
        y = jax.lax.psum(y, axis_name)
    if bias is not None:
        y = y + bias
    return y


def all_gather_raw(x, axis_name="model", axis=0):
    """`utils/distributed.py:18` — gather shards along `axis`."""
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=True)


def reduce_scatter_raw(x, axis_name="model", axis=0):
    """`utils/distributed.py:30`."""
    return jax.lax.psum_scatter(x, axis_name, scatter_dimension=axis, tiled=True)


def all_reduce_raw(x, axis_name="model"):
    """`utils/distributed.py:43`."""
    return jax.lax.psum(x, axis_name)


def get_dim_for_local_rank(dim: int, world_size: int, local_rank: int,
                           multiple_of: int = 1) -> int:
    """`utils/distributed.py:135` — size of this rank's shard of `dim`."""
    multiple = dim // multiple_of
    div = multiple // world_size
    mod = multiple % world_size
    local_multiple = div + int(local_rank < mod)
    return local_multiple * multiple_of
