"""Device mesh construction.

TPU-native replacement for the reference's NCCL process groups + apex
`parallel_state` (`flash_attn/utils/distributed.py`,
`tests/models/test_gpt_parallel.py:39-42`).  A single
`jax.sharding.Mesh` with named axes plays the role of the data-parallel and
tensor-parallel groups; XLA compiles the collectives over ICI/DCN.

Axis conventions used throughout the package:
  - "data":  data parallel (batch dim)
  - "model": tensor parallel (heads / hidden shards)
  - "seq":   sequence parallel / ring attention (optional third axis)
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, model: int = 1, seq: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model * seq
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(data, model, seq)
    return Mesh(arr, ("data", "model", "seq"))


def default_mesh() -> Mesh:
    """All devices on the model axis (single-host TP)."""
    n = len(jax.devices())
    return make_mesh(1, n, 1)


@contextlib.contextmanager
def maybe_mesh(mesh):
    if mesh is None:
        yield
    else:
        with mesh:
            yield


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
