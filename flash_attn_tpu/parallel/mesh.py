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


_dist_initialized = False


def initialize_distributed(
    coordinator_address=None,
    num_processes=None,
    process_id=None,
    local_device_ids=None,
) -> bool:
    """Multi-host entry point: bring up JAX multi-process mode.

    The reference initialises an NCCL process group per launcher env
    (`tests/models/test_gpt_parallel.py:39-42`); the JAX counterpart is
    one `jax.distributed.initialize()` call per host BEFORE any other JAX
    use.  On TPU pods everything auto-detects; elsewhere pass
    coordinator_address ("host0:1234"), num_processes and process_id, or
    set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.

    Idempotent; returns True when the process is part of a multi-process
    run after the call.

    Two-host launch recipe (also in docs/multihost.md):
        # host 0                          # host 1
        JAX_COORDINATOR_ADDRESS=h0:1234   JAX_COORDINATOR_ADDRESS=h0:1234
        JAX_NUM_PROCESSES=2               JAX_NUM_PROCESSES=2
        JAX_PROCESS_ID=0                  JAX_PROCESS_ID=1
        python -m flash_attn_tpu.training.run --config cfg.yaml
    """
    import os

    global _dist_initialized
    if not _dist_initialized:
        addr = coordinator_address or os.environ.get(
            "JAX_COORDINATOR_ADDRESS")
        kw = {}
        if addr:
            kw = dict(
                coordinator_address=addr,
                num_processes=int(
                    num_processes
                    if num_processes is not None
                    else os.environ.get("JAX_NUM_PROCESSES", 1)),
                process_id=int(
                    process_id
                    if process_id is not None
                    else os.environ.get("JAX_PROCESS_ID", 0)),
            )
            if local_device_ids is not None:
                kw["local_device_ids"] = local_device_ids
        elif not os.environ.get("TPU_WORKER_HOSTNAMES"):
            # no coordinator configured and not on a TPU pod: single-process
            return False
        try:
            jax.distributed.initialize(**kw)
            _dist_initialized = True
        except RuntimeError:
            # already initialised (e.g. by the launcher)
            _dist_initialized = True
    return jax.process_count() > 1


def make_hybrid_mesh(
    *, dcn_data: int = 1, data: int = 1, model: int = 1, seq: int = 1,
    devices=None,
) -> Mesh:
    """Hybrid ICI x DCN mesh for multi-host runs.

    The outermost slices of the "data" axis cross hosts (DCN); "model" and
    "seq" stay inside each host's ICI domain, so TP/SP collectives —
    latency-sensitive all-gathers and reduce-scatters on every layer —
    never ride the slow inter-host network, while the data axis (one
    gradient all-reduce per step) absorbs the DCN hop.  This is the
    scaling-book recipe and the TPU counterpart of the reference's
    node-local TP process groups.

    In a real multi-process run the device order comes from
    `mesh_utils.create_hybrid_device_mesh` (honouring process locality);
    single-process (tests, simulation) falls back to a plain reshape with
    the data axis outermost, which has the same sharding semantics.
    """
    if devices is None:
        devices = jax.devices()
    n = dcn_data * data * model * seq
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    if dcn_data > 1 and jax.process_count() > 1:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (data, model, seq), (dcn_data, 1, 1), devices=devices)
        arr = arr.reshape(dcn_data * data, model, seq)
    else:
        arr = np.array(devices[:n]).reshape(dcn_data * data, model, seq)
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
