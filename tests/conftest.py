"""Test configuration.

Tests run on a virtual 8-device CPU mesh (Pallas kernels in interpreter
mode) so the full suite — including sharding/TP tests — executes on any
machine.  This replaces the reference's real-multi-GPU `torchrun` harness
(`tests/models/test_gpt_parallel.py:2`) with single-host multi-device
simulation.  Set FLASH_ATTN_TPU_TEST_BACKEND=tpu to run on real hardware.
"""

import os

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

if os.environ.get("FLASH_ATTN_TPU_TEST_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
