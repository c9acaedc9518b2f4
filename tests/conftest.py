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


# ---------------------------------------------------------------------------
# `fast` tier: a curated ~3-minute smoke slice (`pytest -m fast`) — one
# representative parity case per kernel family plus the cheap whole-file
# suites.  Curated centrally here (node-id prefixes) so test files stay
# untouched; measured 197 s wall single-process on the dev box.
# ---------------------------------------------------------------------------
FAST_NODES = (
    "tests/kernels/test_flash_attn.py::test_flash_attn_output[64-128-256-False-bfloat16]",
    "tests/kernels/test_flash_attn.py::test_flash_attn_output[128-256-128-True-bfloat16]",
    "tests/kernels/test_flash_attn.py::test_flash_attn_backward[128-True]",
    "tests/kernels/test_varlen_sched.py::test_sched_matches_oracle[True]",
    "tests/kernels/test_kvcache.py::test_kvcache_basic[True-1]",
    "tests/kernels/test_flex.py::test_flex_mask_mod_causal",
    "tests/parallel/test_ring_attention.py::test_ring_matches_dense[True]",
    "tests/training/test_trainer.py::test_loss_decreases",
    "tests/layers/test_rotary.py::",
    "tests/ops/test_layer_norm.py::",
    "tests/losses/test_cross_entropy.py::",
)


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        nodeid = item.nodeid
        if any(nodeid == n or (n.endswith("::") and nodeid.startswith(n[:-2]))
               for n in FAST_NODES):
            item.add_marker(pytest.mark.fast)
