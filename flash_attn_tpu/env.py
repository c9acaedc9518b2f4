"""Runtime environment helpers.

The kernels in this package target TPU via Pallas/Mosaic.  On non-TPU
backends (CPU CI, the 8-virtual-device CPU mesh used for sharding tests) the
kernels run in Pallas interpreter mode so that the full test-suite is
executable anywhere.  This mirrors the reference's backend-switch env flag
(`flash_attn/flash_attn_interface.py:11-15`) but keyed off the JAX backend
instead of an env var.
"""

from __future__ import annotations

import functools
import os

import jax

_FORCE_INTERPRET = os.environ.get("FLASH_ATTN_TPU_FORCE_INTERPRET", "") == "1"


@functools.cache
def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def use_interpret() -> bool:
    """True when Pallas kernels must run in interpreter mode."""
    if _FORCE_INTERPRET:
        return True
    return not on_tpu()
