"""Activation ops (counterpart of `flash_attn/ops/activations.py`).

On TPU these compile to fused VPU code via XLA — the reference's
`torch.jit.script` wrappers exist to force the same fusion on CUDA, so the
TPU-native implementation is simply the math.  The tanh GELU variant
matches the reference's approximation exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bias_gelu(y, bias):
    """GELU(y + bias), tanh approximation (`activations.py:13`)."""
    x = y + bias
    return gelu_approx(x)


def gelu_approx(x):
    xf = x.astype(jnp.float32)
    out = 0.5 * xf * (
        1.0 + jnp.tanh(0.79788456 * xf * (1.0 + 0.044715 * xf * xf))
    )
    return out.astype(x.dtype)


def gelu_exact(x):
    """erf-form GELU (HF transformers' "gelu"; timm ViT default)."""
    import jax

    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(
        x.dtype)


def sqrelu_fwd(x):
    """Squared-ReLU (`activations.py:96`)."""
    r = jax.nn.relu(x)
    return r * r


def swiglu(x, y):
    """x * silu(y)... reference `swiglu_fwd: x * sigmoid(x) * y`."""
    return swiglu_fwd(x, y)


def swiglu_fwd(x, y):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype) * y
