"""RMSNorm wrappers (counterpart of `flash_attn/ops/rms_norm.py`)."""

from flash_attn_tpu.ops.layer_norm import (  # noqa: F401
    dropout_add_rms_norm,
    rms_norm,
)

rms_norm_fn = rms_norm


class RMSNorm:
    """Module form (`ops/rms_norm.py:124`); parameters passed explicitly."""

    def __init__(self, hidden_size, eps=1e-6):
        self.hidden_size = hidden_size
        self.eps = eps

    def __call__(self, x, *, weight):
        return rms_norm(x, weight, self.eps)
