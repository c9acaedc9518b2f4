"""Fused dropout + residual-add + LayerNorm/RMSNorm.

Counterpart of the reference CUDA extension `csrc/layer_norm/` and its
wrappers (`flash_attn/ops/layer_norm.py`: `dropout_add_layer_norm:311`,
subset variant `:416`, parallel-residual `:531`; Triton twin
`ops/triton/layer_norm.py`).  These ops are HBM-bandwidth-bound; XLA fuses
the dropout + add + normalise chain into a single pass on TPU, so the
implementation is jnp math with the exact reference semantics:

  out = norm((x0 * rowscale) ∘ dropout + residual) * weight + bias
  prenorm=True additionally returns the pre-norm residual sum;
  residual_in_fp32 keeps the residual stream in fp32.

Dropout uses an explicit JAX PRNG key (functional, reproducible) instead of
torch's global RNG state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _norm(x, weight, bias, eps, is_rms):
    xf = x.astype(jnp.float32)
    if is_rms:
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + eps)
    else:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def layer_norm(x, weight, bias, epsilon=1e-5):
    return _norm(x, weight, bias, epsilon, is_rms=False).astype(x.dtype)


def rms_norm(x, weight, epsilon=1e-6, bias=None):
    """`flash_attn/ops/rms_norm.py:124` rms_norm_fn."""
    return _norm(x, weight, bias, epsilon, is_rms=True).astype(x.dtype)


def _dropout_add_norm(
    x0,
    residual,
    weight,
    bias,
    dropout_p,
    epsilon,
    rowscale,
    layerscale,
    prenorm,
    residual_in_fp32,
    is_rms,
    rng=None,
    x1=None,
):
    dtype = x0.dtype
    xf = x0.astype(jnp.float32)
    if layerscale is not None:
        xf = xf * layerscale.astype(jnp.float32)
    if rowscale is not None:
        xf = xf * rowscale.astype(jnp.float32)[..., None]
    mask = None
    if dropout_p > 0.0:
        assert rng is not None, "dropout requires an explicit PRNG key"
        mask = jax.random.bernoulli(rng, 1.0 - dropout_p, x0.shape)
        xf = jnp.where(mask, xf / (1.0 - dropout_p), 0.0)
    if x1 is not None:
        x1f = x1.astype(jnp.float32)
        if dropout_p > 0.0:
            mask1 = jax.random.bernoulli(
                jax.random.fold_in(rng, 1), 1.0 - dropout_p, x1.shape
            )
            x1f = jnp.where(mask1, x1f / (1.0 - dropout_p), 0.0)
        xf = xf + x1f
    if residual is not None:
        xf = xf + residual.astype(jnp.float32)
    res_dtype = jnp.float32 if residual_in_fp32 else dtype
    out = _norm(xf, weight, bias, epsilon, is_rms).astype(dtype)
    if prenorm:
        return out, xf.astype(res_dtype), mask
    return out, None, mask


def dropout_add_layer_norm(
    x0,
    residual,
    weight,
    bias,
    dropout_p,
    epsilon,
    rowscale=None,
    layerscale=None,
    prenorm=False,
    residual_in_fp32=False,
    return_dropout_mask=False,
    rng=None,
):
    """`ops/layer_norm.py:311` semantics, functional RNG."""
    out, res, mask = _dropout_add_norm(
        x0, residual, weight, bias, dropout_p, epsilon, rowscale, layerscale,
        prenorm, residual_in_fp32, is_rms=False, rng=rng,
    )
    results = (out,) + ((res,) if prenorm else ())
    if return_dropout_mask:
        results += (mask,)
    return results[0] if len(results) == 1 else results


def dropout_add_rms_norm(
    x0,
    residual,
    weight,
    bias,
    dropout_p,
    epsilon,
    rowscale=None,
    layerscale=None,
    prenorm=False,
    residual_in_fp32=False,
    return_dropout_mask=False,
    rng=None,
):
    out, res, mask = _dropout_add_norm(
        x0, residual, weight, bias, dropout_p, epsilon, rowscale, layerscale,
        prenorm, residual_in_fp32, is_rms=True, rng=rng,
    )
    results = (out,) + ((res,) if prenorm else ())
    if return_dropout_mask:
        results += (mask,)
    return results[0] if len(results) == 1 else results


def dropout_add_layer_norm_parallel_residual(
    x0,
    x1,
    residual,
    weight0,
    bias0,
    weight1,
    bias1,
    dropout_p,
    epsilon,
    prenorm=False,
    residual_in_fp32=False,
    rng=None,
    is_rms=False,
):
    """GPT-J-style dual-norm parallel residual (`ops/layer_norm.py:531`,
    kernels `csrc/layer_norm/ln_parallel_residual_*`): the summed residual
    stream is normalised twice (attn-input and mlp-input norms)."""
    out0, res, _ = _dropout_add_norm(
        x0, residual, weight0, bias0, dropout_p, epsilon, None, None,
        True, residual_in_fp32, is_rms=is_rms, rng=rng, x1=x1,
    )
    out1 = None
    if weight1 is not None:
        out1 = _norm(
            res.astype(jnp.float32), weight1, bias1, epsilon, is_rms
        ).astype(x0.dtype)
    if prenorm:
        return out0, out1, res
    return out0, out1


class DropoutAddLayerNorm:
    """Module form (`ops/layer_norm.py:765`).  Parameters are explicit
    pytrees (weight, bias) managed by the caller/flax module."""

    def __init__(self, hidden_size, prenorm=False, p=0.0, eps=1e-5,
                 residual_in_fp32=False):
        self.hidden_size = hidden_size
        self.prenorm = prenorm
        self.p = p
        self.eps = eps
        self.residual_in_fp32 = residual_in_fp32

    def __call__(self, x0, residual=None, *, weight, bias, rng=None):
        return dropout_add_layer_norm(
            x0, residual, weight, bias, self.p, self.eps,
            prenorm=self.prenorm, residual_in_fp32=self.residual_in_fp32,
            rng=rng,
        )


def dropout_add_layer_norm_subset(
    x0,
    residual,
    weight,
    bias,
    dropout_p,
    epsilon,
    layerscale=None,
    x0_subset=None,
    out_subset=None,
    rowscale_const=1.0,
    out_numrows=None,
    prenorm=False,
    residual_in_fp32=False,
    return_dropout_mask=False,
    rng=None,
):
    """Subset variant (`ops/layer_norm.py:416` DropoutAddLayerNormSubsetFn):
    `x0` holds only rows listed in `x0_subset` (1-based indices into the
    residual stream, 0 = absent) and the normalised output keeps only
    `out_subset` rows — the BERT unpadded-token path.  On TPU the gathers
    are XLA ops around the fused norm; autodiff works throughout.

    x0: (n0, d); residual: (n, d) or None; subsets: (n,) int32.
    """
    import jax.numpy as jnp

    n = residual.shape[0] if residual is not None else (
        x0.shape[0] if x0_subset is None else x0_subset.shape[0])
    d = x0.shape[-1]
    if x0_subset is not None:
        # scatter x0 rows into the full stream (0 = row absent)
        full = jnp.zeros((n, d), x0.dtype)
        idx = jnp.asarray(x0_subset, jnp.int32)
        present = idx > 0
        rows = jnp.clip(idx - 1, 0, x0.shape[0] - 1)
        full = jnp.where(present[:, None], x0[rows], 0)
        x0_full = full * rowscale_const
    else:
        x0_full = x0 * rowscale_const
    outs = dropout_add_layer_norm(
        x0_full, residual, weight, bias, dropout_p, epsilon,
        prenorm=prenorm, residual_in_fp32=residual_in_fp32,
        layerscale=layerscale,
        return_dropout_mask=return_dropout_mask, rng=rng,
    )
    out = outs[0] if isinstance(outs, tuple) else outs
    rest = outs[1:] if isinstance(outs, tuple) else ()
    if out_subset is not None:
        idx = jnp.asarray(out_subset, jnp.int32)
        keep = idx > 0
        m = out_numrows or n
        # compact by scattering stream row i to output row out_subset[i]-1
        # (dropped rows land in a scratch row past the end)
        dest = jnp.where(keep, idx - 1, m)
        out = (
            jnp.zeros((m + 1,) + out.shape[1:], out.dtype)
            .at[dest].set(out)[:m]
        )
    return (out, *rest) if rest else out
