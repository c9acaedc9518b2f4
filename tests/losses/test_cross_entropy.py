"""Cross-entropy tests: smoothing, z-loss, ignore_index, logit scale, and
the vocab-parallel (TP) form — model: reference
`tests/losses/test_cross_entropy.py` + `test_cross_entropy_parallel.py`."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from flash_attn_tpu.losses.cross_entropy import CrossEntropyLoss, cross_entropy_loss


def ref_ce(logits, labels, smoothing=0.0, logit_scale=1.0, z_scale=0.0,
           ignore_index=-100):
    lf = logits.astype(jnp.float32) * logit_scale
    lse = jax.nn.logsumexp(lf, axis=-1)
    xl = jnp.take_along_axis(lf, jnp.clip(labels, 0)[:, None], -1)[:, 0]
    if smoothing > 0:
        sm = lf.mean(-1)
        losses = (1 - smoothing) * (lse - xl) + smoothing * (lse - sm)
    else:
        losses = lse - xl
    losses = losses + z_scale * lse * lse
    return jnp.where(labels != ignore_index, losses, 0.0)


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
@pytest.mark.parametrize("z_scale", [0.0, 1e-4])
def test_cross_entropy_matches_reference(smoothing, z_scale):
    rng = np.random.default_rng(0)
    n, v = 128, 500
    logits = jnp.asarray(rng.standard_normal((n, v)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, n), jnp.int32)
    labels = labels.at[::7].set(-100)  # ignore_index holes
    losses, z = cross_entropy_loss(
        logits, labels, label_smoothing=smoothing, lse_square_scale=z_scale
    )
    ref = ref_ce(logits, labels, smoothing, 1.0, z_scale)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    if z_scale:
        assert float(z.max()) > 0


def test_logit_scale():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((32, 100)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 100, 32), jnp.int32)
    losses, _ = cross_entropy_loss(logits, labels, logit_scale=0.5)
    ref = ref_ce(logits, labels, logit_scale=0.5)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_vocab_parallel_matches_single():
    """TP vocab-split CE (`losses/cross_entropy.py:18` process_group role)
    via shard_map over the model axis."""
    from jax.experimental.shard_map import shard_map

    rng = np.random.default_rng(2)
    n, v = 64, 512  # v split 4 ways
    logits = jnp.asarray(rng.standard_normal((n, v)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, n), jnp.int32)
    ref, _ = cross_entropy_loss(logits, labels, label_smoothing=0.1,
                                lse_square_scale=1e-4)

    mesh = Mesh(np.array(jax.devices()[:4]), ("model",))

    def local(lg, lb):
        losses, _ = cross_entropy_loss(
            lg, lb, label_smoothing=0.1, lse_square_scale=1e-4,
            axis_name="model",
        )
        return losses

    f = shard_map(local, mesh=mesh, in_specs=(P(None, "model"), P()),
                  out_specs=P())
    out = f(logits, labels)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_class_form_grads():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((16, 64)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 64, 16), jnp.int32)
    ce = CrossEntropyLoss(label_smoothing=0.05, reduction="none")

    g = jax.grad(lambda lg: jnp.sum(ce(lg, labels)))(logits)
    gr = jax.grad(lambda lg: jnp.sum(ref_ce(lg, labels, 0.05)))(logits)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-4, atol=1e-5)
