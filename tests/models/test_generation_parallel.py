"""Tensor-parallel generation parity (reference
`tests/models/test_gpt_generation_parallel.py` role, on the virtual CPU
mesh instead of torchrun ranks): greedy decode with TP-sharded params must
produce the same tokens as the single-device decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy interpret-mode loops; smoke tier skips

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flash_attn_tpu.models.gpt import GPTLMHeadModel, gpt_partition_specs
from flash_attn_tpu.utils.generation import decode


def make_model(tp=False, mesh=None):
    from transformers import GPT2Config

    cfg = GPT2Config(
        n_embd=128, n_head=4, n_layer=2, vocab_size=512, n_positions=256,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    cfg.tensor_parallel = tp
    if mesh is not None:
        cfg.attn_mesh = mesh
    return GPT2Config, cfg


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_tp_generation_matches_single():
    _, cfg = make_model()
    model = GPTLMHeadModel(cfg, dtype=jnp.float32)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 512, (2, 12)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), ids)
    apply_fn = lambda p, x, ip: model.apply(p, x, inference_params=ip)
    ref = decode(ids, apply_fn, params, max_length=28, jit=False)

    # TP: shard the same params over the model axis; GSPMD inserts the
    # collectives (the Column/RowParallel pattern of `fused_dense.py:166`)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("data", "model"))
    _, cfg_tp = make_model(tp=True, mesh=None)
    model_tp = GPTLMHeadModel(cfg_tp, dtype=jnp.float32)
    specs = gpt_partition_specs(params)
    params_tp = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
    apply_tp = lambda p, x, ip: model_tp.apply(p, x, inference_params=ip)
    with mesh:
        out = decode(
            jax.device_put(ids, NamedSharding(mesh, P())),
            apply_tp, params_tp, max_length=28, jit=True,
        )
    np.testing.assert_array_equal(
        np.asarray(out.sequences), np.asarray(ref.sequences)
    )
