"""BERT parity vs HF (model: reference `tests/models/test_bert.py` —
compare last hidden state at non-padded positions)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from flash_attn_tpu.models.bert import BertModel, remap_state_dict_hf_bert


def test_bert_hf_parity():
    from transformers import BertConfig, BertModel as HFBert

    cfg = BertConfig(
        vocab_size=523, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=512,
        max_position_embeddings=128, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = HFBert(cfg).eval()
    params = {"params": remap_state_dict_hf_bert(hf.state_dict(), cfg)}
    model = BertModel(cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    b, s = 2, 48
    ids = rng.integers(0, cfg.vocab_size, (b, s))
    lengths = np.array([48, 33])
    mask = (np.arange(s)[None, :] < lengths[:, None]).astype(np.int64)

    with torch.no_grad():
        ref = hf(
            torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    out, pooled = model.apply(
        params, jnp.asarray(ids, jnp.int32), attention_mask=jnp.asarray(mask)
    )
    out = np.asarray(out)
    # compare only valid positions (HF computes garbage at padded rows)
    err = 0.0
    for i in range(b):
        err = max(err, np.abs(out[i, :lengths[i]] - ref[i, :lengths[i]]).max())
    assert err < 2e-3, err
    assert pooled.shape == (b, cfg.hidden_size)


def test_bert_unpadded_varlen_matches_padded():
    """The packed unpad pipeline (reference `bert.py:340` BertEncoder
    unpad_input -> varlen attention -> pad_input) must match the padded
    path at valid positions, zeros at padded rows."""
    from transformers import BertConfig

    cfg = BertConfig(
        vocab_size=523, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=512,
        max_position_embeddings=128, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = BertModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    b, s = 3, 64
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    lengths = np.array([64, 17, 40])
    mask = jnp.asarray(
        (np.arange(s)[None, :] < lengths[:, None]).astype(np.int64))
    import jax

    params = model.init(jax.random.PRNGKey(0), ids, attention_mask=mask)
    out_pad, pool_pad = model.apply(params, ids, attention_mask=mask)
    out_unp, pool_unp = model.apply(params, ids, attention_mask=mask,
                                    unpad_varlen=True)
    out_pad, out_unp = np.asarray(out_pad), np.asarray(out_unp)
    for i in range(b):
        err = np.abs(out_pad[i, :lengths[i]] - out_unp[i, :lengths[i]]).max()
        assert err < 2e-3, (i, err)
        assert np.all(out_unp[i, lengths[i]:] == 0.0)
    assert np.abs(np.asarray(pool_pad) - np.asarray(pool_unp)).max() < 2e-3


def test_bert_unpadded_hf_parity():
    """Unpadded pipeline end-to-end against HF logits at valid rows."""
    from transformers import BertConfig, BertModel as HFBert

    cfg = BertConfig(
        vocab_size=523, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=512,
        max_position_embeddings=128, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = HFBert(cfg).eval()
    params = {"params": remap_state_dict_hf_bert(hf.state_dict(), cfg)}
    model = BertModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    b, s = 2, 48
    ids = rng.integers(0, cfg.vocab_size, (b, s))
    lengths = np.array([48, 29])
    mask = (np.arange(s)[None, :] < lengths[:, None]).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    out, _ = model.apply(params, jnp.asarray(ids, jnp.int32),
                         attention_mask=jnp.asarray(mask),
                         unpad_varlen=True)
    out = np.asarray(out)
    for i in range(b):
        err = np.abs(out[i, :lengths[i]] - ref[i, :lengths[i]]).max()
        assert err < 2e-3, (i, err)
