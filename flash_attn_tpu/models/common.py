"""Shared helpers for model-family weight remaps.

Every family converter produces a *canonical dict* keyed in the reference's
checkpoint layout ("transformer.layers.{l}.mixer.Wqkv.weight", torch
(out, in) orientation); `canonical_to_flax` assembles the flax param tree
(kernels transposed to (in, out)).  This mirrors how the reference remaps
every family onto the one GPTModel skeleton (`models/gpt.py:930`,
`models/llama.py:115`, etc.).

Note one intentional layout difference from the reference: our GatedMlp
packs fc1 as [gate ; up] (reference: [up ; gate]) — converters write the
canonical dict already in our order.
"""

from __future__ import annotations

import numpy as np


def np_(t):
    if hasattr(t, "detach"):
        t = t.detach().to("cpu")
        try:
            return t.numpy()
        except TypeError:
            return t.float().numpy()
    return np.asarray(t)


def linear(cd, key, flax_dict, name, transpose=True):
    w = cd.pop(key + ".weight", None)
    if w is None:
        return
    entry = {"kernel": w.T if transpose else w}
    b = cd.pop(key + ".bias", None)
    if b is not None:
        entry["bias"] = b
    flax_dict[name] = entry


def norm(cd, key, flax_dict, name):
    entry = {}
    w = cd.pop(key + ".weight", None)
    if w is not None:
        entry["weight"] = w
    b = cd.pop(key + ".bias", None)
    if b is not None:
        entry["bias"] = b
    if entry:
        flax_dict[name] = entry


def canonical_to_flax(cd, config):
    """canonical reference-layout dict (numpy, torch orientation) -> flax
    params tree for GPTLMHeadModel."""
    cd = dict(cd)
    tr = {"embeddings": {}}
    tr["embeddings"]["wte"] = {
        "embedding": cd.pop("transformer.embeddings.word_embeddings.weight")
    }
    wpe = cd.pop("transformer.embeddings.position_embeddings.weight", None)
    if wpe is not None:
        tr["embeddings"]["wpe"] = {"embedding": wpe}
    pin = cd.pop("transformer.embeddings.project_in.weight", None)
    if pin is not None:
        tr["embeddings"]["project_in"] = {"kernel": pin.T}
    norm(cd, "transformer.ln_f", tr, "ln_f")
    n_layer = config.num_hidden_layers
    for l in range(n_layer):
        pre = f"transformer.layers.{l}."
        layer = {}
        norm(cd, pre + "norm1", layer, "norm1")
        norm(cd, pre + "norm2", layer, "norm2")
        mixer = {}
        linear(cd, pre + "mixer.Wqkv", mixer, "Wqkv")
        linear(cd, pre + "mixer.out_proj", mixer, "out_proj")
        layer["mixer"] = mixer
        mlp = {}
        linear(cd, pre + "mlp.fc1", mlp, "fc1")
        linear(cd, pre + "mlp.fc2", mlp, "fc2")
        layer["mlp"] = mlp
        tr[f"layers_{l}"] = layer
    params = {"transformer": tr}
    lm_w = cd.pop("lm_head.weight", None)
    if lm_w is not None and not getattr(config, "tie_word_embeddings", True):
        head = {"kernel": lm_w.T}
        lm_b = cd.pop("lm_head.bias", None)
        if lm_b is not None:
            head["bias"] = lm_b
        params["lm_head"] = head
    leftover = [k for k in cd if "rotary" not in k and "masked_bias" not in k
                and not k.endswith(".attn.bias") and "inv_freq" not in k]
    assert not leftover, f"unmapped keys: {leftover[:8]}"
    return params
