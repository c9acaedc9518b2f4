"""Pretrained checkpoint loading (counterpart of
`flash_attn/utils/pretrained.py:15` `state_dict_from_pretrained`).

Loads HF-format checkpoints (local directory or hub id when network is
available) as numpy state dicts, ready for the per-family remap functions.
"""

from __future__ import annotations

import json
import os
from pathlib import Path


def state_dict_from_pretrained(model_name, dtype=None):
    """Return {name: numpy array} from a local HF checkpoint dir or hub id."""
    path = Path(model_name)
    if not path.exists():
        from transformers.utils import cached_file

        # resolve via HF hub cache (requires network or pre-populated cache)
        index = cached_file(
            model_name, "pytorch_model.bin.index.json",
            _raise_exceptions_for_missing_entries=False,
        )
        if index is not None:
            path = Path(index).parent
        else:
            single = cached_file(
                model_name, "pytorch_model.bin",
                _raise_exceptions_for_missing_entries=False,
            ) or cached_file(
                model_name, "model.safetensors",
                _raise_exceptions_for_missing_entries=False,
            )
            if single is None:
                raise FileNotFoundError(model_name)
            path = Path(single).parent

    sd = {}
    index_file = path / "pytorch_model.bin.index.json"
    st_index_file = path / "model.safetensors.index.json"
    if index_file.exists() or st_index_file.exists():
        idx = json.loads(
            (index_file if index_file.exists() else st_index_file).read_text()
        )
        shards = sorted(set(idx["weight_map"].values()))
        for shard in shards:
            sd.update(_load_file(path / shard))
    elif (path / "model.safetensors").exists():
        sd.update(_load_file(path / "model.safetensors"))
    elif (path / "pytorch_model.bin").exists():
        sd.update(_load_file(path / "pytorch_model.bin"))
    else:
        raise FileNotFoundError(f"no checkpoint files under {path}")

    if dtype is not None:
        import numpy as np

        sd = {k: np.asarray(v, dtype=dtype) for k, v in sd.items()}
    return sd


def _load_file(p):
    p = str(p)
    if p.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(p)
    import torch

    sd = torch.load(p, map_location="cpu", weights_only=True)
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
