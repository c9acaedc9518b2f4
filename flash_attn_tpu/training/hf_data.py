"""HuggingFace-datasets language-modeling datamodule.

Counterpart of `training/src/datamodules/language_modeling_hf.py`: load a
HF dataset (or local text/jsonl files), tokenize with a HF tokenizer,
concatenate + chunk into a flat token array, and cache the result as a
.npy/.bin shard the fault-tolerant loader consumes.  The detokenizer
registry mirrors `training/src/datamodules/datasets/detokenizer.py`
(wikitext et al. markup removal).

Offline-friendly: `tokenizer="bytes"` uses a dependency-free byte-level
tokenizer (vocab 256 + eos), so tests run with no downloads; any
pretrained tokenizer name works when its files are available locally.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import numpy as np

# --- detokenizers (datasets/detokenizer.py counterparts) -----------------


def wikitext_detokenize(text: str) -> str:
    """Undo wikitext's moses-style tokenization artifacts."""
    rules = [
        (" @-@ ", "-"), (" @,@ ", ","), (" @.@ ", "."),
        (" .", "."), (" ,", ","), (" !", "!"), (" ?", "?"),
        (" ;", ";"), (" :", ":"), (" '", "'"),
        (" n't", "n't"), (" 's", "'s"), (" 'm", "'m"), (" 're", "'re"),
        ("( ", "("), (" )", ")"), ("`` ", '"'), (" ''", '"'),
    ]
    for a, b in rules:
        text = text.replace(a, b)
    return text


DETOKENIZERS = {
    "wikitext": wikitext_detokenize,
    None: lambda t: t,
    "none": lambda t: t,
}


# --- tokenizers ----------------------------------------------------------


class ByteTokenizer:
    """Dependency-free byte-level tokenizer: vocab = 256 bytes + eos."""

    vocab_size = 257
    eos_token_id = 256

    def encode(self, text: str):
        return list(text.encode("utf-8", errors="replace"))


def make_tokenizer(name: str):
    if name in ("bytes", "byte"):
        return ByteTokenizer()
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(name)


# --- datamodule ----------------------------------------------------------


@dataclasses.dataclass
class HFDataConfig:
    dataset_name: Optional[str] = None      # HF hub dataset, e.g. "wikitext"
    dataset_config: Optional[str] = None    # e.g. "wikitext-103-raw-v1"
    text_files: Optional[list] = None       # local .txt/.jsonl fallback
    text_key: str = "text"
    tokenizer: str = "gpt2"                 # HF name or "bytes"
    detokenizer: Optional[str] = None
    cache_dir: str = ".hf_token_cache"
    append_eos: bool = True
    max_examples: int = 0                   # 0 = all (cap for smoke runs)


def _iter_texts(cfg: HFDataConfig, split: str):
    if cfg.dataset_name is not None:
        import datasets as hfd

        ds = hfd.load_dataset(cfg.dataset_name, cfg.dataset_config,
                              split=split)
        n = len(ds) if cfg.max_examples == 0 else min(len(ds),
                                                      cfg.max_examples)
        for i in range(n):
            yield ds[i][cfg.text_key]
        return
    assert cfg.text_files, "need dataset_name or text_files"
    count = 0
    for path in cfg.text_files:
        path = Path(path)
        if path.suffix == ".jsonl":
            import json

            for line in path.open():
                if cfg.max_examples and count >= cfg.max_examples:
                    return
                yield json.loads(line)[cfg.text_key]
                count += 1
        else:
            for line in path.open():
                if cfg.max_examples and count >= cfg.max_examples:
                    return
                if line.strip():
                    yield line.rstrip("\n")
                    count += 1


def tokenize_to_array(cfg: HFDataConfig, split: str = "train") -> np.ndarray:
    """Tokenize + concatenate a split into one flat int32 token array
    (the `language_modeling_hf.py` concat-then-chunk strategy), cached on
    disk keyed by config."""
    cache_dir = Path(cfg.cache_dir)
    key = (f"{cfg.dataset_name or 'files'}-{cfg.dataset_config or ''}-"
           f"{cfg.tokenizer.replace('/', '_')}-{split}-{cfg.max_examples}")
    cache = cache_dir / f"{key}.npy"
    if cache.exists():
        return np.load(cache, mmap_mode="r")
    tok = make_tokenizer(cfg.tokenizer)
    detok = DETOKENIZERS.get(cfg.detokenizer, DETOKENIZERS[None])
    eos = getattr(tok, "eos_token_id", None)
    chunks = []
    for text in _iter_texts(cfg, split):
        ids = tok.encode(detok(text))
        if cfg.append_eos and eos is not None:
            ids = list(ids) + [eos]
        chunks.append(np.asarray(ids, np.int32))
    tokens = (np.concatenate(chunks) if chunks
              else np.zeros(0, np.int32))
    cache_dir.mkdir(parents=True, exist_ok=True)
    np.save(cache, tokens)
    return tokens


def make_hf_loader(cfg: HFDataConfig, seq_len: int, batch_size: int,
                   split: str = "train", seed: int = 0):
    """FaultTolerantLoader over a tokenized HF/text dataset."""
    from flash_attn_tpu.training.data import FaultTolerantLoader, LMDataset

    tokens = tokenize_to_array(cfg, split)
    ds = LMDataset(np.asarray(tokens), seq_len)
    return FaultTolerantLoader(ds, batch_size, seed=seed)
