"""Data pipeline with fault-tolerant resume.

Counterpart of `training/src/datamodules/`:
* `LMDataset` — fixed-length chunks from a flat token array
  (`datamodules/lm_dataset.py`: np.memmap token stream).
* `FaultTolerantLoader` — deterministic shuffled batch stream whose RNG
  state + batch counter checkpoint and resume mid-epoch
  (`fault_tolerant_sampler.py:10` RandomFaultTolerantSampler).
* `synthetic_tokens` — test/bench data without any tokenizer dependency.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


def synthetic_tokens(vocab_size: int, n_tokens: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, vocab_size, n_tokens, dtype=np.int32)


class LMDataset:
    """Flat token array -> (seq_len + 1)-token examples (input + shifted
    target share the chunk, like `lm_dataset.py`)."""

    def __init__(self, tokens: np.ndarray, seq_len: int):
        self.tokens = tokens
        self.seq_len = seq_len
        self.n_examples = (len(tokens) - 1) // seq_len

    def __len__(self):
        return self.n_examples

    def __getitem__(self, idx):
        s = idx * self.seq_len
        return self.tokens[s: s + self.seq_len + 1]


@dataclasses.dataclass
class LoaderState:
    epoch: int = 0
    batches_served: int = 0
    seed: int = 0

    def to_dict(self):
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d):
        return cls(**d)


class FaultTolerantLoader:
    """Deterministic, resumable batch iterator.

    The permutation for each epoch is a pure function of (seed, epoch), and
    `state.batches_served` records the position inside the epoch, so
    restoring the state resumes the exact token stream mid-epoch — the same
    recovery story as the reference's fault-tolerant samplers.
    """

    def __init__(self, dataset: LMDataset, batch_size: int, seed: int = 0,
                 state: Optional[LoaderState] = None, shuffle: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.state = state or LoaderState(seed=seed)
        self.batches_per_epoch = len(dataset) // batch_size

    def _epoch_perm(self, epoch):
        if not self.shuffle:
            return np.arange(len(self.dataset))
        rng = np.random.default_rng((self.state.seed, epoch))
        return rng.permutation(len(self.dataset))

    def __iter__(self):
        return self

    def __next__(self):
        st = self.state
        if self.batches_per_epoch == 0:
            raise StopIteration
        if st.batches_served >= self.batches_per_epoch:
            st.epoch += 1
            st.batches_served = 0
        perm = self._epoch_perm(st.epoch)
        i = st.batches_served * self.batch_size
        idx = perm[i: i + self.batch_size]
        batch = np.stack([self.dataset[j] for j in idx])
        st.batches_served += 1
        return batch


def make_loader(cfg, vocab_size: int) -> FaultTolerantLoader:
    if getattr(cfg, "hf_dataset", None) or getattr(cfg, "text_files", None):
        from flash_attn_tpu.training.hf_data import (
            HFDataConfig,
            make_hf_loader,
        )

        hf_cfg = HFDataConfig(
            dataset_name=cfg.hf_dataset, dataset_config=cfg.hf_config,
            text_files=cfg.text_files, tokenizer=cfg.tokenizer,
            detokenizer=cfg.detokenizer, cache_dir=cfg.cache_dir,
            max_examples=cfg.max_examples,
        )
        return make_hf_loader(hf_cfg, cfg.seq_len, cfg.batch_size,
                              seed=cfg.seed)
    if cfg.dataset == "synthetic":
        tokens = synthetic_tokens(vocab_size, cfg.batch_size * cfg.seq_len * 64 + 1,
                                  cfg.seed)
    elif str(cfg.dataset).endswith(".bin"):
        # flat uint16 token shard -> mmap (native C++ prefetch loader
        # available via training.native_loader.NativeLMLoader)
        tokens = load_memmap_tokens(cfg.dataset)
    else:
        tokens = np.load(cfg.dataset, mmap_mode="r")
    ds = LMDataset(np.asarray(tokens), cfg.seq_len)
    return FaultTolerantLoader(ds, cfg.batch_size, seed=cfg.seed)


def load_memmap_tokens(path, dtype=np.uint16):
    """Memory-map a flat binary token shard (the on-disk format of the
    reference's preprocessed datasets, `datamodules/lm_dataset.py`
    np.memmap usage).  Returns a read-only numpy view; combine with
    `LMDataset` / `FaultTolerantLoader`."""
    return np.memmap(path, dtype=dtype, mode="r")


def lm_dataset_from_bin(path, seq_len, dtype=np.uint16):
    """`LMDataset` over a memory-mapped .bin token shard."""
    return LMDataset(load_memmap_tokens(path, dtype), seq_len)
