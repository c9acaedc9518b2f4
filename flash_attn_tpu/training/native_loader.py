"""ctypes binding for the native C++ token loader.

Python side of `standalone/src/data_loader.cpp`: mmap'd token shards,
background-thread batch assembly, deterministic shuffled order keyed by
(seed, epoch) and (epoch, batch_idx) resume — the FaultTolerantLoader
contract (`training/data.py`) with the gather work off the Python thread.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from flash_attn_tpu.utils.standalone_io import STANDALONE_DIR, build_standalone


def _lib():
    build_standalone()
    lib = ctypes.CDLL(
        os.path.join(STANDALONE_DIR, "build", "libfa_data_loader.so")
    )
    lib.nl_create.restype = ctypes.c_void_p
    lib.nl_create.argtypes = [ctypes.c_int64, ctypes.c_int64,
                              ctypes.c_uint64, ctypes.c_int, ctypes.c_int]
    lib.nl_add_shard.restype = ctypes.c_int
    lib.nl_add_shard.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.nl_start.restype = ctypes.c_int
    lib.nl_start.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                             ctypes.c_int64, ctypes.c_int]
    lib.nl_num_batches.restype = ctypes.c_int64
    lib.nl_num_batches.argtypes = [ctypes.c_void_p]
    lib.nl_next.restype = ctypes.c_int64
    lib.nl_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_int32)]
    lib.nl_destroy.argtypes = [ctypes.c_void_p]
    return lib


class NativeLMLoader:
    """Iterate (batch, seq_len + 1) int32 batches from .bin token shards."""

    def __init__(self, shard_paths, seq_len, batch_size, *, seed=0,
                 token_dtype=np.uint16, epoch=0, start_batch=0, nthreads=2):
        self._lib = _lib()
        itemsize = np.dtype(token_dtype).itemsize
        self._h = self._lib.nl_create(seq_len, batch_size, seed, itemsize, 0)
        for p in shard_paths:
            rc = self._lib.nl_add_shard(self._h, str(p).encode())
            if rc != 0:
                raise OSError(f"cannot map shard {p} (rc={rc})")
        rc = self._lib.nl_start(self._h, epoch, start_batch, nthreads)
        if rc != 0:
            raise ValueError("dataset smaller than one batch")
        self.seq_len = seq_len
        self.batch_size = batch_size
        self.num_batches = self._lib.nl_num_batches(self._h)

    def __iter__(self):
        return self

    def __next__(self):
        out = np.empty((self.batch_size, self.seq_len + 1), np.int32)
        idx = self._lib.nl_next(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        )
        if idx < 0:
            raise StopIteration
        return idx, out

    def close(self):
        if self._h:
            self._lib.nl_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
