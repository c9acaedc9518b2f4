"""Dump/load kernel IO for the standalone C++ debug harness.

Python side of `standalone/` (reference roles: `debug_input_data.h` input
dumps + `scripts/check_input_data.cu` consistency checks).  Workflow:

    from flash_attn_tpu.utils.standalone_io import dump_attention_case
    dump_attention_case("case.bin", q, k, v, out, lse, causal=True, ...)
    $ standalone/build/fa_standalone check case.bin   # oracle re-check
    $ standalone/build/fa_standalone diff a.bin b.bin # two-build diff

Also exposes the C oracle via ctypes (`load_ref_lib`) so Python tests can
validate the C++ implementation against `attention_ref`.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess

import numpy as np

MAGIC = b"FATPU1\x00\x00"
_ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
STANDALONE_DIR = os.path.abspath(os.path.join(_ROOT, "standalone"))


def dump_attention_case(
    path,
    q,
    k,
    v,
    out,
    lse,
    *,
    softmax_scale,
    causal=False,
    window_size=(-1, -1),
    softcap=0.0,
    alibi_slopes=None,
    seqused_q=None,
    seqused_k=None,
):
    """Write one attention case (inputs + kernel outputs) as .bin.

    q (b, sq, h, d); k (b, sk, hk, d); v (b, sk, hk, dv); out (b, sq, h, dv);
    lse (b, h, sq).  Everything is upcast to fp32 on disk.
    """
    q, k, v, out, lse = (np.asarray(x, np.float32) for x in (q, k, v, out, lse))
    b, sq, h, d = q.shape
    _, sk, hk, _ = k.shape
    dv = v.shape[-1]
    flags = (1 if seqused_q is not None else 0) | (
        2 if seqused_k is not None else 0
    )
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack(
            "<12i", b, h, hk, sq, sk, d, dv, int(causal),
            int(window_size[0]), int(window_size[1]),
            int(alibi_slopes is not None), flags,
        ))
        f.write(struct.pack("<2f", float(softmax_scale), float(softcap)))
        for arr in (q, k, v):
            f.write(arr.tobytes())
        if alibi_slopes is not None:
            f.write(np.broadcast_to(
                np.asarray(alibi_slopes, np.float32).reshape(-1, h), (b, h)
            ).tobytes())
        if seqused_q is not None:
            f.write(np.asarray(seqused_q, np.int32).tobytes())
        if seqused_k is not None:
            f.write(np.asarray(seqused_k, np.int32).tobytes())
        f.write(out.tobytes())
        f.write(lse.tobytes())
    return path


def build_standalone(force=False):
    """Build the C++ harness (make); returns the binary path."""
    binary = os.path.join(STANDALONE_DIR, "build", "fa_standalone")
    lib = os.path.join(STANDALONE_DIR, "build", "libflash_attn_ref.so")
    if force or not (os.path.exists(binary) and os.path.exists(lib)):
        subprocess.run(["make", "-C", STANDALONE_DIR], check=True,
                       capture_output=True)
    return binary


class _Params(ctypes.Structure):
    _fields_ = [
        ("batch", ctypes.c_int32), ("nheads", ctypes.c_int32),
        ("nheads_k", ctypes.c_int32), ("seqlen_q", ctypes.c_int32),
        ("seqlen_k", ctypes.c_int32), ("head_dim", ctypes.c_int32),
        ("head_dim_v", ctypes.c_int32), ("causal", ctypes.c_int32),
        ("window_left", ctypes.c_int32), ("window_right", ctypes.c_int32),
        ("softmax_scale", ctypes.c_float), ("softcap", ctypes.c_float),
        ("has_alibi", ctypes.c_int32), ("nthreads", ctypes.c_int32),
    ]


def load_ref_lib():
    """ctypes binding of the C oracle (`standalone/include/flash_attn_ref.h`)."""
    build_standalone()
    lib = ctypes.CDLL(
        os.path.join(STANDALONE_DIR, "build", "libflash_attn_ref.so")
    )
    lib.fa_ref_attention.restype = ctypes.c_int
    lib.fa_ref_max_abs_diff.restype = ctypes.c_float
    return lib


def ref_attention_cpp(
    q, k, v, *, softmax_scale, causal=False, window_size=(-1, -1),
    softcap=0.0, alibi_slopes=None, seqused_q=None, seqused_k=None,
    nthreads=0,
):
    """Run the C++ oracle from Python.  Layouts as dump_attention_case."""
    lib = load_ref_lib()
    q, k, v = (np.ascontiguousarray(x, np.float32) for x in (q, k, v))
    b, sq, h, d = q.shape
    _, sk, hk, _ = k.shape
    dv = v.shape[-1]
    p = _Params(
        b, h, hk, sq, sk, d, dv, int(causal),
        int(window_size[0]), int(window_size[1]),
        float(softmax_scale), float(softcap),
        int(alibi_slopes is not None), nthreads,
    )
    out = np.zeros((b, sq, h, dv), np.float32)
    lse = np.zeros((b, h, sq), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)

    def F(a):
        return a.ctypes.data_as(fp) if a is not None else None

    def I(a):
        return a.ctypes.data_as(ip) if a is not None else None

    slopes = None
    if alibi_slopes is not None:
        slopes = np.ascontiguousarray(
            np.broadcast_to(
                np.asarray(alibi_slopes, np.float32).reshape(-1, h), (b, h)
            )
        )
    uq = np.ascontiguousarray(seqused_q, np.int32) if seqused_q is not None else None
    uk = np.ascontiguousarray(seqused_k, np.int32) if seqused_k is not None else None
    rc = lib.fa_ref_attention(ctypes.byref(p), F(q), F(k), F(v), F(slopes),
                              I(uq), I(uk), F(out), F(lse))
    if rc != 0:
        raise RuntimeError(f"fa_ref_attention failed: {rc}")
    return out, lse
