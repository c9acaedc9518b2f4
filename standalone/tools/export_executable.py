"""AOT-export the flash-attention forward as a serialized PJRT executable
plus a matching input dump, for the framework-free C++ runner
(`standalone/src/pjrt_runner.cpp`).

This completes the reference `standalone/` loop on TPU: the exported
artifact IS the real kernel (XLA+Mosaic executable); the C++ runner
executes it through the PJRT C API with no Python, rewrites the dump with
the on-device outputs, and `fa_standalone check` compares against the
fp32 oracle.

Usage:
    PYTHONPATH=/root/.axon_site python standalone/tools/export_executable.py \
        --out-dir /tmp/fa_export [--b 1 --h 4 --sq 512 --sk 512 --d 64] \
        [--causal]

Then:
    standalone/build/fa_pjrt_runner run /tmp/fa_export/flash_fwd.exe \
        /tmp/fa_export/case.bin /tmp/fa_export/case_device.bin
    standalone/build/fa_standalone check /tmp/fa_export/case_device.bin
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--h", type=int, default=4)
    ap.add_argument("--hk", type=int, default=0)
    ap.add_argument("--sq", type=int, default=512)
    ap.add_argument("--sk", type=int, default=512)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    hk = args.hk or args.h

    import flash_attn_tpu as fa
    from flash_attn_tpu.utils.standalone_io import dump_attention_case

    scale = args.d ** -0.5

    def fwd(q, k, v):
        # fp32 boundary, bf16 compute — the same path flash_attn_func
        # takes for bf16 inputs
        o, lse, _ = fa.flash_attn_func(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), causal=args.causal,
            softmax_scale=scale, return_attn_probs=True,
        )
        # flatten: 1-D outputs are logical-order regardless of the
        # device layout XLA picks (the C runner reads raw bytes)
        return (o.astype(jnp.float32).reshape(-1),
                lse.astype(jnp.float32).reshape(-1))

    shapes = [
        jax.ShapeDtypeStruct((args.b, args.sq, args.h, args.d), jnp.float32),
        jax.ShapeDtypeStruct((args.b, args.sk, hk, args.d), jnp.float32),
        jax.ShapeDtypeStruct((args.b, args.sk, hk, args.d), jnp.float32),
    ]
    compiled = jax.jit(fwd).lower(*shapes).compile()
    # serialized PJRT executable bytes (deserializable via
    # PJRT_Executable_DeserializeAndLoad)
    xla_exe = compiled.runtime_executable()
    exe_bytes = xla_exe.serialize()

    os.makedirs(args.out_dir, exist_ok=True)
    exe_path = os.path.join(args.out_dir, "flash_fwd.exe")
    with open(exe_path, "wb") as f:
        f.write(exe_bytes)

    rng = np.random.default_rng(args.seed)
    q = rng.standard_normal((args.b, args.sq, args.h, args.d)).astype(
        np.float32)
    k = rng.standard_normal((args.b, args.sk, hk, args.d)).astype(np.float32)
    v = rng.standard_normal((args.b, args.sk, hk, args.d)).astype(np.float32)
    # python-side outputs as the dump's initial out/lse (the C++ runner
    # overwrites them with the on-device result)
    o, lse = jax.jit(fwd)(q, k, v)
    o = np.asarray(o).reshape(args.b, args.sq, args.h, args.d)
    lse = np.asarray(lse).reshape(args.b, args.h, args.sq)
    case_path = os.path.join(args.out_dir, "case.bin")
    dump_attention_case(
        case_path, q, k, v, o, lse,
        softmax_scale=scale, causal=args.causal,
    )
    print(f"wrote {exe_path} ({len(exe_bytes)} bytes) and {case_path}")


if __name__ == "__main__":
    main()
