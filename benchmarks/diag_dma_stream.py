"""Pure-DMA streaming microbench: what sets paged-read bandwidth on v5e?

Streams a (N, R, 1024) bf16 array through a trivial Pallas kernel (sum a
few lanes into scratch) with block (1, R, 1024) and a scalar-prefetched
page table, varying:
  R (page rows)      256 / 512 / 1024
  table order        sequential / shuffled
  bundle             1 / 2 / 4  (separate inputs per step)
  4D fused shape     (N, 2, R, 1024) with block (1, 2, R, 1024)
Total bytes constant (512 MB).  Reports GB/s.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.utils.benchmark import benchmark_chained

LANES = 1024
TOTAL = 512 * 1024 * 1024  # bytes


def stream_kernel(F, *args):
    table_ref = args[0]
    refs = args[1:1 + F]
    acc_ref = args[1 + F]
    # touch one (8, 128) tile per block: keeps the input live (full-block
    # DMA still runs via the pipeline) with negligible VPU work
    s = jnp.zeros((8, 128), jnp.float32)
    for j in range(F):
        r = refs[j]
        tile = r[0, 0, :8, :128] if r.ndim == 4 else r[0, :8, :128]
        s += tile.astype(jnp.float32)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _z():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += s


_BIG = None


def big():
    # generated ON DEVICE: host->device transfers ride a slow tunnel here
    global _BIG
    if _BIG is None:
        _BIG = jax.random.normal(
            jax.random.PRNGKey(0),
            (TOTAL // (LANES * 2), LANES), jnp.bfloat16)
    return _BIG


def run(R, bundle, shuffled, fused, reps=3):
    n = TOTAL // (R * LANES * 2) // (2 if fused else 1)
    rng = np.random.default_rng(0)
    if fused:
        arr = big()[: n * 2 * R].reshape(n, 2, R, LANES)
        blk = (1, 2, R, LANES)
        zero_idx = (0, 0, 0)
    else:
        arr = big()[: n * R].reshape(n, R, LANES)
        blk = (1, R, LANES)
        zero_idx = (0, 0)
    order = np.arange(n, dtype=np.int32)
    if shuffled:
        order = rng.permutation(order).astype(np.int32)
    table = jnp.asarray(order)
    steps = n // bundle

    def make_spec(j):
        def im(i, table_ref):
            return (table_ref[i * bundle + j],) + zero_idx
        return pl.BlockSpec(blk, im)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[make_spec(j) for j in range(bundle)],
        out_specs=pl.BlockSpec((8, 128), lambda i, t: (0, 0)),
    )
    fn = pl.pallas_call(
        functools.partial(stream_kernel, bundle),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )

    def step(x, *arrs):
        o = fn(table, *arrs)
        return x + o[0, 0] * 1e-20

    dt = benchmark_chained(step, jnp.zeros(()), *([arr] * bundle),
                           iters=8, reps=reps, agg="min")
    bts = steps * bundle * (2 if fused else 1) * R * LANES * 2
    tag = ("fused4d" if fused else "plain ")
    print(f"{tag} R={R:5d} bundle={bundle} shuf={int(shuffled)}: "
          f"{bts/dt/1e9:7.1f} GB/s  ({steps} steps)", flush=True)


def main():
    for fused in (False, True):
        for R in (256, 512, 1024):
            for bundle in ((1, 2, 4) if not fused else (1, 2)):
                for shuffled in (False, True):
                    run(R, bundle, shuffled, fused)


if __name__ == "__main__":
    main()
