"""Standalone C++ harness tests: build, selftest, kernel-IO consistency
check, and ctypes-oracle parity with the Python oracle (the roles of the
reference `standalone/src/test_*.cpp` scenario binaries)."""

import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_func
from flash_attn_tpu.utils.standalone_io import (
    STANDALONE_DIR,
    build_standalone,
    dump_attention_case,
    ref_attention_cpp,
)
from flash_attn_tpu.utils.testing import attention_ref


@pytest.fixture(scope="module")
def binary():
    return build_standalone()


def test_selftest(binary):
    r = subprocess.run([binary, "selftest"], capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "SELFTEST PASS" in r.stdout


def test_cpp_oracle_matches_python_oracle():
    b, h, hk, sq, sk, d = 2, 4, 2, 65, 97, 32
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, sq, h, d)).astype(np.float32)
    k = rng.standard_normal((b, sk, hk, d)).astype(np.float32)
    v = rng.standard_normal((b, sk, hk, d)).astype(np.float32)
    slopes = rng.random((b, h)).astype(np.float32) * 0.2
    for causal, window, softcap, alibi in [
        (False, (-1, -1), 0.0, None),
        (True, (-1, -1), 0.0, None),
        (True, (16, 0), 0.0, None),
        (False, (-1, -1), 20.0, None),
        (True, (-1, -1), 0.0, slopes),
    ]:
        o_cpp, lse_cpp = ref_attention_cpp(
            q, k, v, softmax_scale=d ** -0.5, causal=causal,
            window_size=window, softcap=softcap, alibi_slopes=alibi,
        )
        bias = None
        if alibi is not None:
            from flash_attn_tpu.utils.testing import attn_bias_from_alibi_slopes
            bias = attn_bias_from_alibi_slopes(
                jnp.asarray(alibi), sq, sk, causal=causal)
        o_py, _ = attention_ref(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal,
            window_size=window, softcap=softcap, attn_bias=bias,
        )
        err = float(np.abs(o_cpp - np.asarray(o_py)).max())
        assert err < 2e-5, (causal, window, softcap, err)


def test_kernel_dump_check(binary, tmp_path):
    """Dump real Pallas kernel IO, have the C++ harness re-verify it; then
    corrupt the output and require the check to fail (two-build diff role)."""
    b, h, sq, sk, d = 2, 4, 128, 192, 64
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.bfloat16)
    out, lse, _ = flash_attn_func(q, k, v, causal=True,
                                  return_attn_probs=True)
    path = str(tmp_path / "case.bin")
    dump_attention_case(
        path,
        np.asarray(q, np.float32), np.asarray(k, np.float32),
        np.asarray(v, np.float32), np.asarray(out, np.float32),
        np.asarray(lse, np.float32),
        softmax_scale=d ** -0.5, causal=True,
    )
    r = subprocess.run([binary, "check", path, "3e-2"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "CHECK PASS" in r.stdout

    # corrupted output must fail
    bad = np.asarray(out, np.float32)
    bad[0, 5, 2, :] += 1.0
    path2 = str(tmp_path / "bad.bin")
    dump_attention_case(
        path2, np.asarray(q, np.float32), np.asarray(k, np.float32),
        np.asarray(v, np.float32), bad, np.asarray(lse, np.float32),
        softmax_scale=d ** -0.5, causal=True,
    )
    r = subprocess.run([binary, "check", path2, "3e-2"],
                       capture_output=True, text=True)
    assert r.returncode == 1
    assert "CHECK FAIL" in r.stdout

    # diff tooling
    r = subprocess.run([binary, "diff", path, path2],
                       capture_output=True, text=True)
    assert r.returncode == 0
    assert "max|o_a - o_b|" in r.stdout


def test_native_loader_deterministic(tmp_path):
    """C++ loader: full coverage, deterministic (seed, epoch) order,
    (epoch, batch) resume parity."""
    from flash_attn_tpu.training.native_loader import NativeLMLoader

    rng = np.random.default_rng(0)
    toks = rng.integers(0, 1000, 4096, dtype=np.uint16)
    p1 = tmp_path / "a.bin"
    p2 = tmp_path / "b.bin"
    toks[:2048].tofile(p1)
    toks[2048:].tofile(p2)

    def run(start=0):
        L = NativeLMLoader([p1, p2], seq_len=63, batch_size=4, seed=7,
                           start_batch=start)
        got = dict(iter(L))
        L.close()
        return got

    a = run()
    b = run()
    assert set(a) == set(b) == set(range(16))  # 4096//64=64 ex / 4 = 16
    for i in a:
        np.testing.assert_array_equal(a[i], b[i])
        # batch content comes from the mmap'd stream
        assert a[i].min() >= 0 and a[i].max() < 1000

    # resume mid-epoch: same content for the remaining batches
    c = run(start=10)
    assert set(c) == set(range(10, 16))
    for i in c:
        np.testing.assert_array_equal(c[i], a[i])


def test_pjrt_runner_loop():
    """Framework-free kernel execution: AOT export -> PJRT-C-API runner
    (no Python) -> C++ oracle check (the reference standalone's
    run-the-real-kernel role).  Needs real TPU + ~5 min; gated on
    FLASH_ATTN_TPU_PJRT_TEST=1."""
    import os
    import subprocess
    import tempfile

    import pytest

    if os.environ.get("FLASH_ATTN_TPU_PJRT_TEST") != "1":
        pytest.skip("set FLASH_ATTN_TPU_PJRT_TEST=1 (needs real TPU)")
    from flash_attn_tpu.utils.standalone_io import STANDALONE_DIR

    runner = os.path.join(STANDALONE_DIR, "build", "fa_pjrt_runner")
    checker = os.path.join(STANDALONE_DIR, "build", "fa_standalone")
    if not os.path.exists(runner):
        subprocess.run(["make", "-C", STANDALONE_DIR, "pjrt"], check=True)
    with tempfile.TemporaryDirectory() as td:
        env = dict(os.environ)
        env.pop("FLASH_ATTN_TPU_FORCE_INTERPRET", None)
        subprocess.run(
            ["python", os.path.join(STANDALONE_DIR, "tools",
                                    "export_executable.py"),
             "--out-dir", td, "--sq", "256", "--sk", "256", "--causal"],
            check=True, env=env, timeout=580,
        )
        env.setdefault("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")
        subprocess.run(
            [runner, "run", os.path.join(td, "flash_fwd.exe"),
             os.path.join(td, "case.bin"), os.path.join(td, "dev.bin")],
            check=True, env=env, timeout=580,
        )
        out = subprocess.run(
            [checker, "check", os.path.join(td, "dev.bin")],
            capture_output=True, text=True, timeout=120,
        )
        assert "CHECK PASS" in out.stdout, out.stdout
