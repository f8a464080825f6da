"""Native C++ AES backend: bit-identity with the numpy reference path.

The native library is a transparent accelerator — every byte it produces
must match the pure-numpy implementation (and FIPS-197)."""

import numpy as np
import pytest

from concrete_tpu import native
from concrete_tpu.csprng import aes
from concrete_tpu.csprng.generator import AesCtrGenerator

lib = native.load_aes()
needs_native = pytest.mark.skipif(lib is None, reason="native build unavailable")


def test_fips_197_vector():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = np.frombuffer(
        bytes.fromhex("00112233445566778899aabbccddeeff"), dtype=np.uint8
    ).reshape(1, 16)
    ct = aes.encrypt_blocks(pt, aes.key_schedule(key))
    assert ct.tobytes().hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"


@needs_native
def test_native_matches_numpy_blocks():
    rng = np.random.default_rng(0)
    rk = aes.key_schedule(rng.integers(0, 256, 16, dtype=np.uint8).tobytes())
    blocks = rng.integers(0, 256, (257, 16), dtype=np.uint8)
    got = aes.encrypt_blocks(blocks, rk)
    want = aes._encrypt_blocks_numpy(blocks, rk)
    np.testing.assert_array_equal(got, want)


@needs_native
def test_native_key_schedule_matches_numpy():
    import ctypes

    rng = np.random.default_rng(1)
    key = rng.integers(0, 256, 16, dtype=np.uint8)
    want = aes.key_schedule(key.tobytes())
    out = np.empty((11, 16), dtype=np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ctpu_aes128_key_schedule(
        np.ascontiguousarray(key).ctypes.data_as(u8p), out.ctypes.data_as(u8p)
    )
    np.testing.assert_array_equal(out, want)


@needs_native
def test_ctr_fill_matches_numpy_across_u64_carry():
    """Counter crossing the low-u64 boundary must carry into the high word."""
    rng = np.random.default_rng(2)
    rk = aes.key_schedule(rng.integers(0, 256, 16, dtype=np.uint8).tobytes())
    first = (1 << 64) - 3  # crosses the carry after 3 blocks
    got = aes.ctr_fill(rk, first, 8)
    # numpy fallback
    import os

    os.environ["CONCRETE_TPU_NO_NATIVE"] = "1"
    native.load_aes.cache_clear()
    try:
        want = aes.ctr_fill(rk, first, 8)
    finally:
        del os.environ["CONCRETE_TPU_NO_NATIVE"]
        native.load_aes.cache_clear()
    np.testing.assert_array_equal(got, want)


def test_generator_stream_identical_with_and_without_native():
    """The full CSPRNG stream (fork tree included) is backend-independent."""
    import os

    def stream():
        g = AesCtrGenerator(key=42)
        parts = [g.generate_bytes(37)]
        children = g.try_fork(3, 100)
        for c in children:
            parts.append(c.generate_bytes(100))
        parts.append(g.generate_bytes(13))
        return np.concatenate(parts)

    a = stream()
    os.environ["CONCRETE_TPU_NO_NATIVE"] = "1"
    native.load_aes.cache_clear()
    try:
        b = stream()
    finally:
        del os.environ["CONCRETE_TPU_NO_NATIVE"]
        native.load_aes.cache_clear()
    np.testing.assert_array_equal(a, b)
