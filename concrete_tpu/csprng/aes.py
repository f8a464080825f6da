"""Vectorized AES-128 (ECB, encrypt-only) in numpy.

Replaces the reference's AES-NI intrinsics / `aes-soft` fallback
(concrete-csprng/src/aesni.rs, software.rs) with a batched software
implementation: all blocks of a batch are encrypted simultaneously with
numpy table lookups and xors. Used in counter mode by
`concrete_tpu.csprng.generator`; correctness is pinned by the FIPS-197
test vector (same vector the reference tests against, software.rs:152-154).

Example (FIPS-197 Appendix B):
    >>> import numpy as np
    >>> from concrete_tpu.csprng.aes import key_schedule, encrypt_blocks
    >>> rks = key_schedule(bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c"))
    >>> pt = np.frombuffer(bytes.fromhex("3243f6a8885a308d313198a2e0370734"), np.uint8)
    >>> bytes(encrypt_blocks(pt[None, :], rks)[0]).hex()
    '3925841d02dc09fbdc118597196a0b32'
"""

from __future__ import annotations

import numpy as np

# The AES S-box (FIPS-197 figure 7). Public constant.
SBOX = np.array([
    0x63, 0x7c, 0x77, 0x7b, 0xf2, 0x6b, 0x6f, 0xc5, 0x30, 0x01, 0x67, 0x2b, 0xfe, 0xd7, 0xab, 0x76,
    0xca, 0x82, 0xc9, 0x7d, 0xfa, 0x59, 0x47, 0xf0, 0xad, 0xd4, 0xa2, 0xaf, 0x9c, 0xa4, 0x72, 0xc0,
    0xb7, 0xfd, 0x93, 0x26, 0x36, 0x3f, 0xf7, 0xcc, 0x34, 0xa5, 0xe5, 0xf1, 0x71, 0xd8, 0x31, 0x15,
    0x04, 0xc7, 0x23, 0xc3, 0x18, 0x96, 0x05, 0x9a, 0x07, 0x12, 0x80, 0xe2, 0xeb, 0x27, 0xb2, 0x75,
    0x09, 0x83, 0x2c, 0x1a, 0x1b, 0x6e, 0x5a, 0xa0, 0x52, 0x3b, 0xd6, 0xb3, 0x29, 0xe3, 0x2f, 0x84,
    0x53, 0xd1, 0x00, 0xed, 0x20, 0xfc, 0xb1, 0x5b, 0x6a, 0xcb, 0xbe, 0x39, 0x4a, 0x4c, 0x58, 0xcf,
    0xd0, 0xef, 0xaa, 0xfb, 0x43, 0x4d, 0x33, 0x85, 0x45, 0xf9, 0x02, 0x7f, 0x50, 0x3c, 0x9f, 0xa8,
    0x51, 0xa3, 0x40, 0x8f, 0x92, 0x9d, 0x38, 0xf5, 0xbc, 0xb6, 0xda, 0x21, 0x10, 0xff, 0xf3, 0xd2,
    0xcd, 0x0c, 0x13, 0xec, 0x5f, 0x97, 0x44, 0x17, 0xc4, 0xa7, 0x7e, 0x3d, 0x64, 0x5d, 0x19, 0x73,
    0x60, 0x81, 0x4f, 0xdc, 0x22, 0x2a, 0x90, 0x88, 0x46, 0xee, 0xb8, 0x14, 0xde, 0x5e, 0x0b, 0xdb,
    0xe0, 0x32, 0x3a, 0x0a, 0x49, 0x06, 0x24, 0x5c, 0xc2, 0xd3, 0xac, 0x62, 0x91, 0x95, 0xe4, 0x79,
    0xe7, 0xc8, 0x37, 0x6d, 0x8d, 0xd5, 0x4e, 0xa9, 0x6c, 0x56, 0xf4, 0xea, 0x65, 0x7a, 0xae, 0x08,
    0xba, 0x78, 0x25, 0x2e, 0x1c, 0xa6, 0xb4, 0xc6, 0xe8, 0xdd, 0x74, 0x1f, 0x4b, 0xbd, 0x8b, 0x8a,
    0x70, 0x3e, 0xb5, 0x66, 0x48, 0x03, 0xf6, 0x0e, 0x61, 0x35, 0x57, 0xb9, 0x86, 0xc1, 0x1d, 0x9e,
    0xe1, 0xf8, 0x98, 0x11, 0x69, 0xd9, 0x8e, 0x94, 0x9b, 0x1e, 0x87, 0xe9, 0xce, 0x55, 0x28, 0xdf,
    0x8c, 0xa1, 0x89, 0x0d, 0xbf, 0xe6, 0x42, 0x68, 0x41, 0x99, 0x2d, 0x0f, 0xb0, 0x54, 0xbb, 0x16,
], dtype=np.uint8)

# Precomputed xtime table: multiplication by 2 in GF(2^8) mod x^8+x^4+x^3+x+1.
_XTIME = np.arange(256, dtype=np.uint16)
_XTIME = ((_XTIME << 1) ^ np.where(_XTIME & 0x80, 0x1B, 0)).astype(np.uint8)

# ShiftRows as a flat permutation of the 16-byte state.
# State layout: s[r][c] = block[r + 4c]; ShiftRows: s'[r][c] = s[r][(c+r) % 4].
_SHIFT_ROWS = np.array(
    [r + 4 * ((c + r) % 4) for c in range(4) for r in range(4)], dtype=np.intp
)

_RCON = np.array([0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36], dtype=np.uint8)


def key_schedule(key: bytes | np.ndarray) -> np.ndarray:
    """Expand a 16-byte AES-128 key into 11 round keys, shape [11, 16] u8."""
    key = np.frombuffer(bytes(key), dtype=np.uint8).copy() if not isinstance(key, np.ndarray) else key
    assert key.shape == (16,)
    w = np.zeros((44, 4), dtype=np.uint8)
    w[:4] = key.reshape(4, 4)
    for i in range(4, 44):
        temp = w[i - 1].copy()
        if i % 4 == 0:
            temp = SBOX[np.roll(temp, -1)]
            temp[0] ^= _RCON[i // 4 - 1]
        w[i] = w[i - 4] ^ temp
    return w.reshape(11, 16)


def _mix_columns(state: np.ndarray) -> np.ndarray:
    """MixColumns on state shaped [n, 4 (cols), 4 (rows)]."""
    a = state
    b = _XTIME[a]
    # out[r] = 2*a[r] ^ 3*a[r+1] ^ a[r+2] ^ a[r+3]  (indices mod 4, per column)
    a1 = np.roll(a, -1, axis=-1)
    out = (
        b
        ^ _XTIME[a1] ^ a1            # 3*a[r+1]
        ^ np.roll(a, -2, axis=-1)    # a[r+2]
        ^ np.roll(a, -3, axis=-1)    # a[r+3]
    )
    return out


def encrypt_blocks(blocks: np.ndarray, round_keys: np.ndarray) -> np.ndarray:
    """Encrypt a batch of 16-byte blocks. blocks: [n, 16] u8 -> [n, 16] u8.

    Dispatches to the native C++ backend (AES-NI when the CPU has it,
    concrete_tpu/native/aes_ctr.cpp) and falls back to the vectorized numpy
    path below — both bit-identical."""
    from .. import native

    lib = native.load_aes()
    if lib is not None and blocks.size:
        import ctypes

        blk = np.ascontiguousarray(blocks, dtype=np.uint8)
        rk = np.ascontiguousarray(round_keys, dtype=np.uint8)
        out = np.empty_like(blk)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.ctpu_aes128_encrypt_blocks(
            rk.ctypes.data_as(u8p),
            blk.ctypes.data_as(u8p),
            out.ctypes.data_as(u8p),
            blk.shape[0],
        )
        return out
    return _encrypt_blocks_numpy(blocks, round_keys)


def ctr_fill(round_keys: np.ndarray, first_block: int, n_blocks: int) -> np.ndarray:
    """Encrypt ``n_blocks`` consecutive little-endian u128 counters starting
    at ``first_block`` -> [n_blocks * 16] u8 stream bytes. Native fast path
    with a numpy fallback (bit-identical)."""
    from .. import native

    lib = native.load_aes()
    if lib is not None and n_blocks:
        import ctypes

        rk = np.ascontiguousarray(round_keys, dtype=np.uint8)
        out = np.empty(n_blocks * 16, dtype=np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.ctpu_aes128_ctr_fill(
            rk.ctypes.data_as(u8p),
            ctypes.c_uint64(first_block & 0xFFFFFFFFFFFFFFFF),
            ctypes.c_uint64((first_block >> 64) & 0xFFFFFFFFFFFFFFFF),
            out.ctypes.data_as(u8p),
            n_blocks,
        )
        return out
    first_lo = np.uint64(first_block & 0xFFFFFFFFFFFFFFFF)
    first_hi = np.uint64((first_block >> 64) & 0xFFFFFFFFFFFFFFFF)
    k = np.arange(n_blocks, dtype=np.uint64)
    with np.errstate(over="ignore"):
        lo = first_lo + k
        hi = first_hi + (lo < first_lo).astype(np.uint64)
    blocks = np.empty((n_blocks, 16), dtype=np.uint8)
    blocks[:, :8] = lo.astype("<u8").view(np.uint8).reshape(-1, 8)
    blocks[:, 8:] = hi.astype("<u8").view(np.uint8).reshape(-1, 8)
    return _encrypt_blocks_numpy(blocks, round_keys).reshape(-1)


def ctr_fill_batch(
    round_keys: np.ndarray, first_lo: np.ndarray, first_hi: np.ndarray,
    n_blocks: int,
) -> np.ndarray:
    """Encrypt ``n_blocks`` consecutive counters from R independent start
    positions in ONE AES sweep: first_lo/first_hi [R] u64 (the u128 counter
    split little-endian) -> [R, n_blocks * 16] u8.

    The batched analog of R ctr_fill calls — used by the key-generation
    fast path, where every forked child stream is swept simultaneously
    (replacing the reference's rayon par_fill fan-out,
    bootstrap/standard/mod.rs:254, with data parallelism)."""
    r = first_lo.shape[0]
    if r == 0 or n_blocks == 0:
        return np.zeros((r, n_blocks * 16), dtype=np.uint8)
    from .. import native

    lib = native.load_aes()
    if lib is not None:
        import ctypes

        rk = np.ascontiguousarray(round_keys, dtype=np.uint8)
        lo = np.ascontiguousarray(first_lo, dtype=np.uint64)
        hi = np.ascontiguousarray(first_hi, dtype=np.uint64)
        out = np.empty((r, n_blocks * 16), dtype=np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.ctpu_aes128_ctr_fill_batch(
            rk.ctypes.data_as(u8p),
            lo.ctypes.data_as(u64p),
            hi.ctypes.data_as(u64p),
            out.ctypes.data_as(u8p),
            r,
            n_blocks,
        )
        return out
    k = np.arange(n_blocks, dtype=np.uint64)
    with np.errstate(over="ignore"):
        lo = first_lo[:, None] + k[None, :]                   # [R, M]
        hi = first_hi[:, None] + (lo < first_lo[:, None]).astype(np.uint64)
    blocks = np.empty((r, n_blocks, 16), dtype=np.uint8)
    blocks[..., :8] = lo.astype("<u8").view(np.uint8).reshape(r, n_blocks, 8)
    blocks[..., 8:] = hi.astype("<u8").view(np.uint8).reshape(r, n_blocks, 8)
    return encrypt_blocks(blocks.reshape(-1, 16), round_keys).reshape(
        r, n_blocks * 16)


def _encrypt_blocks_numpy(blocks: np.ndarray, round_keys: np.ndarray) -> np.ndarray:
    """Pure-numpy batched AES-128 (the reference software path analog)."""
    state = blocks ^ round_keys[0]
    for rnd in range(1, 10):
        state = SBOX[state]
        state = state[:, _SHIFT_ROWS]
        state = _mix_columns(state.reshape(-1, 4, 4)).reshape(-1, 16)
        state = state ^ round_keys[rnd]
    state = SBOX[state]
    state = state[:, _SHIFT_ROWS]
    return state ^ round_keys[10]
