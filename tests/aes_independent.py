"""An INDEPENDENT AES-128 implementation for cross-validating the package's
CSPRNG stream (concrete_tpu/csprng/aes.py and native/aes_ctr.cpp).

Deliberately shares nothing with the package implementation: the S-box is
derived from first principles (multiplicative inverse in GF(2^8) via
square-and-multiply + the affine transform, FIPS-197 §5.1.1) instead of a
literal table, GF multiplication is the bitwise Russian-peasant loop instead
of xtime lookup tables, and the state is processed block-at-a-time in
column-major order. Slow — test-only.
"""

from __future__ import annotations

import numpy as np

_POLY = 0x11B  # x^8 + x^4 + x^3 + x + 1


def gmul(a: int, b: int) -> int:
    """GF(2^8) product, bitwise."""
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        b >>= 1
        a <<= 1
        if a & 0x100:
            a ^= _POLY
    return p & 0xFF


def _ginv(a: int) -> int:
    """Multiplicative inverse via a^254 (a^(2^8-2)); 0 -> 0."""
    if a == 0:
        return 0
    r, base, e = 1, a, 254
    while e:
        if e & 1:
            r = gmul(r, base)
        base = gmul(base, base)
        e >>= 1
    return r


def _affine(x: int) -> int:
    out = 0
    for i in range(8):
        bit = (
            (x >> i) ^ (x >> ((i + 4) % 8)) ^ (x >> ((i + 5) % 8))
            ^ (x >> ((i + 6) % 8)) ^ (x >> ((i + 7) % 8)) ^ (0x63 >> i)
        ) & 1
        out |= bit << i
    return out


SBOX = [_affine(_ginv(x)) for x in range(256)]


def _key_expansion(key: bytes) -> list:
    """176-byte expanded key as 11 round keys of 16 bytes (FIPS-197 §5.2)."""
    assert len(key) == 16
    words = [list(key[4 * i: 4 * i + 4]) for i in range(4)]
    rcon = 1
    for i in range(4, 44):
        temp = list(words[i - 1])
        if i % 4 == 0:
            temp = temp[1:] + temp[:1]                 # RotWord
            temp = [SBOX[b] for b in temp]             # SubWord
            temp[0] ^= rcon
            rcon = gmul(rcon, 2)
        words.append([a ^ b for a, b in zip(words[i - 4], temp)])
    return [
        bytes(b for w in words[4 * r: 4 * r + 4] for b in w) for r in range(11)
    ]


def encrypt_block(key: bytes, block: bytes) -> bytes:
    """One AES-128 block encryption (FIPS-197 §5.1)."""
    rks = _key_expansion(key)
    # state[r][c] = input[r + 4c] (column-major, §3.4)
    s = [[block[r + 4 * c] ^ rks[0][r + 4 * c] for c in range(4)] for r in range(4)]
    for rnd in range(1, 11):
        s = [[SBOX[b] for b in row] for row in s]                      # SubBytes
        s = [row[r:] + row[:r] for r, row in enumerate(s)]             # ShiftRows
        if rnd < 10:                                                   # MixColumns
            ns = [[0] * 4 for _ in range(4)]
            for c in range(4):
                col = [s[r][c] for r in range(4)]
                ns[0][c] = gmul(col[0], 2) ^ gmul(col[1], 3) ^ col[2] ^ col[3]
                ns[1][c] = col[0] ^ gmul(col[1], 2) ^ gmul(col[2], 3) ^ col[3]
                ns[2][c] = col[0] ^ col[1] ^ gmul(col[2], 2) ^ gmul(col[3], 3)
                ns[3][c] = gmul(col[0], 3) ^ col[1] ^ col[2] ^ gmul(col[3], 2)
            s = ns
        rk = rks[rnd]
        s = [[s[r][c] ^ rk[r + 4 * c] for c in range(4)] for r in range(4)]
    return bytes(s[r][c] for c in range(4) for r in range(4))


def ctr_stream(key: bytes, first_block: int, n_blocks: int) -> np.ndarray:
    """The reference counter stream: consecutive little-endian u128 counters
    (wrapping mod 2^128), each AES-encrypted (counter/mod.rs:106-151,
    software.rs:76-89)."""
    out = np.empty(n_blocks * 16, dtype=np.uint8)
    for i in range(n_blocks):
        ctr = (first_block + i) % (1 << 128)
        out[16 * i: 16 * (i + 1)] = np.frombuffer(
            encrypt_block(key, ctr.to_bytes(16, "little")), dtype=np.uint8
        )
    return out
