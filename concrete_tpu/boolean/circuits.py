"""Encrypted boolean circuits built from gates — the workload layer.

The canonical benchmark circuit is the 8-bit ripple-carry adder
(BASELINE.md config 5): per bit position a full adder of
    axb = a XOR b;  sum = axb XOR c;  c' = MUX(axb, c, a)
costs 2 bootstrapped gates + 1 MUX (2 PBS). All gate evaluations are batched:
adding two vectors of m integers costs the same number of *sequential* PBS
chains as adding one, with m riding the batch axis.

Example (2-bit adds on tiny insecure parameters):
    >>> import numpy as np
    >>> from concrete_tpu import boolean
    >>> from concrete_tpu.boolean import circuits
    >>> from concrete_tpu.params import BooleanParameters
    >>> from concrete_tpu.dispersion import StandardDev
    >>> tiny = BooleanParameters(4, 1, 64, StandardDev(2.0 ** -20),
    ...     StandardDev(2.0 ** -25), 7, 3, 2, 5)
    >>> cks, sks = boolean.gen_keys(tiny, secret_seed=1, mask_seed=2, noise_seed=3)
    >>> a = circuits.encrypt_uint(cks, [1], 2, mask_seed=4, noise_seed=5)
    >>> b = circuits.encrypt_uint(cks, [2], 2, mask_seed=6, noise_seed=7)
    >>> bits, carry = circuits.ripple_carry_adder(sks, a, b)
    >>> int(circuits.decrypt_uint(cks, bits)[0])
    3
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .server_key import ServerKey


def ripple_carry_adder(sks: ServerKey, a_bits, b_bits, carry_in=None):
    """Add two little-endian encrypted bit arrays.

    a_bits, b_bits: [nbits, ..., n+1] ciphertext arrays (bit 0 = LSB).
    Returns (sum_bits [nbits, ..., n+1], carry_out [..., n+1]).
    """
    a_bits = jnp.asarray(a_bits)
    b_bits = jnp.asarray(b_bits)
    nbits = a_bits.shape[0]
    carry = carry_in
    sums = []
    for i in range(nbits):
        a, b = a_bits[i], b_bits[i]
        axb = sks.xor(a, b)
        if carry is None:
            s = axb
            carry = sks.and_(a, b)
        else:
            s = sks.xor(axb, carry)
            carry = sks.mux(axb, carry, a)
        sums.append(s)
    return jnp.stack(sums, axis=0), carry


def encrypt_uint(cks, values, nbits: int, *, mask_seed=None, noise_seed=None):
    """Encrypt unsigned integers as little-endian bit vectors
    -> [nbits, batch, n+1].

    Seeds are per-CALL: each bit plane derives a distinct sub-seed
    (reusing the same seed across planes would give every plane identical
    mask+noise, letting ct_i - ct_j leak whether bits differ)."""
    values = np.atleast_1d(np.asarray(values, dtype=np.uint64))
    bits = ((values[None, :] >> np.arange(nbits, dtype=np.uint64)[:, None]) & 1).astype(bool)
    planes = []
    for i in range(nbits):
        seeds = {}
        if mask_seed is not None:
            seeds["mask_seed"] = (int(mask_seed) << 16) + i
        if noise_seed is not None:
            seeds["noise_seed"] = (int(noise_seed) << 16) + i
        planes.append(cks.encrypt(bits[i], **seeds))
    return np.stack(planes)


def decrypt_uint(cks, bit_cts) -> np.ndarray:
    """Decrypt [nbits, batch, n+1] little-endian bit vectors to integers."""
    bit_cts = np.asarray(bit_cts)
    nbits = bit_cts.shape[0]
    vals = np.zeros(bit_cts.shape[1:-1], dtype=np.uint64)
    for i in range(nbits):
        vals |= cks.decrypt(bit_cts[i]).astype(np.uint64) << np.uint64(i)
    return vals
