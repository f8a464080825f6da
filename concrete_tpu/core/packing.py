"""Packing keyswitch: LWE -> GLWE, and LWE-list -> one packed GLWE.

Reference: crypto/glwe/keyswitch.rs (PackingKeyswitchKey): for each input key
coefficient, `level` GLWE ciphertexts encrypting s_i * q/B^level at
coefficient 0 (:349); switching decomposes each input mask element and
subtracts digit * key rows (:545); packing switches a list and accumulates
each result rotated by X^degree (:596).

Example (packing keyswitch of a trivial LWE is exact in coefficient 0):
    >>> import numpy as np
    >>> from concrete_tpu.core import packing, lwe, glwe
    >>> from concrete_tpu.csprng import EncryptionRandomGenerator, SecretRandomGenerator
    >>> sgen = SecretRandomGenerator(1)
    >>> lsk = lwe.LweSecretKey.generate_binary(4, sgen)
    >>> gsk = glwe.GlweSecretKey.generate_binary(1, 16, sgen)
    >>> pksk = packing.PackingKeyswitchKey.generate(lsk, gsk, 8, 2, 0.0,
    ...     EncryptionRandomGenerator(2, 3))
    >>> ct = lsk.encrypt(np.uint32(1 << 24), 0.0, EncryptionRandomGenerator(4, 5))
    >>> out = packing.keyswitch_lwe_to_glwe(np.asarray(pksk.data), np.asarray(ct),
    ...     base_log=8, level_count=2)
    >>> abs(int(gsk.decrypt(np.asarray(out)[None])[0][0]) - (1 << 24)) < (1 << 18)
    True
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..csprng import EncryptionRandomGenerator
from ..math import decomposition, polynomial
from ..torus import UNSIGNED
from .glwe import GlweSecretKey
from .lwe import LweSecretKey

_JNP_SIGNED = {32: jnp.int32, 64: jnp.int64}


@dataclasses.dataclass
class PackingKeyswitchKey:
    """data: [n_in, l, k+1, N] — per input key bit, the decomposition ladder
    encrypted as GLWEs under the output key."""

    data: np.ndarray
    base_log: int
    level_count: int
    bits: int

    @classmethod
    def generate(
        cls,
        in_key: LweSecretKey,
        out_key: GlweSecretKey,
        base_log: int,
        level_count: int,
        std: float,
        gen: EncryptionRandomGenerator,
    ) -> "PackingKeyswitchKey":
        """fill_with_packing_keyswitch_key (glwe/keyswitch.rs:349): message
        polynomials are zero except coefficient 0 = s_i * q/B^level; blocks
        encrypted sequentially with the shared generator."""
        bits = in_key.bits
        dt = UNSIGNED[bits]
        n_in, l, n = in_key.dimension, level_count, out_key.polynomial_size
        msgs = np.zeros((n_in, l, n), dtype=dt)
        shifts = np.array([bits - base_log * (lev + 1) for lev in range(l)], dtype=np.uint64)
        msgs[:, :, 0] = (
            in_key.key.astype(np.uint64)[:, None] << shifts[None, :]
        ).astype(dt)
        data = out_key.encrypt(msgs.reshape(n_in * l, n), std, gen).reshape(
            n_in, l, out_key.dimension + 1, n
        )
        return cls(data=data, base_log=base_log, level_count=l, bits=bits)


def keyswitch_lwe_to_glwe(pksk_data, ct, *, base_log: int, level_count: int):
    """Switch LWE batches into GLWE ciphertexts (glwe/keyswitch.rs:545).

    pksk_data: [n_in, l, k+1, N]; ct: [..., n_in+1] -> [..., k+1, N].
    """
    bits = jnp.dtype(ct.dtype).itemsize * 8
    sdt = _JNP_SIGNED[bits]
    n_in, l, ks1, n = pksk_data.shape
    mask = ct[..., :-1]
    body = ct[..., -1]
    rounded = decomposition.closest_representable(mask, base_log, level_count)
    digits = decomposition.small_sign_decompose(rounded, base_log, level_count)
    lead = digits.shape[:-2]
    flat = digits.reshape(lead + (n_in * l,))
    kflat = jax.lax.bitcast_convert_type(pksk_data, sdt).reshape(n_in * l, ks1 * n)
    acc = jax.lax.dot_general(
        flat, kflat, (((flat.ndim - 1,), (0,)), ((), ())), preferred_element_type=sdt
    )
    out = jax.lax.bitcast_convert_type(jnp.zeros_like(acc) - acc, ct.dtype)
    out = out.reshape(lead + (ks1, n))
    return out.at[..., -1, 0].add(body)


def packing_keyswitch(pksk_data, lwe_list, *, base_log: int, level_count: int):
    """Pack an LWE list into ONE GLWE (glwe/keyswitch.rs:596): each switched
    ciphertext lands on its own monomial degree.

    lwe_list: [..., m, n_in+1] with m <= N -> [..., k+1, N].
    """
    m = lwe_list.shape[-2]
    poly_size = pksk_data.shape[-1]
    if m > poly_size:
        raise ValueError(
            f"cannot pack {m} LWEs into one GLWE of polynomial size "
            f"{poly_size} (degree m-1 wraps negacyclically; "
            f"glwe/keyswitch.rs:596 debug_assert)")
    switched = keyswitch_lwe_to_glwe(
        pksk_data, lwe_list, base_log=base_log, level_count=level_count
    )  # [..., m, k+1, N]
    degrees = jnp.arange(m, dtype=jnp.int32).reshape((m,) + (1,))  # [m, 1]
    rotated = polynomial.negacyclic_monomial_mul(switched, degrees)
    return rotated.sum(axis=-3, dtype=switched.dtype)
