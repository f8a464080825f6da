"""Signed gadget decomposition, vectorized.

Re-implements the reference's two decomposition flavours exactly (they have
slightly different carry conventions and both affect bit-exactness):

- the iterator used by the external product
  (math/decomposition/decomposer.rs:99-240, iter.rs:259-284);
- `torus_small_sign_decompose` used by the LWE keyswitch
  (math/decomposition/mod.rs:45-67).

theta ~ sum_{i=1..l} digit_i * q / B^i with balanced digits in [-B/2, B/2].
Pure bit-twiddling on u32/u64 lanes; level loops are unrolled (l <= 8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SIGNED = {jnp.dtype(jnp.uint32): jnp.int32, jnp.dtype(jnp.uint64): jnp.int64}


def _bits_of(x) -> int:
    return jnp.dtype(x.dtype).itemsize * 8


def _one(x):
    return np.array(1, dtype=x.dtype)


def closest_representable(x, base_log: int, levels: int):
    """Round to the closest sum_{i<=l} d_i q/B^i lattice point.

    Round-half-up on the (base_log*levels)-bit prefix (decomposer.rs:99-116);
    the wrap of values rounding up to q reproduces Rust's wrapping shl.
    """
    bits = _bits_of(x)
    non_rep = bits - levels * base_log
    if non_rep == 0:
        return x
    one = _one(x)
    non_rep_msb = (x >> (non_rep - 1)) & one
    return ((x >> non_rep) + non_rep_msb) << non_rep


def decompose_levels(x, base_log: int, levels: int):
    """Signed decomposition of (pre-rounded) torus values.

    Returns digits stacked on a NEW LAST axis ordered level 1..l (so index i
    pairs with a GGSW level-matrix of level i+1), as the signed dtype.
    Reproduces SignedDecompositionIter (iter.rs:200-284): the iterator yields
    level l first; we fill the output back to front.
    """
    bits = _bits_of(x)
    signed = _SIGNED[jnp.dtype(x.dtype)]
    one = _one(x)
    mask = np.array((1 << base_log) - 1, dtype=x.dtype)
    state = x >> (bits - base_log * levels)
    out = [None] * levels
    for step in range(levels):  # yields level l-step
        res = state & mask
        state = state >> base_log
        carry = ((res - one) | state) & res
        carry = carry >> (base_log - 1)
        state = state + carry
        digit = res - (carry << base_log)  # wrapping; reinterpret as signed
        out[levels - 1 - step] = jax.lax.bitcast_convert_type(digit, signed)
    return jnp.stack(out, axis=-1)


def decompose_rounded(x, base_log: int, levels: int):
    """closest_representable + decompose_levels (decomposer.rs:169-186).

    >>> import numpy as np, jax.numpy as jnp
    >>> x = jnp.asarray(np.array([0x12345678], dtype=np.uint32))
    >>> d = decompose_rounded(x, base_log=8, levels=2)
    >>> recomposed = recompose(d, 8, 2, jnp.uint32)
    >>> hex(int(recomposed[0]))                  # top 16 bits, rounded
    '0x12340000'
    """
    return decompose_levels(closest_representable(x, base_log, levels), base_log, levels)


def small_sign_decompose(x, base_log: int, levels: int):
    """The keyswitch decomposition (decomposition/mod.rs:45-67).

    Input must already be rounded with `closest_representable`. Returns digits
    on a new last axis ordered level 1..l, signed dtype. Differs from
    `decompose_levels` in its carry rule (LSB-to-MSB with carry OR).
    """
    bits = _bits_of(x)
    signed = _SIGNED[jnp.dtype(x.dtype)]
    one = _one(x)
    block_mask = np.array((1 << base_log) - 1, dtype=x.dtype)
    msb_mask = np.array(1 << (base_log - 1), dtype=x.dtype)
    carry = jnp.zeros_like(x)
    out = [None] * levels
    for i in reversed(range(levels)):  # LSB level (l) first
        prev_carry = carry
        tmp = (x >> (bits - base_log * (i + 1))) & block_mask
        carry = tmp & msb_mask
        tmp = tmp + prev_carry
        carry = carry | (tmp & msb_mask)
        digit = tmp - (carry << 1)
        out[i] = jax.lax.bitcast_convert_type(digit, signed)
        carry = carry >> (base_log - 1)
    return jnp.stack(out, axis=-1)


def recompose(digits, base_log: int, levels: int, dtype):
    """sum_i digit_i * q / B^i — test helper (decomposer.rs:216-240)."""
    bits = jnp.dtype(dtype).itemsize * 8
    acc = jnp.zeros(digits.shape[:-1], dtype=dtype)
    for i in range(levels):
        level = i + 1
        summand = jax.lax.bitcast_convert_type(
            digits[..., i].astype(_SIGNED[jnp.dtype(dtype)]), dtype
        ) << (bits - base_log * level)
        acc = acc + summand
    return acc
