"""Discretized-torus numerics.

The torus T = R/Z is represented by unsigned integers: a u32/u64 value t
stands for the real t / 2^bits (reference:
concrete-core/src/backends/core/private/math/torus/mod.rs). Conversions
reproduce the reference's rounding exactly, including the saturating cast
behaviour of Rust's `as` operator on out-of-range floats.

Example:
    >>> import numpy as np
    >>> from concrete_tpu.torus import from_torus_f64, torus_modular_distance
    >>> int(from_torus_f64(0.5, 32))
    2147483648
    >>> float(torus_modular_distance(np.uint32(1), np.uint32(0xFFFFFFFF), 32)) * 2.0 ** 32
    2.0
"""

from __future__ import annotations

import numpy as np

UNSIGNED = {32: np.uint32, 64: np.uint64}
SIGNED = {32: np.int32, 64: np.int64}


def from_torus_f64(x: np.ndarray | float, bits: int) -> np.ndarray:
    """Closest unsigned-integer representation of real torus values.

    Mirrors FromTorus::from_torus (torus/mod.rs:61-70): take the fractional
    part, scale by 2^bits, round half-up, then cast (saturating like Rust
    `as`, which only matters within 2^-53 of the wrap point).
    """
    x = np.asarray(x, dtype=np.float64)
    fract = x - np.floor(x)
    fract = fract * (2.0 ** bits)
    carry = fract - np.floor(fract)
    fract = np.where(carry >= 0.5, fract + 1.0, fract)
    fract = np.minimum(fract, 2.0 ** bits - 1)  # Rust saturating cast
    return np.floor(fract).astype(UNSIGNED[bits])


def into_torus_f64(t: np.ndarray, bits: int) -> np.ndarray:
    """Closest float representation of an unsigned torus element (mod.rs:50-55)."""
    return np.asarray(t).astype(np.float64) * 2.0 ** -bits


def into_signed_torus_f64(t: np.ndarray, bits: int) -> np.ndarray:
    """Signed-centered float view in [-1/2, 1/2).

    This is the "don't you dare remove this cast" precision trick of the
    reference FFT input path (fft/transform.rs:732-760): interpret the torus
    value as a signed integer before the float conversion.
    """
    return np.asarray(t).astype(SIGNED[bits]).astype(np.float64) * 2.0 ** -bits


def torus_modular_distance(a: np.ndarray, b: np.ndarray, bits: int) -> np.ndarray:
    """Signed distance |a - b| on the torus, as a float fraction of the torus.

    Mirrors the test helper torus_modular_distance (private/mod.rs:64-74):
    the wrapped difference re-interpreted as a signed integer, scaled.
    """
    ua, ub = UNSIGNED[bits](0) + a, UNSIGNED[bits](0) + b
    d = (ua - ub).astype(UNSIGNED[bits])
    return d.astype(SIGNED[bits]).astype(np.float64) * 2.0 ** -bits
