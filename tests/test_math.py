"""Math layer tests: Montgomery arithmetic, NTT, CRT, decomposition, polynomials."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from concrete_tpu.math import crt, decomposition, mod_arith, ntt, polynomial


def naive_negacyclic_mod_p(a, b, p):
    n = len(a)
    out = [0] * n
    for i in range(n):
        for j in range(n):
            d = i + j
            if d < n:
                out[d] = (out[d] + int(a[i]) * int(b[j])) % p
            else:
                out[d - n] = (out[d - n] - int(a[i]) * int(b[j])) % p
    return np.array(out, dtype=np.uint32)


def test_mul32_hilo():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 32, size=1000, dtype=np.uint32)
    b = rng.integers(0, 1 << 32, size=1000, dtype=np.uint32)
    hi, lo = jax.jit(mod_arith.mul32_hilo)(jnp.array(a), jnp.array(b))
    full = a.astype(np.uint64) * b.astype(np.uint64)
    np.testing.assert_array_equal(np.array(hi), (full >> 32).astype(np.uint32))
    np.testing.assert_array_equal(np.array(lo), (full & 0xFFFFFFFF).astype(np.uint32))


@pytest.mark.parametrize("p", ntt.DEFAULT_PRIMES)
def test_montgomery_roundtrip(p):
    ctx = mod_arith.MontgomeryContext.new(p)
    rng = np.random.default_rng(1)
    a = rng.integers(0, p, size=512, dtype=np.uint32)
    b = rng.integers(0, p, size=512, dtype=np.uint32)
    am = ctx.to_mont(jnp.array(a))
    bm = ctx.to_mont(jnp.array(b))
    prod = np.array(ctx.from_mont(ctx.mont_mul(am, bm)))
    expected = (a.astype(object) * b.astype(object)) % p
    np.testing.assert_array_equal(prod, expected.astype(np.uint32))
    np.testing.assert_array_equal(np.array(ctx.from_mont(am)), a)
    # add/sub
    np.testing.assert_array_equal(
        np.array(ctx.add(jnp.array(a), jnp.array(b))),
        ((a.astype(np.uint64) + b) % p).astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.array(ctx.sub(jnp.array(a), jnp.array(b))),
        ((a.astype(np.int64) - b + p) % p).astype(np.uint32),
    )


@pytest.mark.parametrize("n", [8, 64, 256])
def test_ntt_roundtrip(n):
    p = ntt.DEFAULT_PRIMES[0]
    plan = ntt.make_plan(n, p)
    rng = np.random.default_rng(2)
    x = rng.integers(0, p, size=(3, n), dtype=np.uint32)
    back = np.array(jax.jit(lambda v: ntt.inverse(plan, ntt.forward(plan, v)))(jnp.array(x)))
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("n", [8, 32])
def test_ntt_negacyclic_product(n):
    for p in ntt.DEFAULT_PRIMES[:2]:
        plan = ntt.make_plan(n, p)
        rng = np.random.default_rng(3)
        a = rng.integers(0, p, size=n, dtype=np.uint32)
        b = rng.integers(0, p, size=n, dtype=np.uint32)
        got = np.array(jax.jit(lambda u, v: ntt.negacyclic_polymul_mod_p(plan, u, v))(jnp.array(a), jnp.array(b)))
        np.testing.assert_array_equal(got, naive_negacyclic_mod_p(a, b, p))


@pytest.mark.parametrize("bits", [32, 64])
def test_crt_roundtrip_signed(bits):
    primes = ntt.DEFAULT_PRIMES[:2] if bits == 32 else ntt.DEFAULT_PRIMES[:3]
    cc = crt.CrtContext.new(primes, bits)
    M = 1
    for p in primes:
        M *= p
    import random

    pyrng = random.Random(4)
    # values across the full signed range, plus edge cases
    vals = [pyrng.randint(-(M // 2) + 1, M // 2 - 1) for _ in range(200)]
    vals += [0, 1, -1, M // 2 - 1, -(M // 2) + 1]
    residues = [jnp.array([int(v) % p for v in vals], dtype=jnp.uint32) for p in primes]
    got = np.array(cc.combine_to_torus(residues))
    expected = np.array([int(v) % (1 << bits) for v in vals], dtype=np.uint64)
    np.testing.assert_array_equal(got.astype(np.uint64), expected)


def test_crt_external_product_pipeline():
    """digit x torus negacyclic product, exact mod 2^32 via NTT+CRT."""
    n, bits = 64, 32
    base = 256
    bound = crt.external_product_bound(n, 1, base, bits)
    primes = crt.select_primes(bound)
    cc = crt.CrtContext.new(primes, bits)
    rng = np.random.default_rng(5)
    torus = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    digits = rng.integers(-base // 2, base // 2, size=n).astype(np.int32)

    t_res = cc.residues_from_torus(jnp.array(torus))
    d_res = cc.residues_from_signed(jnp.array(digits))
    out_res = []
    for pi, p in enumerate(primes):
        plan = ntt.make_plan(n, p)
        prod = plan.ctx.mont_mul(
            ntt.forward(plan, t_res[pi]), ntt.forward(plan, d_res[pi])
        )
        out_res.append(ntt.inverse(plan, prod))
    got = np.array(cc.combine_to_torus(out_res))

    # numpy oracle: wrapping negacyclic product mod 2^32
    a = torus.copy()
    b = digits.astype(np.int64)
    expected = np.zeros(n, dtype=np.uint32)
    for i in range(n):
        for j in range(n):
            d = i + j
            term = np.uint32(int(a[i]) * int(b[j]) % (1 << 32))
            if d < n:
                expected[d] += term
            else:
                expected[d - n] -= term
    np.testing.assert_array_equal(got, expected)


def test_closest_representable_reference_vector():
    """Doc example: u32, base_log 4, levels 3 (decomposer.rs:90-99)."""
    x = jnp.array([1_340_987_234], dtype=jnp.uint32)
    got = decomposition.closest_representable(x, 4, 3)
    assert int(got[0]) == 1_341_128_704


def test_decompose_recompose():
    rng = np.random.default_rng(6)
    for base_log, levels in [(4, 3), (8, 2), (2, 5), (7, 3)]:
        x = jnp.array(rng.integers(0, 1 << 32, size=500, dtype=np.uint32))
        rounded = decomposition.closest_representable(x, base_log, levels)
        digits = decomposition.decompose_levels(rounded, base_log, levels)
        # digit range [-B/2, B/2]
        half = 1 << (base_log - 1)
        assert int(jnp.max(digits)) <= half
        assert int(jnp.min(digits)) >= -half
        rec = decomposition.recompose(digits, base_log, levels, jnp.uint32)
        np.testing.assert_array_equal(np.array(rec), np.array(rounded))


def test_decompose_levels_iter_semantics():
    """Cross-check against a direct transcription of decompose_one_level."""
    rng = np.random.default_rng(7)
    base_log, levels = 4, 3
    vals = rng.integers(0, 1 << 32, size=100, dtype=np.uint32)
    rounded = np.array(decomposition.closest_representable(jnp.array(vals), base_log, levels))
    digits = np.array(decomposition.decompose_levels(jnp.array(rounded), base_log, levels))
    for v, dv in zip(rounded, digits):
        state = int(v) >> (32 - base_log * levels)
        mask = (1 << base_log) - 1
        seq = []  # yields level l, l-1, ..., 1
        for _ in range(levels):
            res = state & mask
            state >>= base_log
            carry = ((res - 1) | state) & res
            carry >>= base_log - 1
            state += carry
            out = (res - (carry << base_log)) % (1 << 32)
            seq.append(out if out < (1 << 31) else out - (1 << 32))
        # our layout: index i = level i+1 -> seq reversed
        np.testing.assert_array_equal(dv, np.array(seq[::-1], dtype=np.int32))


def test_small_sign_decompose_recompose():
    """Keyswitch decomposition recomposes to the rounded value."""
    rng = np.random.default_rng(8)
    base_log, levels = 2, 5
    x = jnp.array(rng.integers(0, 1 << 32, size=300, dtype=np.uint32))
    rounded = decomposition.closest_representable(x, base_log, levels)
    digits = decomposition.small_sign_decompose(rounded, base_log, levels)
    half = 1 << (base_log - 1)
    assert int(jnp.max(digits)) <= half
    assert int(jnp.min(digits)) >= -half
    rec = decomposition.recompose(digits, base_log, levels, jnp.uint32)
    np.testing.assert_array_equal(np.array(rec), np.array(rounded))


def test_monomial_mul_reference_vectors():
    """Doc examples from polynomial.rs:678-744 (u8 -> we use u32 mod 2^32)."""
    poly = jnp.array([[1, 2, 3]], dtype=jnp.uint32)
    got = np.array(polynomial.negacyclic_monomial_mul(poly, jnp.array([2])))
    # [1,2,3] * X^2 = -2 - 3X + X^2 mod X^3+1
    np.testing.assert_array_equal(
        got[0], np.array([-2, -3, 1], dtype=np.int64).astype(np.uint32)
    )
    got = np.array(polynomial.negacyclic_monomial_div(poly, jnp.array([2])))
    np.testing.assert_array_equal(
        got[0], np.array([3, -1, -2], dtype=np.int64).astype(np.uint32)
    )


def test_monomial_mul_div_roundtrip_and_wrap():
    rng = np.random.default_rng(9)
    n = 64
    poly = jnp.array(rng.integers(0, 1 << 32, size=(5, n), dtype=np.uint32))
    degrees = jnp.array(rng.integers(0, 2 * n, size=5))
    rot = polynomial.negacyclic_monomial_mul(poly, degrees)
    back = polynomial.negacyclic_monomial_div(rot, degrees)
    np.testing.assert_array_equal(np.array(back), np.array(poly))
    # degree N = negation
    full = polynomial.negacyclic_monomial_mul(poly, jnp.full((5,), n))
    np.testing.assert_array_equal(np.array(full), (-np.array(poly)).astype(np.uint32))


def test_multisum_negacyclic_binary():
    rng = np.random.default_rng(10)
    n, k = 32, 2
    torus = rng.integers(0, 1 << 32, size=(k, n), dtype=np.uint32)
    key = rng.integers(0, 2, size=(k, n), dtype=np.uint32)
    got = np.array(polynomial.multisum_negacyclic(jnp.array(torus), jnp.array(key), 32))
    expected = np.zeros(n, dtype=np.uint32)
    for j in range(k):
        expected += polynomial.polymul_wrapping_naive(torus[j], key[j].astype(np.uint32))
    np.testing.assert_array_equal(got, expected)


def test_roll_ntt_roundtrip_and_consistency():
    """Roll-based stacked NTT: roundtrip + polymul agreement with the
    per-prime Stockham path."""
    n = 64
    primes = ntt.DEFAULT_PRIMES[:2]
    rp = ntt.make_roll_plans(n, primes)
    rng = np.random.default_rng(11)
    a = rng.integers(0, primes[1], size=(2, 3, n), dtype=np.uint32)
    x = jnp.array(a)
    back = np.array(jax.jit(lambda v: ntt.inverse_roll(rp, ntt.forward_roll(rp, v)))(x))
    np.testing.assert_array_equal(back, a)
    # polymul agreement per prime
    b = rng.integers(0, primes[1], size=(2, 1, n), dtype=np.uint32)
    y = jnp.array(b)
    spec = jax.jit(lambda u, v: ntt.inverse_roll(
        rp, rp.mont_mul(ntt.forward_roll(rp, u), ntt.forward_roll(rp, v))))(x, y)
    for pi, p in enumerate(primes):
        plan = ntt.make_plan(n, p)
        ref = np.array(jax.jit(
            lambda u, v: ntt.negacyclic_polymul_mod_p(plan, u, v)
        )(x[pi] % np.uint32(p), y[pi] % np.uint32(p)))
        np.testing.assert_array_equal(np.array(spec)[pi], ref)
