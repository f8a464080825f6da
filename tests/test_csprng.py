"""CSPRNG conformance tests.

AES core is pinned by the FIPS-197 test vector (the same vector the reference
uses, concrete-csprng/src/software.rs:152-154); the counter/fork state machine
is tested against the reference semantics (counter/mod.rs)."""

import numpy as np
import pytest

from concrete_tpu.csprng import aes
from concrete_tpu.csprng.generator import AesCtrGenerator, State
from concrete_tpu.csprng.random import RandomGenerator
from concrete_tpu.csprng.encryption import EncryptionRandomGenerator


def test_aes_fips_197_vector():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    plaintext = bytes.fromhex("00112233445566778899aabbccddeeff")
    expected = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    rk = aes.key_schedule(key)
    blocks = np.frombuffer(plaintext, dtype=np.uint8).reshape(1, 16).copy()
    out = aes.encrypt_blocks(np.repeat(blocks, 8, axis=0), rk)
    for i in range(8):
        assert bytes(out[i]) == expected


def test_batch_is_eight_counter_blocks():
    """A 128-byte batch = AES(ctr..ctr+7) little-endian (software.rs:76-89)."""
    g = AesCtrGenerator(key=12345)
    stream = g.generate_bytes(128)
    rk = aes.key_schedule((12345).to_bytes(16, "little"))
    blocks = np.stack(
        [np.frombuffer(int(c).to_bytes(16, "little"), dtype=np.uint8) for c in range(8)]
    )
    expected = aes.encrypt_blocks(blocks, rk).reshape(-1)
    np.testing.assert_array_equal(stream, expected)


def test_byte_at_a_time_matches_bulk():
    g1 = AesCtrGenerator(key=7)
    g2 = AesCtrGenerator(key=7)
    bulk = g1.generate_bytes(300)
    singles = np.array([g2.generate_next() for _ in range(300)], dtype=np.uint8)
    np.testing.assert_array_equal(bulk, singles)


def test_state_successor_semantics():
    """increment: byte_ctr wraps at 128, aes_ctr += 8 (counter/mod.rs:140-153)."""
    s = State(aes_ctr=0, byte_ctr=127)
    s2 = s.shifted(1)
    assert s2.aes_ctr == 8 and s2.byte_ctr == 0
    s3 = State(aes_ctr=2, byte_ctr=5).shifted(1)
    assert s3.gpos == State(aes_ctr=2, byte_ctr=6).gpos


def test_fork_disjoint_and_parent_shift():
    parent = AesCtrGenerator(key=99)
    ref = AesCtrGenerator(key=99)
    full = ref.generate_bytes(5 * 50 + 64)

    children = parent.try_fork(5, 50)
    for i, child in enumerate(children):
        assert child.remaining_bytes() == 50
        got = child.generate_bytes(50)
        np.testing.assert_array_equal(got, full[i * 50 : (i + 1) * 50])
        assert child.remaining_bytes() == 0
        with pytest.raises(RuntimeError):
            child.generate_bytes(1)
    # parent continues right after the children ranges
    np.testing.assert_array_equal(parent.generate_bytes(64), full[250:314])


def test_nested_fork():
    parent = AesCtrGenerator(key=4)
    ref = AesCtrGenerator(key=4)
    full = ref.generate_bytes(100)
    (child,) = parent.try_fork(1, 100)
    grandchildren = child.try_fork(4, 25)
    for i, gc in enumerate(grandchildren):
        np.testing.assert_array_equal(gc.generate_bytes(25), full[25 * i : 25 * (i + 1)])
    with pytest.raises(RuntimeError):
        child.try_fork(1, 1)  # budget exhausted


def test_bounded_generator_refuses_overrun():
    parent = AesCtrGenerator(key=1)
    (child,) = parent.try_fork(1, 10)
    child.generate_bytes(10)
    with pytest.raises(RuntimeError):
        child.generate_bytes(1)


def test_uniform_array_layout():
    """u32 values are 4 little-endian stream bytes (uniform.rs)."""
    g = RandomGenerator(seed=5)
    vals = g.random_uniform_array(10, 32)
    g2 = RandomGenerator(seed=5)
    raw = g2.generate_bytes(40)
    expected = np.array(
        [int.from_bytes(bytes(raw[4 * i : 4 * i + 4]), "little") for i in range(10)],
        dtype=np.uint32,
    )
    np.testing.assert_array_equal(vals, expected)


def test_binary_is_one_byte_lsb():
    g = RandomGenerator(seed=5)
    bits = g.random_uniform_binary_array(100)
    g2 = RandomGenerator(seed=5)
    raw = g2.generate_bytes(100)
    np.testing.assert_array_equal(bits, (raw & 1).astype(np.uint32))


def test_ternary_rejection_consumption():
    """Sequential rejection on byte & 3 (uniform_ternary.rs)."""
    g = RandomGenerator(seed=5)
    vals = g.random_uniform_ternary_array(50)
    # sequential re-implementation
    g2 = RandomGenerator(seed=5)
    expected = []
    while len(expected) < 50:
        b = g2.generate_next() & 3
        if b == 0:
            expected.append(0)
        elif b == 1:
            expected.append(1)
        elif b == 2:
            expected.append((1 << 32) - 1)
    np.testing.assert_array_equal(vals, np.array(expected, dtype=np.uint32))
    # generator state advanced identically
    np.testing.assert_array_equal(g.generate_bytes(8), g2.generate_bytes(8))


def test_gaussian_sequential_equivalence():
    """Vectorized speculative sampling == sequential Marsaglia polar."""
    g = RandomGenerator(seed=42)
    u, v = g.random_gaussian_pairs(200, 0.0, 1.0)

    g2 = RandomGenerator(seed=42)
    exp_u, exp_v = [], []
    while len(exp_u) < 200:
        raw = bytes(g2.generate_bytes(16))
        a = int.from_bytes(raw[:8], "little", signed=True) * 2.0 ** -63
        b = int.from_bytes(raw[8:], "little", signed=True) * 2.0 ** -63
        s = a * a + b * b
        if 0.0 < s < 1.0:
            cst = np.sqrt(-2.0 * np.log(s) / s)
            exp_u.append(a * cst)
            exp_v.append(b * cst)
    np.testing.assert_array_equal(u, np.array(exp_u))
    np.testing.assert_array_equal(v, np.array(exp_v))
    np.testing.assert_array_equal(g.generate_bytes(8), g2.generate_bytes(8))


def test_gaussian_statistics():
    g = RandomGenerator(seed=7)
    vals = g.fill_gaussian_float(100_000, 0.0, 2.0)
    assert abs(vals.mean()) < 0.05
    assert abs(vals.std() - 2.0) < 0.05


def test_gaussian_torus_statistics():
    from concrete_tpu.torus import into_signed_torus_f64

    g = RandomGenerator(seed=8)
    std = 2.0 ** -15
    vals = g.fill_gaussian_torus(50_000, std, 32)
    f = into_signed_torus_f64(vals, 32)
    assert abs(f.std() - std) / std < 0.05


def test_uniformity():
    g = RandomGenerator(seed=3)
    raw = g.generate_bytes(1_000_000)
    counts = np.bincount(raw, minlength=256) / 1_000_000
    assert np.all(np.abs(counts - 1 / 256) < 1e-4 * 3)


def test_encryption_generator_budgets():
    from concrete_tpu.csprng import encryption as enc

    # DEFAULT_PARAMETERS ggsw budget: l=2, k+1=3, N=512, u32
    assert enc.mask_bytes_per_ggsw(32, 2, 3, 512) == 2 * 3 * 2 * 512 * 4
    assert enc.noise_bytes_per_ggsw(2, 3, 512) == 2 * 3 * 512 * 256

    g = EncryptionRandomGenerator(mask_seed=1, noise_seed=2)
    children = g.fork_bsk_to_ggsw(32, 4, 2, 3, 512)
    assert len(children) == 4
    assert children[0].remaining_bytes() == enc.mask_bytes_per_ggsw(32, 2, 3, 512)


def test_fork_matches_serial_mask_stream():
    """Forked children consume the same mask bytes serial generation would."""
    g = EncryptionRandomGenerator(mask_seed=11, noise_seed=12)
    children = g.fork_ggsw_level_to_glwe(32, 3, 64)
    serial = RandomGenerator(seed=11)
    for child in children:
        got = child.fill_mask(2 * 64, 32)  # k=2 polys of 64 coeffs
        np.testing.assert_array_equal(got, serial.random_uniform_array(2 * 64, 32))
        # child mask budget = exactly the mask it generates
        assert child.mask.remaining_bytes() == 0


def test_uniform_with_zeros_vectorized_matches_sequential():
    """The vectorized uniform-with-zeros sampler must consume the stream
    byte-for-byte like the sequential reference loop: same values, same
    final generator position, for every width and zero-probability."""
    from concrete_tpu.csprng.random import RandomGenerator

    for bits in (8, 16, 32, 64):
        for prob in (0.0, 0.3, 0.9, 1.0):
            for size in (1, 7, 64, 257):
                a = RandomGenerator(seed=42)
                b = RandomGenerator(seed=42)
                va = a.random_uniform_with_zeros_array(size, prob, bits)
                vb = b._random_uniform_with_zeros_sequential(size, prob, bits)
                np.testing.assert_array_equal(va, vb)
                assert a.inner.state.gpos == b.inner.state.gpos, (bits, prob, size)
                # interleaved follow-up draw sees an identical stream
                np.testing.assert_array_equal(
                    a.random_uniform_array(4), b.random_uniform_array(4))


def test_uniform_with_zeros_bounded_raises_like_sequential():
    """A bounded generator too small for the actual consumption must raise,
    exactly as the sequential loop does when it steps past the bound."""
    from concrete_tpu.csprng.random import RandomGenerator

    parent = RandomGenerator(seed=5)
    child = parent.try_fork(1, 40)[0]  # 40 bytes: not enough for 16 draws
    with np.testing.assert_raises(RuntimeError):
        child.random_uniform_with_zeros_array(16, 0.0, 32)


def test_batch_gaussian_matches_sequential():
    """batch_fill_gaussian_torus must equal the per-generator sequential
    draws bit-for-bit — values AND final stream positions — across widths,
    sizes (odd included) and mid-block start offsets."""
    from concrete_tpu.csprng.random import RandomGenerator, batch_fill_gaussian_torus

    for bits in (32, 64):
        for size in (2, 15, 64, 257):
            pa = RandomGenerator(seed=9)
            pb = RandomGenerator(seed=9)
            # budget like the keygen fork (noise_bytes_per_coef = 256/value);
            # +3 makes every child start mid-block (offset handling)
            pa.generate_bytes(3)
            pb.generate_bytes(3)
            ga = pa.try_fork(24, size * 256)
            gb = pb.try_fork(24, size * 256)
            want = np.stack(
                [g.fill_gaussian_torus(size, 2.0**-8, bits) for g in ga])
            got = batch_fill_gaussian_torus(gb, size, 2.0**-8, bits)
            np.testing.assert_array_equal(want, got)
            for a, b in zip(ga, gb):
                assert a.inner.state.gpos == b.inner.state.gpos, (bits, size)


def test_batch_gaussian_straggler_path():
    """Rows whose first speculative chunk yields too few accepted attempts
    must fall back to the sequential rejection loop with identical bytes.
    The real acceptance rate (pi/4) makes stragglers ~3e-4/row, so force
    them deterministically with a stricter acceptance predicate (patched
    into BOTH paths — they resolve the module global at call time)."""
    import concrete_tpu.csprng.random as crandom
    from concrete_tpu.csprng.random import RandomGenerator, batch_fill_gaussian_torus

    orig = crandom._gaussian_attempt_eval

    def strict(raw):
        accept, uv = orig(raw)
        s = uv[:, 0] ** 2 + uv[:, 1] ** 2
        return accept & (s < 0.25), uv

    crandom._gaussian_attempt_eval = strict
    try:
        pa = RandomGenerator(seed=31)
        pb = RandomGenerator(seed=31)
        ga = pa.try_fork(16, 64 * 1024)
        gb = pb.try_fork(16, 64 * 1024)
        want = np.stack([g.fill_gaussian_torus(64, 2.0**-8, 32) for g in ga])
        got = batch_fill_gaussian_torus(gb, 64, 2.0**-8, 32)
        np.testing.assert_array_equal(want, got)
        for a, b in zip(ga, gb):
            assert a.inner.state.gpos == b.inner.state.gpos
    finally:
        crandom._gaussian_attempt_eval = orig


def test_batch_gaussian_bound_respected():
    """A child too small for even one attempt must raise like the
    sequential sampler."""
    from concrete_tpu.csprng.random import RandomGenerator, batch_fill_gaussian_torus

    parent = RandomGenerator(seed=6)
    kids = parent.try_fork(2, 8)  # 8 bytes < one 16-byte attempt
    with np.testing.assert_raises(RuntimeError):
        batch_fill_gaussian_torus(kids, 4, 2.0**-8, 32)


def test_bsk_generate_batched_matches_sequential():
    """StandardBootstrapKey.generate(batched=True) — the production path —
    must produce the identical key tensor and leave the parent generators
    at the identical stream positions as the per-bit sequential draw
    (par_fill_with_new_key determinism, bootstrap/standard/mod.rs:254)."""
    from concrete_tpu.core import glwe as glwe_mod
    from concrete_tpu.core import lwe as lwe_mod
    from concrete_tpu.core.ggsw import StandardBootstrapKey
    from concrete_tpu.csprng import EncryptionRandomGenerator, SecretRandomGenerator

    for (dim, k, n, bl, lv, bits) in [
        (12, 2, 16, 4, 2, 32),
        (9, 1, 32, 7, 3, 32),
        (7, 3, 16, 5, 2, 64),
    ]:
        sgen = SecretRandomGenerator(42)
        lwe_sk = lwe_mod.LweSecretKey.generate_binary(dim, sgen, bits)
        glwe_sk = glwe_mod.GlweSecretKey.generate_binary(k, n, sgen, bits)
        g1 = EncryptionRandomGenerator(43, 44)
        g2 = EncryptionRandomGenerator(43, 44)
        b_seq = StandardBootstrapKey.generate(
            lwe_sk, glwe_sk, bl, lv, 2.0**-8, g1, batched=False)
        b_bat = StandardBootstrapKey.generate(
            lwe_sk, glwe_sk, bl, lv, 2.0**-8, g2)
        np.testing.assert_array_equal(b_seq.data, b_bat.data)
        assert g1.mask.inner.state.gpos == g2.mask.inner.state.gpos
        assert g1.noise.inner.state.gpos == g2.noise.inner.state.gpos
