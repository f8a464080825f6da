"""Op-surface parity tests for the high-level API additions: every LWE /
VectorLWE / VectorRLWE variant of the reference user API, with
assert_eq_granularity-style bounds (concrete/src/lib.rs:25-37).

Reference bodies: concrete/src/lwe/mod.rs (encrypt_raw :168,
add_with_padding_exact :858, sub_with_padding_exact :1095, opposite :1531),
concrete/src/vector_lwe/mod.rs (copy_in_nth_nth :115, several_encoders :332,
encrypt_raw :454, decrypt_raw :565, add_with_new_min :862,
mul_from_bootstrap_nth :2225), concrete/src/vector_rlwe/mod.rs (encrypt :287,
encode_encrypt :365, encrypt_packed_raw :423, decrypt_with_encoders :618,
add_centered :895, add/sub_with_padding :1000/:1104,
mul_constant_with_padding :1284, nb_valid :1488), plaintext/mod.rs.
"""

import numpy as np
import pytest

from concrete_tpu.highlevel import (
    LWE,
    Encoder,
    LWESecretKey,
    LWEParams,
    Plaintext,
    RLWESecretKey,
    RLWEParams,
    VectorLWE,
    VectorRLWE,
)
from concrete_tpu.highlevel import errors

SK_PARAMS = LWEParams(dimension=32, log2_std_dev=-40)
RLWE_PARAMS = RLWEParams(polynomial_size=128, dimension=1, log2_std_dev=-45)


def assert_eq_granularity(enc, got, expected):
    np.testing.assert_array_less(np.abs(np.asarray(got) - expected), enc.get_granularity())


@pytest.fixture(scope="module")
def sk():
    return LWESecretKey.new(SK_PARAMS, secret_seed=1)


@pytest.fixture(scope="module")
def sk_rlwe():
    return RLWESecretKey.new(RLWE_PARAMS, secret_seed=2)


# -- Plaintext container ------------------------------------------------------


def test_plaintext_encode_decode_roundtrip():
    enc = Encoder.new(-5.0, 5.0, 7, 1)
    p = Plaintext.encode([-3.5, 0.25, 4.0], enc)
    assert p.nb_plaintexts == 3
    assert_eq_granularity(enc, p.decode(), [-3.5, 0.25, 4.0])
    assert abs(p.decode_nth(1) - 0.25) < enc.get_granularity()


def test_plaintext_zero_and_encoder_setters():
    p = Plaintext.zero(4)
    assert all(not e.is_valid() for e in p.encoders)
    enc = Encoder.new(0.0, 8.0, 5, 0)
    p.set_encoders_from_one(enc)
    p.encode_inplace([1.0, 2.0, 3.0, 4.0])
    assert_eq_granularity(enc, p.decode(), [1.0, 2.0, 3.0, 4.0])
    p.set_nth_encoder(2, Encoder.new(0.0, 16.0, 5, 0))
    assert p.encoders[2].delta > enc.delta


def test_plaintext_serde_roundtrip(tmp_path):
    enc = Encoder.new(0.0, 10.0, 6, 1)
    p = Plaintext.encode([1.5, 9.0], enc)
    path = str(tmp_path / "pt.npz")
    p.save(path)
    back = Plaintext.load(path)
    np.testing.assert_array_equal(back.plaintexts, p.plaintexts)
    assert back.encoders[0].delta == p.encoders[0].delta


# -- LWE additions -------------------------------------------------------------


def test_lwe_encrypt_raw_decrypt_raw(sk):
    pts = np.array([1 << 62, 123 << 40], dtype=np.uint64)
    ct = LWE.encrypt_raw(sk, pts, mask_seed=10, noise_seed=11)
    assert not ct.encoder.is_valid()
    phase = ct.decrypt_raw(sk)
    # phase = pt + noise; the key noise is ~2^-40 of the torus = ~2^24 abs
    err = np.minimum(phase - pts, pts - phase)  # wrapping distance
    np.testing.assert_array_less(err.astype(np.float64), 2.0 ** 30)


def test_lwe_encrypt_raw_noiseless_key_raises():
    sk0 = LWESecretKey.new(LWEParams(dimension=16, log2_std_dev=-70), secret_seed=3)
    with pytest.raises(errors.NoNoiseInCiphertext):
        LWE.encrypt_raw(sk0, np.array([0], dtype=np.uint64))


def test_lwe_add_with_padding_exact(sk):
    enc = Encoder.new(0.0, 255.0, 8, 1)
    a = LWE.encode_encrypt(sk, 106.0, enc, mask_seed=12, noise_seed=13)
    b = LWE.encode_encrypt(sk, 4.0, enc, mask_seed=14, noise_seed=15)
    out = a.add_with_padding_exact(b)
    # precision grows: max(8, 8) + 1 (minus any noise clamp)
    assert out.encoder.nb_bit_padding == 0
    got = out.decrypt_decode(sk)
    assert abs(got - 110.0) < out.encoder.get_granularity()


def test_lwe_sub_with_padding_exact(sk):
    enc = Encoder.new(0.0, 255.0, 8, 1)
    a = LWE.encode_encrypt(sk, 106.0, enc, mask_seed=16, noise_seed=17)
    b = LWE.encode_encrypt(sk, 4.0, enc, mask_seed=18, noise_seed=19)
    out = a.sub_with_padding_exact(b)
    got = out.decrypt_decode(sk)
    assert abs(got - 102.0) < out.encoder.get_granularity()


def test_lwe_padding_exact_checks(sk):
    enc0 = Encoder.new(0.0, 255.0, 8, 0)
    a = LWE.encode_encrypt(sk, 10.0, enc0, mask_seed=20, noise_seed=21)
    with pytest.raises(errors.NotEnoughPaddingError):
        a.add_with_padding_exact(a)
    enc1 = Encoder.new(0.0, 255.0, 8, 1)
    b = LWE.encode_encrypt(sk, 10.0, enc1, mask_seed=22, noise_seed=23)
    with pytest.raises(errors.PaddingError):
        b.add_with_padding_exact(a)


def test_lwe_opposite_decodes_negation(sk):
    # the body correction (lwe/mod.rs:1550-1563) — without it the decode is
    # one granularity off
    for padding in (0, 2):
        enc = Encoder.new(-10.0, 10.0, 6, padding)
        ct = LWE.encode_encrypt(sk, 4.0, enc, mask_seed=24 + padding, noise_seed=25 + padding)
        op = ct.opposite()
        assert abs(op.decrypt_decode(sk) - (-4.0)) < enc.get_granularity()
        back = op.opposite()
        assert abs(back.decrypt_decode(sk) - 4.0) < enc.get_granularity()


# -- VectorLWE additions ---------------------------------------------------------


def test_vector_lwe_encrypt_plaintext_and_raw(sk):
    enc = Encoder.new(0.0, 10.0, 6, 1)
    p = Plaintext.encode([2.0, 8.0], enc)
    v = VectorLWE.encrypt(sk, p, mask_seed=30, noise_seed=31)
    assert_eq_granularity(enc, v.decrypt_decode(sk), [2.0, 8.0])
    raw = v.decrypt_raw(sk)
    assert raw.shape == (2,)
    # raw phases decode through the same encoders
    assert abs(enc.decode_core(raw[0]) - 2.0) < enc.get_granularity()


def test_vector_lwe_encrypt_raw_zero_encoders(sk):
    v = VectorLWE.zero(sk.dimension, 2)
    v.encrypt_raw_inplace(sk, np.array([5 << 60, 1 << 61], dtype=np.uint64),
                          mask_seed=32, noise_seed=33)
    assert all(not e.is_valid() for e in v.encoders)
    assert v.variances[0] > 0


def test_vector_lwe_several_encoders(sk):
    encs = [Encoder.new(0.0, 10.0, 6, 1), Encoder.new(-100.0, 100.0, 6, 1)]
    v = VectorLWE.encode_encrypt_several_encoders(
        sk, [7.0, -55.0], encs, mask_seed=34, noise_seed=35
    )
    dec = v.decrypt_decode(sk)
    assert abs(dec[0] - 7.0) < encs[0].get_granularity()
    assert abs(dec[1] + 55.0) < encs[1].get_granularity()


def test_vector_lwe_copy_in_nth_nth(sk):
    enc = Encoder.new(0.0, 10.0, 6, 1)
    a = VectorLWE.encode_encrypt(sk, [1.0, 2.0], enc, mask_seed=36, noise_seed=37)
    b = VectorLWE.encode_encrypt(sk, [8.0, 9.0], enc, mask_seed=38, noise_seed=39)
    a.copy_in_nth_nth_inplace(0, b, 1)
    dec = a.decrypt_decode(sk)
    assert abs(dec[0] - 9.0) < enc.get_granularity()
    assert abs(dec[1] - 2.0) < enc.get_granularity()
    with pytest.raises(errors.IndexError_):
        a.copy_in_nth_nth_inplace(5, b, 0)


def test_vector_lwe_add_with_new_min_per_slot(sk):
    enc = Encoder.new(0.0, 10.0, 6, 1)
    a = VectorLWE.encode_encrypt(sk, [3.0, 6.0], enc, mask_seed=40, noise_seed=41)
    b = VectorLWE.encode_encrypt(sk, [4.0, 2.0], enc, mask_seed=42, noise_seed=43)
    out = a.add_with_new_min(b, [5.0, 6.0])  # per-slot minima
    dec = out.decrypt_decode(sk)
    assert abs(dec[0] - 7.0) < out.encoders[0].get_granularity()
    assert abs(dec[1] - 8.0) < out.encoders[1].get_granularity()
    assert out.encoders[0].o == 5.0 and out.encoders[1].o == 6.0


def test_vector_lwe_mul_constant_with_padding_vectorized(sk):
    enc = Encoder.new(-2.0, 2.0, 5, 3)
    a = VectorLWE.encode_encrypt(sk, [1.0, -1.5], enc, mask_seed=44, noise_seed=45)
    out = a.mul_constant_with_padding([2.0, -3.0], 4.0, 2)
    dec = out.decrypt_decode(sk)
    assert abs(dec[0] - 2.0) < 4 * out.encoders[0].get_granularity()
    assert abs(dec[1] - 4.5) < 4 * out.encoders[1].get_granularity()


def test_vector_lwe_decrypt_decode_round(sk):
    enc = Encoder.new(0.0, 15.0, 4, 1)
    v = VectorLWE.encode_encrypt(sk, [3.0, 11.0], enc, mask_seed=46, noise_seed=47)
    np.testing.assert_allclose(v.decrypt_decode_round(sk), [3.0, 11.0], atol=1e-9)


# -- VectorRLWE per-coefficient semantics -----------------------------------------


def test_vector_rlwe_encrypt_nonpacked(sk_rlwe):
    enc = Encoder.new(0.0, 16.0, 6, 1)
    v = VectorRLWE.encode_encrypt(sk_rlwe, [3.0, 12.0], enc, mask_seed=50, noise_seed=51)
    assert v.nb_ciphertexts == 2  # one RLWE per message
    assert v.nb_valid() == 2      # only constant coefficients valid
    dec = v.decrypt_decode(sk_rlwe)
    assert_eq_granularity(enc, dec, [3.0, 12.0])


def test_vector_rlwe_encrypt_plaintext_nonpacked(sk_rlwe):
    enc = Encoder.new(0.0, 16.0, 6, 1)
    p = Plaintext.encode([5.0, 9.0], enc)
    v = VectorRLWE.encrypt(sk_rlwe, p, mask_seed=52, noise_seed=53)
    msgs, encs = v.decrypt_with_encoders(sk_rlwe)
    assert_eq_granularity(enc, msgs, [5.0, 9.0])
    assert len(encs) == 2 and all(e.is_valid() for e in encs)


def test_vector_rlwe_encrypt_packed_raw(sk_rlwe):
    n = sk_rlwe.polynomial_size
    v = VectorRLWE.zero(n, sk_rlwe.dimension, 1)
    pts = np.arange(n, dtype=np.uint64) << np.uint64(50)
    v.encrypt_packed_raw(sk_rlwe, pts, mask_seed=54, noise_seed=55)
    assert v.nb_valid() == 0  # encoders untouched
    with pytest.raises(errors.DimensionError):
        v.encrypt_packed_raw(sk_rlwe, pts[: n // 2 + 1])


def test_vector_rlwe_add_with_padding(sk_rlwe):
    enc = Encoder.new(0.0, 16.0, 6, 1)
    a = VectorRLWE.encode_encrypt_packed(sk_rlwe, [1.0, 2.0], enc, mask_seed=56, noise_seed=57)
    b = VectorRLWE.encode_encrypt_packed(sk_rlwe, [4.0, 8.0], enc, mask_seed=58, noise_seed=59)
    out = a.add_with_padding(b)
    dec = out.decrypt_decode(sk_rlwe)
    g = out.encoders[0].get_granularity()
    np.testing.assert_array_less(np.abs(dec - [5.0, 10.0]), g)
    assert out.encoders[0].nb_bit_padding == 0


def test_vector_rlwe_sub_with_padding(sk_rlwe):
    enc = Encoder.new(0.0, 16.0, 6, 1)
    a = VectorRLWE.encode_encrypt_packed(sk_rlwe, [9.0, 12.0], enc, mask_seed=60, noise_seed=61)
    b = VectorRLWE.encode_encrypt_packed(sk_rlwe, [4.0, 2.0], enc, mask_seed=62, noise_seed=63)
    out = a.sub_with_padding(b)
    dec = out.decrypt_decode(sk_rlwe)
    g = out.encoders[0].get_granularity()
    np.testing.assert_array_less(np.abs(dec - [5.0, 10.0]), g)


def test_vector_rlwe_add_centered(sk_rlwe):
    enc = Encoder.new_centered(0.0, 8.0, 6, 1)
    a = VectorRLWE.encode_encrypt_packed(sk_rlwe, [3.0, -2.0], enc, mask_seed=64, noise_seed=65)
    b = VectorRLWE.encode_encrypt_packed(sk_rlwe, [1.0, -4.0], enc, mask_seed=66, noise_seed=67)
    out = a.add_centered(b)
    dec = out.decrypt_decode(sk_rlwe)
    g = out.encoders[0].get_granularity()
    np.testing.assert_array_less(np.abs(dec - [4.0, -6.0]), 2 * g)


def test_vector_rlwe_mul_constant_with_padding(sk_rlwe):
    enc = Encoder.new(-2.0, 2.0, 5, 3)
    a = VectorRLWE.encode_encrypt_packed(
        sk_rlwe, [1.0, -0.5], enc, mask_seed=68, noise_seed=69)
    out = a.mul_constant_with_padding([2.0], 4.0, 2)
    dec = out.decrypt_decode(sk_rlwe)
    encs = [e for e in out.encoders if e.is_valid()]
    assert abs(dec[0] - 2.0) < 4 * encs[0].get_granularity()
    assert abs(dec[1] + 1.0) < 4 * encs[1].get_granularity()
    # negative constant goes through the opposite path
    out2 = a.mul_constant_with_padding([-2.0], 4.0, 2)
    dec2 = out2.decrypt_decode(sk_rlwe)
    encs2 = [e for e in out2.encoders if e.is_valid()]
    assert abs(dec2[0] + 2.0) < 4 * encs2[0].get_granularity()
    assert abs(dec2[1] - 1.0) < 4 * encs2[1].get_granularity()


def test_vector_rlwe_add_constant_families(sk_rlwe):
    enc = Encoder.new(0.0, 16.0, 6, 1)
    a = VectorRLWE.encode_encrypt_packed(sk_rlwe, [1.0, 2.0], enc, mask_seed=70, noise_seed=71)
    out = a.add_constant_static_encoder([3.0, 4.0])
    dec = out.decrypt_decode(sk_rlwe)
    assert_eq_granularity(enc, dec, [4.0, 6.0])
    out2 = a.add_constant_dynamic_encoder([1.0, 1.0])
    dec2 = out2.decrypt_decode(sk_rlwe)
    assert_eq_granularity(enc, dec2, [2.0, 3.0])


def test_vector_rlwe_constant_ops_nonpacked_mixed_signs(sk_rlwe):
    """The vectorized constant-op paths over NON-packed ciphertexts: most
    coefficient slots carry the invalid zero encoder (one message per RLWE,
    constant coefficient only), two ciphertexts with different-sign
    constants exercise the per-ciphertext broadcast + selective negation."""
    enc = Encoder.new(-4.0, 4.0, 6, 3)
    a = VectorRLWE.encode_encrypt(
        sk_rlwe, [1.5, -1.0], enc, mask_seed=80, noise_seed=81)
    assert a.nb_valid() == 2 and a.nb_ciphertexts == 2

    # products must stay inside the STATIC interval [-4, 4+margin)
    out = a.mul_constant_static_encoder([2, -3])
    dec = out.decrypt_decode(sk_rlwe)
    encs = [e for e in out.encoders if e.is_valid()]
    assert abs(dec[0] - 3.0) < 4 * encs[0].get_granularity()
    assert abs(dec[1] - 3.0) < 4 * encs[1].get_granularity()
    # invalid slots stay invalid and keep zeroed corrections
    assert out.nb_valid() == 2

    out2 = a.mul_constant_with_padding([2.0, -2.0], 4.0, 2)
    dec2 = out2.decrypt_decode(sk_rlwe)
    encs2 = [e for e in out2.encoders if e.is_valid()]
    assert abs(dec2[0] - 3.0) < 4 * encs2[0].get_granularity()
    assert abs(dec2[1] - 2.0) < 4 * encs2[1].get_granularity()
    assert out2.nb_valid() == 2
    # padding is consumed
    assert all(e.nb_bit_padding == enc.nb_bit_padding - 2 for e in encs2)


def test_vector_rlwe_add_constant_rounding_context(sk_rlwe):
    """add_constant_static_encoder through a rounding-context encoder hits
    the vectorized variable-precision closest-representable path."""
    enc = Encoder.new_rounding_context(0.0, 16.0, 5, 2)
    a = VectorRLWE.encode_encrypt_packed(
        sk_rlwe, [2.0, 6.0], enc, mask_seed=82, noise_seed=83)
    out = a.add_constant_static_encoder([3.0, 4.0])
    dec = out.decrypt_decode(sk_rlwe)
    assert_eq_granularity(enc, dec, [5.0, 10.0])


def test_lwebsk_fast_mode_function_bootstrap(sk):
    """u64 fast mode: LWEBSK.with_fast_mode drops low GGSW limbs / levels
    over the same key material; the functional bootstrap stays correct and
    the tracked variance includes the truncation term."""
    from concrete_tpu.highlevel import LWEBSK, RLWESecretKey, RLWEParams

    rlwe = RLWESecretKey.new(
        RLWEParams(polynomial_size=256, dimension=1, log2_std_dev=-50),
        secret_seed=90)
    bsk = LWEBSK.new(sk, rlwe, base_log=8, level=3, mask_seed=91, noise_seed=92)
    fast = bsk.with_fast_mode(limb_drop=2, levels=2)
    assert fast.cfg.pbs_level == 2 and fast.cfg.mxu_limb_drop == 2
    assert fast.coefficient_bsk.shape[1] == 2
    # variance tracking: fast >= exact, both finite
    v_exact = bsk.bootstrap_output_variance(sk.dimension)
    v_fast = fast.bootstrap_output_variance(sk.dimension)
    assert v_fast >= v_exact > 0
    enc = Encoder.new(0.0, 8.0, 3, 1)
    ct = LWE.encode_encrypt(sk, 5.0, enc, mask_seed=93, noise_seed=94)
    out = ct.bootstrap_with_function(fast, lambda x: 7.0 - x, Encoder.new(0.0, 8.0, 3, 1))
    got = out.decrypt_decode(rlwe.to_lwe_secret_key())  # big-key output
    assert abs(got - 2.0) < 1.0, got
