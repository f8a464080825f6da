"""High-level API tests: Encoder semantics, noise-tracked LWE ops, function
bootstrapping (reference: concrete/src/{encoder,lwe,vector_lwe}/tests.rs).

assert_eq_granularity: decode error bounded by the encoder granularity
(concrete/src/lib.rs:25-37)."""

import numpy as np
import pytest

from concrete_tpu.highlevel import (
    LWE,
    LWEBSK,
    LWEKSK,
    Encoder,
    LWESecretKey,
    LWEParams,
    RLWESecretKey,
    RLWEParams,
    VectorLWE,
    VectorRLWE,
)
from concrete_tpu.highlevel import errors


# small insecure params for CPU-speed tests
SK_PARAMS = LWEParams(dimension=32, log2_std_dev=-40)
SK_OUT_PARAMS = LWEParams(dimension=24, log2_std_dev=-40)
RLWE_PARAMS = RLWEParams(polynomial_size=128, dimension=1, log2_std_dev=-45)


def assert_eq_granularity(enc: Encoder, got, expected):
    np.testing.assert_array_less(np.abs(got - expected), enc.get_granularity())


@pytest.fixture(scope="module")
def sk():
    return LWESecretKey.new(SK_PARAMS, secret_seed=1)


def test_encoder_roundtrip():
    enc = Encoder.new(-10.0, 10.0, 8, 2)
    msgs = np.linspace(-10.0, 10.0, 37)
    pts = enc.encode_core(msgs)
    dec = enc.decode_core(pts)
    assert_eq_granularity(enc, dec, msgs)


def test_encoder_out_of_range():
    enc = Encoder.new(0.0, 1.0, 4, 0)
    with pytest.raises(errors.MessageOutsideIntervalError):
        enc.encode_core(2.0)


def test_encoder_rounding_context():
    enc = Encoder.new_rounding_context(0.0, 15.0, 4, 0)
    pts = enc.encode_core(np.array([3.0, 7.0]))
    dec = enc.decode_core(pts)
    np.testing.assert_allclose(dec, [3.0, 7.0], atol=1e-9)


def test_encrypt_decrypt(sk):
    enc = Encoder.new(-5.0, 5.0, 8, 1)
    msgs = np.array([-4.2, 0.0, 3.1415, 4.9])
    ct = LWE.encode_encrypt(sk, msgs, enc, mask_seed=2, noise_seed=3)
    dec = ct.decrypt_decode(sk)
    assert_eq_granularity(enc, dec, msgs)


def test_add_constant_static(sk):
    enc = Encoder.new(0.0, 10.0, 8, 1)
    ct = LWE.encode_encrypt(sk, [2.0, 5.0], enc, mask_seed=4, noise_seed=5)
    out = ct.add_constant_static_encoder([1.5, -2.0])
    dec = out.decrypt_decode(sk)
    assert_eq_granularity(enc, dec, [3.5, 3.0])


def test_add_constant_dynamic(sk):
    enc = Encoder.new(0.0, 10.0, 8, 1)
    ct = LWE.encode_encrypt(sk, [2.0], enc, mask_seed=6, noise_seed=7)
    out = ct.add_constant_dynamic_encoder(4.0)
    dec = out.decrypt_decode(sk)
    assert_eq_granularity(out.encoder, dec, [6.0])


def test_add_with_padding(sk):
    enc = Encoder.new(0.0, 4.0, 6, 2)
    a = LWE.encode_encrypt(sk, [1.0, 2.5], enc, mask_seed=8, noise_seed=9)
    b = LWE.encode_encrypt(sk, [2.0, 1.0], enc, mask_seed=10, noise_seed=11)
    out = a.add_with_padding(b)
    assert out.encoder.nb_bit_padding == 1
    dec = out.decrypt_decode(sk)
    assert_eq_granularity(out.encoder, dec, [3.0, 3.5])


def test_sub_with_padding(sk):
    enc = Encoder.new(0.0, 4.0, 6, 2)
    a = LWE.encode_encrypt(sk, [3.0, 1.0], enc, mask_seed=12, noise_seed=13)
    b = LWE.encode_encrypt(sk, [2.0, 0.5], enc, mask_seed=14, noise_seed=15)
    out = a.sub_with_padding(b)
    dec = out.decrypt_decode(sk)
    assert_eq_granularity(out.encoder, dec, [1.0, 0.5])


def test_add_centered(sk):
    enc = Encoder.new(-2.0, 2.0, 7, 1)
    a = LWE.encode_encrypt(sk, [1.0], enc, mask_seed=16, noise_seed=17)
    b = LWE.encode_encrypt(sk, [-0.5], enc, mask_seed=18, noise_seed=19)
    out = a.add_centered(b)
    dec = out.decrypt_decode(sk)
    assert abs(dec[0] - 0.5) < 2 * enc.get_granularity()


def test_mul_constant_static(sk):
    enc = Encoder.new(-2.0, 2.0, 10, 2)
    ct = LWE.encode_encrypt(sk, [0.5, -0.6], enc, mask_seed=20, noise_seed=21)
    out = ct.mul_constant_static_encoder([3, 3])
    dec = out.decrypt_decode(sk)
    assert_eq_granularity(out.encoder, dec, [1.5, -1.8])


def test_opposite(sk):
    enc = Encoder.new(1.0, 3.0, 8, 1)
    ct = LWE.encode_encrypt(sk, [2.5], enc, mask_seed=22, noise_seed=23)
    out = ct.opposite()
    dec = out.decrypt_decode(sk)
    # negation introduces a one-granularity offset (interval mirroring)
    assert np.abs(dec - [-2.5]).max() <= 1.5 * out.encoder.get_granularity()


def test_keyswitch():
    sk_in = LWESecretKey.new(SK_PARAMS, secret_seed=30)
    sk_out = LWESecretKey.new(SK_OUT_PARAMS, secret_seed=31)
    ksk = LWEKSK.new(sk_in, sk_out, base_log=4, level=8, mask_seed=32, noise_seed=33)
    enc = Encoder.new(0.0, 8.0, 6, 1)
    ct = LWE.encode_encrypt(sk_in, [5.0, 1.0], enc, mask_seed=34, noise_seed=35)
    out = ct.keyswitch(ksk)
    dec = out.decrypt_decode(sk_out)
    assert np.abs(dec - [5.0, 1.0]).max() < 4 * enc.get_granularity()


@pytest.fixture(scope="module")
def bootstrap_setup():
    sk_in = LWESecretKey.new(LWEParams(dimension=16, log2_std_dev=-30), secret_seed=40)
    sk_rlwe = RLWESecretKey.new(RLWE_PARAMS, secret_seed=41)
    bsk = LWEBSK.new(sk_in, sk_rlwe, base_log=10, level=3, mask_seed=42, noise_seed=43)
    sk_big = sk_rlwe.to_lwe_secret_key()
    return sk_in, sk_big, bsk


def test_bootstrap_identity(bootstrap_setup):
    sk_in, sk_big, bsk = bootstrap_setup
    enc = Encoder.new(0.0, 8.0, 4, 1)
    ct = LWE.encode_encrypt(sk_in, [3.0, 6.0, 1.0], enc, mask_seed=44, noise_seed=45)
    out = ct.bootstrap(bsk)
    dec = out.decrypt_decode(sk_big)
    assert np.abs(dec - [3.0, 6.0, 1.0]).max() < 4 * enc.get_granularity()


def test_bootstrap_with_function(bootstrap_setup):
    sk_in, sk_big, bsk = bootstrap_setup
    enc_in = Encoder.new(0.0, 8.0, 4, 1)
    enc_out = Encoder.new(0.0, 64.0, 4, 1)
    ct = LWE.encode_encrypt(sk_in, [2.0, 5.0], enc_in, mask_seed=46, noise_seed=47)
    out = ct.bootstrap_with_function(bsk, lambda x: x * x, enc_out)
    dec = out.decrypt_decode(sk_big)
    assert np.abs(dec - [4.0, 25.0]).max() < 4 * enc_out.get_granularity()


def test_vector_lwe_sum_with_padding(sk):
    enc = Encoder.new(0.0, 2.0, 6, 3)
    v = VectorLWE.encode_encrypt(sk, [0.5, 1.0, 1.5, 0.25], enc, mask_seed=50, noise_seed=51)
    out = v.sum_with_padding()
    dec = out.decrypt_decode(sk)
    assert abs(float(dec) - 3.25) < 4 * out.encoder.get_granularity()


def test_vector_lwe_ops(sk):
    enc = Encoder.new(0.0, 4.0, 6, 2)
    a = VectorLWE.encode_encrypt(sk, [1.0, 2.0], enc, mask_seed=52, noise_seed=53)
    b = VectorLWE.encode_encrypt(sk, [0.5, 1.5], enc, mask_seed=54, noise_seed=55)
    out = a.add_with_padding(b)
    dec = out.decrypt_decode(sk)
    np.testing.assert_array_less(np.abs(dec - [1.5, 3.5]), out.encoders[0].get_granularity())
    one = out.extract_nth(1)
    assert abs(one.decrypt_decode(sk) - 3.5) < one.encoder.get_granularity()


def test_vector_rlwe_pack_extract():
    sk_rlwe = RLWESecretKey.new(RLWE_PARAMS, secret_seed=60)
    enc = Encoder.new(0.0, 16.0, 6, 1)
    msgs = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    v = VectorRLWE.encode_encrypt_packed(sk_rlwe, msgs, enc, mask_seed=61, noise_seed=62)
    assert v.nb_valid() == 5  # padding coefficients stay invalid
    dec = v.decrypt_decode(sk_rlwe)
    assert_eq_granularity(enc, dec, msgs)
    # extract coefficient 2 as an LWE under the big key
    lwe = v.extract_1_lwe(2, 0)
    sk_big = sk_rlwe.to_lwe_secret_key()
    got = lwe.decrypt_decode(sk_big)[0]
    assert abs(got - 3.0) < enc.get_granularity()


def test_lwe_serde_roundtrip(sk, tmp_path):
    enc = Encoder.new(0.0, 10.0, 8, 1)
    ct = LWE.encode_encrypt(sk, [7.25], enc, mask_seed=70, noise_seed=71)
    path = str(tmp_path / "ct.npz")
    ct.save(path)
    back = LWE.load(path)
    np.testing.assert_array_equal(back.data, ct.data)
    assert back.encoder == ct.encoder
    assert back.variance == ct.variance


def test_key_serde_roundtrip(tmp_path):
    sk1 = LWESecretKey.new(SK_PARAMS, secret_seed=80)
    path = str(tmp_path / "sk.npz")
    sk1.save(path)
    sk2 = LWESecretKey.load(path)
    np.testing.assert_array_equal(sk1.inner.key, sk2.inner.key)


def test_mul_from_bootstrap_value():
    """Regression: the product must decode to ~x*y (a former x4 scaling bug
    made 1.0*1.5 decode to ~6)."""
    sk = LWESecretKey.new(SK_PARAMS, secret_seed=31)
    rlwe = RLWESecretKey.new(RLWE_PARAMS, secret_seed=32)
    bsk = LWEBSK.new(sk, rlwe, base_log=10, level=3, mask_seed=33, noise_seed=34)
    enc = Encoder.new(-2.0, 2.0, nb_bit_precision=5, nb_bit_padding=2)
    a = LWE.encode_encrypt(sk, [1.0], enc, mask_seed=35, noise_seed=36)
    b = LWE.encode_encrypt(sk, [1.5], enc, mask_seed=37, noise_seed=38)
    prod = a.mul_from_bootstrap(b, bsk)
    got = float(prod.decrypt_decode(rlwe.to_lwe_secret_key())[0])
    assert abs(got - 1.5) < 4 * prod.encoder.get_granularity(), got


def test_mul_constant_with_padding_value():
    """Regression: result must carry the output interval offset (a missing
    encode(0) re-add made 3*2 decode to ~-34)."""
    sk = LWESecretKey.new(SK_PARAMS, secret_seed=41)
    enc = Encoder.new(-10.0, 10.0, nb_bit_precision=6, nb_bit_padding=4)
    ct = LWE.encode_encrypt(sk, [3.0], enc, mask_seed=42, noise_seed=43)
    out = ct.mul_constant_with_padding(2.0, 4.0, 3)
    got = float(out.decrypt_decode(sk)[0])
    assert abs(got - 6.0) < 2 * out.encoder.get_granularity(), got


def test_add_constant_dynamic_encoder_rejects_vector():
    sk = LWESecretKey.new(SK_PARAMS, secret_seed=51)
    enc = Encoder.new(0.0, 10.0, nb_bit_precision=5, nb_bit_padding=2)
    ct = LWE.encode_encrypt(sk, [1.0, 2.0], enc, mask_seed=52, noise_seed=53)
    import pytest as _pytest

    with _pytest.raises(errors.DimensionError):
        ct.add_constant_dynamic_encoder(np.array([3.0, 5.0]))
    # scalar path still works
    shifted = ct.add_constant_dynamic_encoder(3.0)
    assert shifted.encoder.o == enc.o + 3.0
