"""Encrypted circuit tests: ripple-carry adder (BASELINE config 5) and key
serialization roundtrips."""

import numpy as np

from concrete_tpu import boolean
from concrete_tpu.boolean import circuits

from common import TINY


def test_ripple_carry_adder_4bit():
    cks, sks = boolean.gen_keys(TINY, secret_seed=1, mask_seed=2, noise_seed=3)
    a_vals = np.array([3, 7, 12, 0], dtype=np.uint64)
    b_vals = np.array([5, 9, 15, 1], dtype=np.uint64)
    a_bits = circuits.encrypt_uint(cks, a_vals, 4, mask_seed=10, noise_seed=11)
    b_bits = circuits.encrypt_uint(cks, b_vals, 4, mask_seed=12, noise_seed=13)
    sum_bits, carry = circuits.ripple_carry_adder(sks, a_bits, b_bits)
    got = circuits.decrypt_uint(cks, np.array(sum_bits))
    carry_bit = cks.decrypt(np.array(carry)).astype(np.uint64)
    total = got + (carry_bit << np.uint64(4))
    np.testing.assert_array_equal(total, a_vals + b_vals)


def test_boolean_key_serde(tmp_path):
    cks, _ = boolean.gen_keys(TINY, secret_seed=5, mask_seed=6, noise_seed=7)
    path = str(tmp_path / "cks.npz")
    cks.save(path)
    back = boolean.ClientKey.load(path)
    np.testing.assert_array_equal(back.lwe_secret_key.key, cks.lwe_secret_key.key)
    np.testing.assert_array_equal(back.glwe_secret_key.key, cks.glwe_secret_key.key)
    assert back.parameters == cks.parameters
    # loaded key decrypts ciphertexts from the original
    ct = cks.encrypt([True, False], mask_seed=8, noise_seed=9)
    np.testing.assert_array_equal(back.decrypt(ct), [True, False])


def test_server_key_serde(tmp_path):
    cks = boolean.ClientKey.new(TINY, secret_seed=20)
    sks = boolean.ServerKey.new(cks, mask_seed=21, noise_seed=22)
    path = str(tmp_path / "sks.npz")
    sks.save(path)
    back = boolean.ServerKey.load(path)
    a = cks.encrypt([True, False], mask_seed=23, noise_seed=24)
    b = cks.encrypt([True, True], mask_seed=25, noise_seed=26)
    np.testing.assert_array_equal(
        cks.decrypt(np.array(back.and_(a, b))), [True, False]
    )
