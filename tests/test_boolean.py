"""Boolean gate truth tables over encrypted inputs — the workload tests
(reference: concrete-boolean/src/server_key/tests.rs)."""

import numpy as np
import pytest

from concrete_tpu import boolean

from common import TINY, TINY_K2

A = np.array([False, False, True, True])
B = np.array([False, True, False, True])


@pytest.fixture(scope="module", params=[TINY, TINY_K2], ids=["k1_n128", "k2_n64"])
def keypair(request):
    return boolean.gen_keys(request.param, secret_seed=1, mask_seed=2, noise_seed=3)


@pytest.fixture(scope="module")
def encrypted_inputs(keypair):
    cks, _ = keypair
    ca = cks.encrypt(A, mask_seed=20, noise_seed=21)
    cb = cks.encrypt(B, mask_seed=22, noise_seed=23)
    return ca, cb


def _check(cks, out, expected):
    got = cks.decrypt(np.array(out))
    np.testing.assert_array_equal(got, expected)


def test_and(keypair, encrypted_inputs):
    cks, sks = keypair
    ca, cb = encrypted_inputs
    _check(cks, sks.and_(ca, cb), A & B)


def test_nand(keypair, encrypted_inputs):
    cks, sks = keypair
    ca, cb = encrypted_inputs
    _check(cks, sks.nand(ca, cb), ~(A & B))


def test_or(keypair, encrypted_inputs):
    cks, sks = keypair
    ca, cb = encrypted_inputs
    _check(cks, sks.or_(ca, cb), A | B)


def test_nor(keypair, encrypted_inputs):
    cks, sks = keypair
    ca, cb = encrypted_inputs
    _check(cks, sks.nor(ca, cb), ~(A | B))


def test_xor(keypair, encrypted_inputs):
    cks, sks = keypair
    ca, cb = encrypted_inputs
    _check(cks, sks.xor(ca, cb), A ^ B)


def test_xnor(keypair, encrypted_inputs):
    cks, sks = keypair
    ca, cb = encrypted_inputs
    _check(cks, sks.xnor(ca, cb), ~(A ^ B))


def test_not(keypair, encrypted_inputs):
    cks, sks = keypair
    ca, _ = encrypted_inputs
    _check(cks, sks.not_(ca), ~A)


def test_mux(keypair):
    cks, sks = keypair
    c = np.array([False, False, False, False, True, True, True, True])
    t = np.array([False, False, True, True, False, False, True, True])
    e = np.array([False, True, False, True, False, True, False, True])
    cc = cks.encrypt(c, mask_seed=30, noise_seed=31)
    ct = cks.encrypt(t, mask_seed=32, noise_seed=33)
    ce = cks.encrypt(e, mask_seed=34, noise_seed=35)
    _check(cks, sks.mux(cc, ct, ce), np.where(c, t, e))


def test_gate_chaining(keypair):
    """Output ciphertexts feed the next gate (noise refresh works)."""
    cks, sks = keypair
    ca = cks.encrypt(A, mask_seed=40, noise_seed=41)
    cb = cks.encrypt(B, mask_seed=42, noise_seed=43)
    # (a AND b) XOR (a OR b)  == a XOR b for booleans
    ct_and = sks.and_(ca, cb)
    ct_or = sks.or_(ca, cb)
    _check(cks, sks.xor(np.array(ct_and), np.array(ct_or)), A ^ B)


def test_keygen_deterministic():
    cks1, _ = boolean.gen_keys(TINY, secret_seed=5, mask_seed=6, noise_seed=7)
    cks2, _ = boolean.gen_keys(TINY, secret_seed=5, mask_seed=6, noise_seed=7)
    np.testing.assert_array_equal(cks1.lwe_secret_key.key, cks2.lwe_secret_key.key)
    np.testing.assert_array_equal(cks1.glwe_secret_key.key, cks2.glwe_secret_key.key)
    ct1 = cks1.encrypt([True], mask_seed=8, noise_seed=9)
    ct2 = cks2.encrypt([True], mask_seed=8, noise_seed=9)
    np.testing.assert_array_equal(ct1, ct2)


def test_warmup_compiles_and_times(keypair):
    """warmup precompiles the padded-batch pipelines and reports timings."""
    _, sks = keypair
    t = sks.warmup(batch_sizes=(3,), gates=("and", "xor"))
    assert set(t) == {("and", 4), ("xor", 4)}
    assert all(v >= 0 for v in t.values())


def test_warmup_tier_covers_smaller_requests(keypair):
    """After warming one tier, every request <= it pads UP to that tier (no
    fresh compiled shape per power of two); larger requests fall back to
    the power-of-two ladder, and gates still decode correctly."""
    cks, sks = keypair
    saved = set(sks._warmed_tiers)       # module-scoped fixture: isolate
    try:
        sks._warmed_tiers.clear()
        sks.warmup(batch_sizes=(8,), gates=("and",))
        assert sks._pad_size(3) == 8     # would be 4 without the tier
        assert sks._pad_size(8) == 8
        assert sks._pad_size(9) == 16    # beyond the tier: power of two
        a = cks.encrypt([True, False, True], mask_seed=20, noise_seed=21)
        b = cks.encrypt([True, True, False], mask_seed=22, noise_seed=23)
        out = np.asarray(sks.and_(a, b))
        assert [bool(x) for x in cks.decrypt(out)] == [True, False, False]
    finally:
        sks._warmed_tiers.clear()
        sks._warmed_tiers.update(saved)
