"""Nth-coefficient sample extraction and multi-LUT PBS (the LutCountLog /
ModulusSwitchOffset machinery, fourier/mod.rs:728-748)."""

import numpy as np
import jax.numpy as jnp
import pytest

from concrete_tpu.core import bootstrap as bs
from concrete_tpu.core import bootstrap_mxu as bsx
from concrete_tpu.core import glwe as glwe_mod
from concrete_tpu.core import lwe as lwe_mod
from concrete_tpu.core.ggsw import StandardBootstrapKey, bsk_to_ntt
from concrete_tpu.csprng import EncryptionRandomGenerator, SecretRandomGenerator
from concrete_tpu.torus import torus_modular_distance

from common import TINY


def test_sample_extract_nth_decrypts_each_coefficient():
    sgen = SecretRandomGenerator(1)
    glwe_sk = glwe_mod.GlweSecretKey.generate_binary(1, 64, sgen)
    gen = EncryptionRandomGenerator(2, 3)
    rng = np.random.default_rng(0)
    pt = rng.integers(0, 1 << 32, size=(1, 64), dtype=np.uint32)
    ct = glwe_sk.encrypt(pt, 0.0, gen)  # zero noise: exact
    big = glwe_sk.into_lwe_key()
    for p in [0, 1, 5, 63]:
        out = np.asarray(bs.sample_extract_nth(jnp.asarray(ct), p))
        dec = big.decrypt(out[None])[0]
        assert dec == pt[0, p], (p, hex(dec), hex(pt[0, p]))


@pytest.mark.parametrize("backend", ["ntt", "mxu"])
def test_multi_lut_pbs_two_tracks(backend):
    """Pack two constant LUT tracks (1/8 and 1/4); one blind rotation must
    yield per-track outputs whose magnitude matches the track constant."""
    params = TINY
    sgen = SecretRandomGenerator(7)
    lwe_sk = lwe_mod.LweSecretKey.generate_binary(params.lwe_dimension, sgen)
    glwe_sk = glwe_mod.GlweSecretKey.generate_binary(
        params.glwe_dimension, params.polynomial_size, sgen)
    gen = EncryptionRandomGenerator(8, 9)
    bsk = StandardBootstrapKey.generate(
        lwe_sk, glwe_sk, params.pbs_base_log, params.pbs_level,
        params.glwe_modular_std_dev.std_dev, gen)
    cfg = bs.ServerConfig.from_boolean_parameters(params)
    N = cfg.polynomial_size
    lcl = 1
    c0, c1 = np.uint32(1 << 29), np.uint32(1 << 30)  # 1/8, 1/4

    # interleaved test polynomial: track t at coefficients c = t (mod 2)
    lut = np.zeros((cfg.glwe_size, N), dtype=np.uint32)
    lut[-1, 0::2] = c0
    lut[-1, 1::2] = c1
    lut = jnp.asarray(lut)

    eighth = np.uint32(1 << 29)
    pts = np.full(16, eighth, dtype=np.uint32)
    cts = jnp.asarray(lwe_sk.encrypt(pts, params.lwe_modular_std_dev.std_dev, gen))

    if backend == "ntt":
        keys = bsk_to_ntt(bsk.data, cfg.primes, cfg.bits)
        outs = np.asarray(bs.bootstrap_many_lut(cfg, keys, lut, cts, lcl))
    else:
        keys = jnp.asarray(bsx.bsk_to_mxu(bsk.data, cfg))
        outs = np.asarray(bsx.bootstrap_many_lut_mxu(cfg, keys, lut, cts, lcl))

    assert outs.shape == (2, 16, cfg.big_lwe_dimension + 1)
    big = glwe_sk.into_lwe_key()
    for t, c in [(0, c0), (1, c1)]:
        dec = big.decrypt(outs[t])
        # each output decrypts to +-c_t (sign = rotation half) within noise
        dist_pos = np.abs(torus_modular_distance(dec, np.full_like(dec, c), 32))
        neg = (np.uint32(0) - c).astype(np.uint32)
        dist_neg = np.abs(torus_modular_distance(dec, np.full_like(dec, neg), 32))
        dist = np.minimum(dist_pos, dist_neg)
        assert (dist < 2 ** 26).all(), (t, dist.max())


def test_multi_lut_backends_bit_identical():
    params = TINY
    sgen = SecretRandomGenerator(17)
    lwe_sk = lwe_mod.LweSecretKey.generate_binary(params.lwe_dimension, sgen)
    glwe_sk = glwe_mod.GlweSecretKey.generate_binary(
        params.glwe_dimension, params.polynomial_size, sgen)
    gen = EncryptionRandomGenerator(18, 19)
    bsk = StandardBootstrapKey.generate(
        lwe_sk, glwe_sk, params.pbs_base_log, params.pbs_level,
        params.glwe_modular_std_dev.std_dev, gen)
    cfg = bs.ServerConfig.from_boolean_parameters(params)
    rng = np.random.default_rng(4)
    lut = jnp.asarray(rng.integers(
        0, 1 << 32, size=(cfg.glwe_size, cfg.polynomial_size), dtype=np.uint32))
    cts = jnp.asarray(rng.integers(
        0, 1 << 32, size=(6, cfg.lwe_dimension + 1), dtype=np.uint32))
    a = np.asarray(bs.bootstrap_many_lut(
        cfg, bsk_to_ntt(bsk.data, cfg.primes, cfg.bits), lut, cts, 2))
    b = np.asarray(bsx.bootstrap_many_lut_mxu(
        cfg, jnp.asarray(bsx.bsk_to_mxu(bsk.data, cfg)), lut, cts, 2))
    np.testing.assert_array_equal(a, b)


def test_highlevel_bootstrap_with_functions():
    """Two functions of one ciphertext from a single blind rotation."""
    from concrete_tpu.highlevel import (
        Encoder, LWE, LWEBSK, LWESecretKey, RLWESecretKey,
    )
    from concrete_tpu.highlevel.params_presets import LWEParams, RLWEParams

    sk = LWESecretKey.new(LWEParams(dimension=16, log2_std_dev=-40), secret_seed=1)
    rlwe = RLWESecretKey.new(
        RLWEParams(polynomial_size=256, dimension=1, log2_std_dev=-45),
        secret_seed=2)
    bsk = LWEBSK.new(sk, rlwe, base_log=10, level=3, mask_seed=3, noise_seed=4)
    enc = Encoder.new(0.0, 10.0, nb_bit_precision=4, nb_bit_padding=2)
    enc_out = Encoder.new(0.0, 30.0, nb_bit_precision=4, nb_bit_padding=2)
    ct = LWE.encode_encrypt(sk, [6.0], enc)
    outs = ct.bootstrap_with_functions(
        bsk, [lambda x: x + 1.0, lambda x: 2.0 * x], enc_out)
    assert len(outs) == 2
    big = rlwe.to_lwe_secret_key()
    got0 = float(outs[0].decrypt_decode(big)[0])
    got1 = float(outs[1].decrypt_decode(big)[0])
    g = enc_out.get_granularity()
    assert abs(got0 - 7.0) < 2 * g, (got0, g)
    assert abs(got1 - 12.0) < 2 * g, (got1, g)
