"""Packing keyswitch (LWE->GLWE) and scalar GSW conformance tests."""

import numpy as np
import jax
import jax.numpy as jnp

from concrete_tpu.core import gsw as gsw_mod
from concrete_tpu.core import packing
from concrete_tpu.core.glwe import GlweSecretKey
from concrete_tpu.core.lwe import LweSecretKey
from concrete_tpu.csprng import EncryptionRandomGenerator, SecretRandomGenerator
from concrete_tpu.torus import torus_modular_distance


def test_packing_keyswitch_single():
    """LWE -> GLWE keyswitch: phase lands on coefficient 0."""
    sgen = SecretRandomGenerator(1)
    lwe_sk = LweSecretKey.generate_binary(32, sgen)
    glwe_sk = GlweSecretKey.generate_binary(1, 64, sgen)
    gen = EncryptionRandomGenerator(2, 3)
    pksk = packing.PackingKeyswitchKey.generate(lwe_sk, glwe_sk, 6, 4, 2.0 ** -25, gen)

    pts = (np.arange(8, dtype=np.uint32) % 16) << 28
    cts = lwe_sk.encrypt(pts, 2.0 ** -20, gen)
    out = np.array(
        jax.jit(
            lambda c: packing.keyswitch_lwe_to_glwe(
                jnp.asarray(pksk.data), c, base_log=6, level_count=4
            )
        )(jnp.asarray(cts))
    )
    dec = glwe_sk.decrypt(out)
    err = np.abs(torus_modular_distance(dec[:, 0], pts, 32))
    assert err.max() < 2.0 ** -8
    # other coefficients carry only noise
    rest = np.abs(torus_modular_distance(dec[:, 1:], np.zeros_like(dec[:, 1:]), 32))
    assert rest.max() < 2.0 ** -8


def test_packing_keyswitch_list():
    """Pack m LWEs into one GLWE: message i lands on coefficient i."""
    sgen = SecretRandomGenerator(4)
    lwe_sk = LweSecretKey.generate_binary(32, sgen)
    glwe_sk = GlweSecretKey.generate_binary(1, 64, sgen)
    gen = EncryptionRandomGenerator(5, 6)
    pksk = packing.PackingKeyswitchKey.generate(lwe_sk, glwe_sk, 6, 4, 2.0 ** -25, gen)

    m = 5
    pts = (np.arange(m, dtype=np.uint32) + 1) << 28
    cts = lwe_sk.encrypt(pts, 2.0 ** -20, gen)
    out = np.array(
        jax.jit(
            lambda c: packing.packing_keyswitch(
                jnp.asarray(pksk.data), c, base_log=6, level_count=4
            )
        )(jnp.asarray(cts))
    )
    dec = glwe_sk.decrypt(out)
    err = np.abs(torus_modular_distance(dec[:m], pts, 32))
    assert err.max() < 2.0 ** -7


def test_gsw_external_product_and_cmux():
    sgen = SecretRandomGenerator(7)
    lwe_sk = LweSecretKey.generate_binary(24, sgen)
    gen = EncryptionRandomGenerator(8, 9)
    base_log, levels = 6, 4

    m0 = np.uint32(3 << 28)
    m1 = np.uint32(9 << 28)
    ct0 = lwe_sk.encrypt(m0, 2.0 ** -22, gen)
    ct1 = lwe_sk.encrypt(m1, 2.0 ** -22, gen)
    for bit, want in ((0, m0), (1, m1)):
        g = gsw_mod.encrypt_constant_gsw(lwe_sk, bit, base_log, levels, 2.0 ** -25, gen)
        out = np.array(
            jax.jit(
                lambda a, b: gsw_mod.cmux(
                    jnp.asarray(g), a, b, base_log=base_log, level_count=levels
                )
            )(jnp.asarray(ct0), jnp.asarray(ct1))
        )
        dec = lwe_sk.decrypt(out)
        err = abs(float(torus_modular_distance(dec, want, 32)))
        assert err < 2.0 ** -8, (bit, err)
