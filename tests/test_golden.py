"""Golden-vector regression pins: fixed-seed outputs must never change.

The reference's correctness contract is bit-exactness under fixed CSPRNG
seeds (BASELINE.md). The Rust toolchain isn't available in CI to regenerate
its vectors, so these digests pin OUR fixed-seed outputs: the CSPRNG stream,
key material, encryption, and full gate pipelines (both backends agree, so
one digest covers both). Any change to these values is a breaking change to
the randomness or ciphertext-layout contract and must be deliberate.
"""

import hashlib

import numpy as np
import jax.numpy as jnp

from concrete_tpu import boolean
from concrete_tpu.csprng import AesCtrGenerator, EncryptionRandomGenerator, SecretRandomGenerator
from concrete_tpu.core import bootstrap as bs
from concrete_tpu.core import glwe as glwe_mod
from concrete_tpu.core import lwe as lwe_mod
from concrete_tpu.core.ggsw import StandardBootstrapKey, bsk_to_ntt

from common import TINY


def _h(arr) -> str:
    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()[:16]


def test_csprng_stream_golden():
    g = AesCtrGenerator(key=123456789)
    stream = g.generate_bytes(4096)
    children = g.try_fork(4, 64)
    forked = np.concatenate([c.generate_bytes(64) for c in children])
    assert _h(stream) == "5b0835785adbf7f5", _h(stream)
    assert _h(forked) == "b98fe617bd7d6418", _h(forked)


def test_key_material_golden():
    sgen = SecretRandomGenerator(42)
    lwe_sk = lwe_mod.LweSecretKey.generate_binary(TINY.lwe_dimension, sgen)
    glwe_sk = glwe_mod.GlweSecretKey.generate_binary(
        TINY.glwe_dimension, TINY.polynomial_size, sgen)
    gen = EncryptionRandomGenerator(43, 44)
    bsk = StandardBootstrapKey.generate(
        lwe_sk, glwe_sk, TINY.pbs_base_log, TINY.pbs_level,
        TINY.glwe_modular_std_dev.std_dev, gen)
    assert _h(lwe_sk.key) == "546e127fb90c3bb1", _h(lwe_sk.key)
    assert _h(glwe_sk.key) == "6e00998a0996dabf", _h(glwe_sk.key)
    assert _h(bsk.data) == "6a3eb86a403b3940", _h(bsk.data)


def test_gate_pipeline_golden():
    """Full fixed-seed AND gate: ciphertext bytes pinned (ntt backend on CPU;
    the mxu backend is bit-identical by the cross-backend tests)."""
    cks, sks = boolean.gen_keys(TINY, secret_seed=7, mask_seed=8, noise_seed=9)
    a = cks.encrypt(np.array([True, False, True, False]), mask_seed=10, noise_seed=11)
    b = cks.encrypt(np.array([True, True, False, False]), mask_seed=12, noise_seed=13)
    assert _h(a) == "a351caf3068cea27", _h(a)
    out = np.asarray(sks.and_(jnp.asarray(a), jnp.asarray(b)))
    assert _h(out) == "af72029a4aef376d", _h(out)
    assert list(cks.decrypt(out)) == [True, False, False, False]
