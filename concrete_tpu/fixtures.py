"""Backend-conformance fixtures — the concrete-core-fixture analog.

The reference's flagship test layer (concrete-core-fixture/src/fixture/mod.rs)
runs each operation through: parameters -> repetitions (fresh keys) ->
samples (fresh ciphertexts) -> execute -> compute NPE criteria -> statistical
verify. We reproduce that protocol; "backends" here are the host numpy
reference semantics vs the jitted device path, sharing one suite.

Every noisy op is verified against the NPE oracle with the same statistical
machinery the reference uses (KS test + sigma bounds,
raw/statistical_test.rs:14-93).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from . import npe
from .core import bootstrap as bs
from .core import lwe as lwe_mod
from .core import glwe as glwe_mod
from .core.ggsw import StandardBootstrapKey, bsk_to_ntt
from .csprng import EncryptionRandomGenerator, SecretRandomGenerator
from .dispersion import StandardDev, Variance
from .testing import assert_noise_bounded, assert_noise_distribution


@dataclasses.dataclass
class FixtureReport:
    name: str
    parameters: dict
    repetitions: int
    sample_size: int
    passed: bool
    detail: str = ""


class Fixture:
    """Protocol: stress() runs REPETITIONS x (keys -> SAMPLE_SIZE samples ->
    execute -> verify against criteria) per parameter set
    (fixture/mod.rs:122-203)."""

    name = "fixture"
    PARAMETERS: list = []
    REPETITIONS = 2
    SAMPLE_SIZE = 200

    def run_one(self, params: dict, rep_seed: int):
        raise NotImplementedError

    def stress(self, repetitions=None, sample_size=None) -> list:
        reps = repetitions or self.REPETITIONS
        if sample_size:
            self.SAMPLE_SIZE = sample_size
        reports = []
        for params in self.PARAMETERS:
            ok, detail = True, ""
            for rep in range(reps):
                try:
                    self.run_one(params, rep_seed=1000 * rep + 7)
                except AssertionError as e:
                    ok, detail = False, str(e)
                    break
            reports.append(
                FixtureReport(self.name, params, reps, self.SAMPLE_SIZE, ok, detail)
            )
        return reports


class LweEncryptDecryptFixture(Fixture):
    """Fresh-encryption noise matches the configured gaussian (KS test)."""

    name = "lwe_encrypt_decrypt"
    PARAMETERS = [
        {"dim": 128, "log_std": -15, "bits": 32},
        {"dim": 128, "log_std": -25, "bits": 64},
    ]

    def run_one(self, params, rep_seed):
        bits = params["bits"]
        sk = lwe_mod.LweSecretKey.generate_binary(
            params["dim"], SecretRandomGenerator(rep_seed), bits
        )
        gen = EncryptionRandomGenerator(rep_seed + 1, rep_seed + 2)
        std = StandardDev(2.0 ** params["log_std"])
        rng = np.random.default_rng(rep_seed)
        pts = rng.integers(0, 1 << 32, size=self.SAMPLE_SIZE, dtype=np.uint32).astype(
            np.uint64 if bits == 64 else np.uint32
        )
        cts = sk.encrypt(pts, std.std_dev, gen)
        dec = sk.decrypt(cts)
        assert_noise_distribution(dec, pts, std, bits, seed=rep_seed * 31 + 1)


class LweKeyswitchFixture(Fixture):
    """Keyswitch noise <= NPE prediction
    (fixture analog: lwe_ciphertext_discarding_keyswitch)."""

    name = "lwe_keyswitch"
    PARAMETERS = [
        {"n_in": 64, "n_out": 32, "base_log": 4, "levels": 5, "bits": 32},
        {"n_in": 64, "n_out": 32, "base_log": 2, "levels": 8, "bits": 32},
    ]

    def run_one(self, params, rep_seed):
        bits = params["bits"]
        sgen = SecretRandomGenerator(rep_seed)
        in_key = lwe_mod.LweSecretKey.generate_binary(params["n_in"], sgen, bits)
        out_key = lwe_mod.LweSecretKey.generate_binary(params["n_out"], sgen, bits)
        gen = EncryptionRandomGenerator(rep_seed + 1, rep_seed + 2)
        ks_std = StandardDev(2.0 ** -20)
        ct_std = StandardDev(2.0 ** -18)
        ksk = lwe_mod.LweKeyswitchKey.generate(
            in_key, out_key, params["base_log"], params["levels"], ks_std.std_dev, gen
        )
        rng = np.random.default_rng(rep_seed)
        pts = rng.integers(0, 1 << 32, size=self.SAMPLE_SIZE, dtype=np.uint32)
        cts = in_key.encrypt(pts, ct_std.std_dev, gen)
        out = np.array(
            jax.jit(
                lambda c: lwe_mod.keyswitch(
                    jnp.asarray(ksk.data),
                    c,
                    base_log=params["base_log"],
                    level_count=params["levels"],
                )
            )(jnp.asarray(cts))
        )
        dec = out_key.decrypt(out)
        predicted = npe.estimate_keyswitch_noise_with_constant_terms(
            params["n_in"], ct_std, ks_std, params["base_log"], params["levels"], bits
        )
        assert_noise_bounded(dec, pts, predicted, bits, slack_bits=0.5)


class PbsFixture(Fixture):
    """PBS output noise <= NPE prediction
    (fixture/lwe_ciphertext_discarding_bootstrap_1.rs:254-274 analog)."""

    name = "pbs"
    PARAMETERS = [
        {"n": 16, "k": 1, "N": 128, "base_log": 8, "levels": 2, "backend": "ntt"},
        {"n": 12, "k": 2, "N": 64, "base_log": 6, "levels": 3, "backend": "ntt"},
        {"n": 16, "k": 1, "N": 128, "base_log": 8, "levels": 2, "backend": "mxu"},
        {"n": 12, "k": 2, "N": 64, "base_log": 6, "levels": 3, "backend": "mxu"},
    ]
    SAMPLE_SIZE = 64

    def run_one(self, params, rep_seed):
        from .params import BooleanParameters

        p = BooleanParameters(
            lwe_dimension=params["n"],
            glwe_dimension=params["k"],
            polynomial_size=params["N"],
            lwe_modular_std_dev=StandardDev(2.0 ** -20),
            glwe_modular_std_dev=StandardDev(2.0 ** -25),
            pbs_base_log=params["base_log"],
            pbs_level=params["levels"],
            ks_base_log=2,
            ks_level=5,
        )
        cfg = bs.ServerConfig.from_boolean_parameters(p)
        sgen = SecretRandomGenerator(rep_seed)
        lwe_sk = lwe_mod.LweSecretKey.generate_binary(p.lwe_dimension, sgen)
        glwe_sk = glwe_mod.GlweSecretKey.generate_binary(
            p.glwe_dimension, p.polynomial_size, sgen
        )
        gen = EncryptionRandomGenerator(rep_seed + 1, rep_seed + 2)
        bsk = StandardBootstrapKey.generate(
            lwe_sk, glwe_sk, p.pbs_base_log, p.pbs_level,
            p.glwe_modular_std_dev.std_dev, gen,
        )
        eighth = np.uint32(1 << 29)
        neg_eighth = np.uint32((-(1 << 29)) % (1 << 32))
        rng = np.random.default_rng(rep_seed)
        signs = rng.integers(0, 2, size=self.SAMPLE_SIZE).astype(bool)
        msgs = np.where(signs, eighth, neg_eighth)
        cts = lwe_sk.encrypt(msgs, p.lwe_modular_std_dev.std_dev, gen)
        lut = bs.trivial_lut_constant(cfg, eighth)
        if params.get("backend") == "mxu":
            from .core import bootstrap_mxu as bsx

            rings = jnp.asarray(bsx.bsk_to_mxu(bsk.data, cfg))
            out = np.array(
                jax.jit(lambda b, c: bsx.bootstrap_mxu(cfg, b, lut, c))(
                    rings, jnp.asarray(cts))
            )
        else:
            bsk_ntt = bsk_to_ntt(bsk.data, cfg.primes, 32)
            out = np.array(
                jax.jit(lambda b, c: bs.bootstrap(cfg, b, lut, c))(bsk_ntt, jnp.asarray(cts))
            )
        dec = glwe_sk.into_lwe_key().decrypt(out)
        expected = np.where(signs, eighth, neg_eighth)
        predicted = npe.estimate_pbs_noise(
            p.lwe_dimension, p.polynomial_size, p.glwe_dimension,
            p.pbs_base_log, p.pbs_level, p.glwe_modular_std_dev, 32,
        )
        assert_noise_bounded(dec, expected, predicted, 32, slack_bits=0.5)


class GlweEncryptDecryptFixture(Fixture):
    """GLWE fresh-encryption noise matches the configured gaussian."""

    name = "glwe_encrypt_decrypt"
    PARAMETERS = [
        {"k": 1, "N": 128, "log_std": -20, "bits": 32},
        {"k": 2, "N": 64, "log_std": -20, "bits": 32},
    ]

    def run_one(self, params, rep_seed):
        bits = params["bits"]
        sk = glwe_mod.GlweSecretKey.generate_binary(
            params["k"], params["N"], SecretRandomGenerator(rep_seed), bits
        )
        gen = EncryptionRandomGenerator(rep_seed + 1, rep_seed + 2)
        std = StandardDev(2.0 ** params["log_std"])
        rng = np.random.default_rng(rep_seed)
        count = max(2, self.SAMPLE_SIZE // params["N"])
        msgs = rng.integers(0, 1 << 32, size=(count, params["N"]), dtype=np.uint32)
        cts = sk.encrypt(msgs, std.std_dev, gen)
        dec = sk.decrypt(cts)
        assert_noise_distribution(dec, msgs, std, bits, seed=rep_seed * 17 + 3)


class ExternalProductFixture(Fixture):
    """External product noise <= NPE prediction (binary GGSW)."""

    name = "external_product"
    PARAMETERS = [
        {"k": 1, "N": 128, "base_log": 8, "levels": 2, "backend": "ntt"},
        {"k": 2, "N": 64, "base_log": 6, "levels": 3, "backend": "ntt"},
        {"k": 1, "N": 128, "base_log": 8, "levels": 2, "backend": "mxu"},
        {"k": 2, "N": 64, "base_log": 6, "levels": 3, "backend": "mxu"},
    ]
    SAMPLE_SIZE = 32

    def run_one(self, params, rep_seed):
        from .core.ggsw import encrypt_constant_ggsw, ggsw_to_ntt
        from .params import BooleanParameters

        p = BooleanParameters(
            lwe_dimension=8,
            glwe_dimension=params["k"],
            polynomial_size=params["N"],
            lwe_modular_std_dev=StandardDev(2.0 ** -20),
            glwe_modular_std_dev=StandardDev(2.0 ** -25),
            pbs_base_log=params["base_log"],
            pbs_level=params["levels"],
            ks_base_log=2,
            ks_level=5,
        )
        cfg = bs.ServerConfig.from_boolean_parameters(p)
        sk = glwe_mod.GlweSecretKey.generate_binary(
            params["k"], params["N"], SecretRandomGenerator(rep_seed)
        )
        gen = EncryptionRandomGenerator(rep_seed + 1, rep_seed + 2)
        ggsw_std = StandardDev(2.0 ** -25)
        ct_std = StandardDev(2.0 ** -20)
        ggsw = encrypt_constant_ggsw(
            sk, 1, params["base_log"], params["levels"], ggsw_std.std_dev, gen
        )
        rng = np.random.default_rng(rep_seed)
        msgs = rng.integers(0, 1 << 32, size=(self.SAMPLE_SIZE, params["N"]), dtype=np.uint32)
        cts = sk.encrypt(msgs, ct_std.std_dev, gen)
        if params.get("backend") == "mxu":
            from .core import bootstrap_mxu as bsx

            rings = jnp.asarray(bsx.bsk_to_mxu(ggsw[None], cfg)[0])
            out = np.array(
                jax.jit(lambda g, c: bsx.external_product_mxu(cfg, g, c))(
                    rings, jnp.asarray(cts))
            )
        else:
            ggsw_ntt = ggsw_to_ntt(ggsw, cfg.primes, 32)
            out = np.array(
                jax.jit(lambda g, c: bs.external_product(cfg, g, c))(ggsw_ntt, jnp.asarray(cts))
            )
        dec = sk.decrypt(out)
        predicted = npe.estimate_external_product_noise_with_binary_ggsw(
            params["N"], params["k"], ct_std, ggsw_std,
            params["base_log"], params["levels"], 32,
        )
        assert_noise_bounded(dec, msgs, predicted, 32, slack_bits=0.5)


class PackingKeyswitchFixture(Fixture):
    """LWE -> GLWE keyswitch noise within the NPE keyswitch bound."""

    name = "packing_keyswitch"
    PARAMETERS = [{"n_in": 32, "k": 1, "N": 64, "base_log": 6, "levels": 4}]
    SAMPLE_SIZE = 64

    def run_one(self, params, rep_seed):
        from .core import packing
        from .core.lwe import LweSecretKey

        sgen = SecretRandomGenerator(rep_seed)
        lwe_sk = LweSecretKey.generate_binary(params["n_in"], sgen)
        glwe_sk = glwe_mod.GlweSecretKey.generate_binary(params["k"], params["N"], sgen)
        gen = EncryptionRandomGenerator(rep_seed + 1, rep_seed + 2)
        ks_std = StandardDev(2.0 ** -25)
        ct_std = StandardDev(2.0 ** -20)
        pksk = packing.PackingKeyswitchKey.generate(
            lwe_sk, glwe_sk, params["base_log"], params["levels"], ks_std.std_dev, gen
        )
        rng = np.random.default_rng(rep_seed)
        pts = rng.integers(0, 1 << 32, size=self.SAMPLE_SIZE, dtype=np.uint32)
        cts = lwe_sk.encrypt(pts, ct_std.std_dev, gen)
        out = np.array(
            jax.jit(
                lambda c: packing.keyswitch_lwe_to_glwe(
                    jnp.asarray(pksk.data), c,
                    base_log=params["base_log"], level_count=params["levels"],
                )
            )(jnp.asarray(cts))
        )
        dec = glwe_sk.decrypt(out)[:, 0]
        predicted = npe.estimate_keyswitch_noise_with_constant_terms(
            params["n_in"], ct_std, ks_std, params["base_log"], params["levels"], 32
        )
        assert_noise_bounded(dec, pts, predicted, 32, slack_bits=0.5)


class LweAffineTransformFixture(Fixture):
    """Weighted-sum noise matches the NPE weighted-sum formula
    (lwe_ciphertext_vector_discarding_affine_transformation analog)."""

    name = "lwe_affine_transform"
    PARAMETERS = [{"dim": 128, "count": 4, "log_std": -20, "bits": 32}]

    def run_one(self, params, rep_seed):
        bits = params["bits"]
        sk = lwe_mod.LweSecretKey.generate_binary(
            params["dim"], SecretRandomGenerator(rep_seed), bits)
        gen = EncryptionRandomGenerator(rep_seed + 1, rep_seed + 2)
        std = StandardDev(2.0 ** params["log_std"])
        rng = np.random.default_rng(rep_seed)
        count = params["count"]
        weights = rng.integers(1, 8, size=count).astype(np.int64)
        bias = np.uint32(rng.integers(0, 1 << 32))
        pts = rng.integers(0, 1 << 32, size=(count, self.SAMPLE_SIZE), dtype=np.uint32)
        cts = np.stack([sk.encrypt(p, std.std_dev, gen) for p in pts], axis=1)
        out = np.array(
            jax.jit(lambda c: lwe_mod.affine_transform(c, tuple(int(w) for w in weights), bias))(
                jnp.asarray(cts))
        )  # cts: [SAMPLE, count, n+1] -> out [SAMPLE, n+1]
        with np.errstate(over="ignore"):
            expected = (pts.astype(np.uint64) * weights[:, None].astype(np.uint64)).sum(0) + bias
        expected = expected.astype(np.uint32)
        predicted = npe.estimate_weighted_sum_noise(
            [Variance(std.get_variance())] * count, weights.tolist())
        assert_noise_bounded(sk.decrypt(out), expected, predicted, bits, slack_bits=0.5)


class SampleExtractFixture(Fixture):
    """Coefficient extraction is exact on zero-noise GLWEs at every degree
    (lwe_ciphertext_discarding_extraction analog)."""

    name = "sample_extract"
    PARAMETERS = [{"k": 1, "N": 64}, {"k": 2, "N": 128}]

    def run_one(self, params, rep_seed):
        sk = glwe_mod.GlweSecretKey.generate_binary(
            params["k"], params["N"], SecretRandomGenerator(rep_seed))
        gen = EncryptionRandomGenerator(rep_seed + 1, rep_seed + 2)
        rng = np.random.default_rng(rep_seed)
        pt = rng.integers(0, 1 << 32, size=(1, params["N"]), dtype=np.uint32)
        ct = sk.encrypt(pt, 0.0, gen)
        big = sk.into_lwe_key()
        for p in [0, 1, params["N"] // 2, params["N"] - 1]:
            out = np.asarray(bs.sample_extract_nth(jnp.asarray(ct), p))
            assert big.decrypt(out[None])[0] == pt[0, p], p


class CmuxFixture(Fixture):
    """CMux selects the right branch and stays within the NPE cmux bound."""

    name = "cmux"
    PARAMETERS = [
        {"k": 1, "N": 128, "base_log": 8, "levels": 2, "backend": "ntt"},
        {"k": 1, "N": 128, "base_log": 8, "levels": 2, "backend": "mxu"},
    ]
    SAMPLE_SIZE = 32

    def run_one(self, params, rep_seed):
        from .core.ggsw import encrypt_constant_ggsw, ggsw_to_ntt
        from .params import BooleanParameters

        p = BooleanParameters(
            lwe_dimension=8,
            glwe_dimension=params["k"],
            polynomial_size=params["N"],
            lwe_modular_std_dev=StandardDev(2.0 ** -20),
            glwe_modular_std_dev=StandardDev(2.0 ** -25),
            pbs_base_log=params["base_log"],
            pbs_level=params["levels"],
            ks_base_log=2,
            ks_level=5,
        )
        cfg = bs.ServerConfig.from_boolean_parameters(p)
        sk = glwe_mod.GlweSecretKey.generate_binary(
            params["k"], params["N"], SecretRandomGenerator(rep_seed))
        gen = EncryptionRandomGenerator(rep_seed + 1, rep_seed + 2)
        rng = np.random.default_rng(rep_seed)
        for bit in (0, 1):
            ggsw = encrypt_constant_ggsw(
                sk, bit, params["base_log"], params["levels"], 2.0 ** -25, gen)
            m0 = rng.integers(0, 1 << 32, size=(self.SAMPLE_SIZE, params["N"]),
                              dtype=np.uint32)
            m1 = rng.integers(0, 1 << 32, size=(self.SAMPLE_SIZE, params["N"]),
                              dtype=np.uint32)
            ct0 = sk.encrypt(m0, 2.0 ** -20, gen)
            ct1 = sk.encrypt(m1, 2.0 ** -20, gen)
            if params.get("backend") == "mxu":
                from .core import bootstrap_mxu as bsx

                rings = jnp.asarray(bsx.bsk_to_mxu(ggsw[None], cfg)[0])
                out = np.array(bsx.cmux_mxu(
                    cfg, rings, jnp.asarray(ct0), jnp.asarray(ct1)))
            else:
                g_ntt = ggsw_to_ntt(ggsw, cfg.primes, 32)
                out = np.array(bs.cmux(
                    cfg, g_ntt, jnp.asarray(ct0), jnp.asarray(ct1)))
            dec = sk.decrypt(out)
            want = m1 if bit else m0
            predicted = npe.estimate_cmux_noise_with_binary_ggsw(
                params["k"], params["N"],
                params["base_log"], params["levels"],
                StandardDev(2.0 ** -20), StandardDev(2.0 ** -20),
                StandardDev(2.0 ** -25), 32,
            )
            assert_noise_bounded(dec, want, predicted, 32, slack_bits=0.5)


class U64PbsFixture(Fixture):
    """u64-torus PBS (the highlevel regime) within the NPE bound, both
    backends — Precision64 of the reference's fixture instantiation."""

    name = "pbs_u64"
    PARAMETERS = [
        {"n": 10, "k": 1, "N": 64, "base_log": 10, "levels": 3, "backend": "ntt"},
        {"n": 10, "k": 1, "N": 64, "base_log": 10, "levels": 3, "backend": "mxu"},
    ]
    SAMPLE_SIZE = 32

    def run_one(self, params, rep_seed):
        cfg = bs.ServerConfig(
            lwe_dimension=params["n"], glwe_dimension=params["k"],
            polynomial_size=params["N"], pbs_base_log=params["base_log"],
            pbs_level=params["levels"], ks_base_log=4, ks_level=3, bits=64)
        sgen = SecretRandomGenerator(rep_seed)
        lwe_sk = lwe_mod.LweSecretKey.generate_binary(params["n"], sgen, bits=64)
        glwe_sk = glwe_mod.GlweSecretKey.generate_binary(
            params["k"], params["N"], sgen, bits=64)
        gen = EncryptionRandomGenerator(rep_seed + 1, rep_seed + 2)
        bsk_std = StandardDev(2.0 ** -45)
        bsk = StandardBootstrapKey.generate(
            lwe_sk, glwe_sk, params["base_log"], params["levels"],
            bsk_std.std_dev, gen)
        big = np.uint64(1) << np.uint64(60)
        neg = (np.uint64(0) - big).astype(np.uint64)
        rng = np.random.default_rng(rep_seed)
        signs = rng.integers(0, 2, size=self.SAMPLE_SIZE).astype(bool)
        msgs = np.where(signs, big, neg)
        cts = lwe_sk.encrypt(msgs, 2.0 ** -30, gen)
        lut = bs.trivial_lut_constant(cfg, big)
        if params.get("backend") == "mxu":
            from .core import bootstrap_mxu as bsx

            rings = jnp.asarray(bsx.bsk_to_mxu(bsk.data, cfg))
            out = np.array(bsx.bootstrap_mxu(cfg, rings, lut, jnp.asarray(cts)))
        else:
            bsk_ntt = bsk_to_ntt(bsk.data, cfg.primes, 64)
            out = np.array(bs.bootstrap(cfg, bsk_ntt, lut, jnp.asarray(cts)))
        dec = glwe_sk.into_lwe_key().decrypt(out)
        predicted = npe.estimate_pbs_noise(
            params["n"], params["N"], params["k"], params["base_log"],
            params["levels"], bsk_std, 64)
        assert_noise_bounded(dec, msgs, predicted, 64, slack_bits=0.5)


ALL_FIXTURES = [
    LweEncryptDecryptFixture,
    GlweEncryptDecryptFixture,
    LweKeyswitchFixture,
    ExternalProductFixture,
    PackingKeyswitchFixture,
    LweAffineTransformFixture,
    SampleExtractFixture,
    CmuxFixture,
    PbsFixture,
    U64PbsFixture,
]


def run_all(repetitions=None, sample_size=None) -> list:
    reports = []
    for fx_cls in ALL_FIXTURES:
        reports.extend(fx_cls().stress(repetitions, sample_size))
    return reports
