"""Generate the committed cross-version serde golden artifacts.

Run ONCE per intentional format change (then commit the outputs); the tests
in tests/test_golden.py::test_serde_* only LOAD these files — never
regenerate — so any drift in the on-disk layout of keys, ciphertexts, or
encoders is caught against artifacts produced by an older version.
Reference analog: /root/reference/concrete/src/tests_serde.rs:1-232.

Usage: (cd tests/golden_serde && JAX_PLATFORMS=cpu python generate.py)
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from common import TINY  # noqa: E402
from concrete_tpu import boolean  # noqa: E402
from concrete_tpu.highlevel import (  # noqa: E402
    LWE,
    LWEBSK,
    LWEKSK,
    LWESecretKey,
    RLWESecretKey,
    Encoder,
    Plaintext,
    VectorLWE,
    VectorRLWE,
)
from concrete_tpu.highlevel.params_presets import LWEParams, RLWEParams  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def p(name):
    return os.path.join(HERE, name)


def main():
    manifest = {}

    # -- boolean crate artifacts (TINY params, fixed seeds) ------------------
    cks, sks = boolean.gen_keys(TINY, secret_seed=7, mask_seed=8, noise_seed=9)
    cks.save(p("client_key.npz"))
    sks.save(p("server_key.npz"))
    bits = [True, False, True, False]
    ct = cks.encrypt(np.array(bits), mask_seed=10, noise_seed=11)
    np.save(p("boolean_ct.npy"), np.asarray(ct))
    manifest["boolean_ct"] = bits
    out = np.asarray(sks.and_(ct, cks.encrypt(
        np.array([True, True, False, False]), mask_seed=12, noise_seed=13)))
    np.save(p("boolean_and_ct.npy"), out)
    manifest["boolean_and_ct"] = [True, False, False, False]

    # -- highlevel crate artifacts ------------------------------------------
    lwe_params = LWEParams(dimension=32, log2_std_dev=-45)
    rlwe_params = RLWEParams(polynomial_size=64, dimension=1, log2_std_dev=-45)
    sk = LWESecretKey.new(lwe_params, secret_seed=21)
    sk.save(p("lwe_sk.npz"))
    rsk = RLWESecretKey.new(rlwe_params, secret_seed=22)
    rsk.save(p("rlwe_sk.npz"))

    enc = Encoder.new(0.0, 10.0, nb_bit_precision=6, nb_bit_padding=2)
    enc.save(p("encoder.json"))
    manifest["encoder"] = {"o": enc.o, "delta": enc.delta}

    single = LWE.encode_encrypt(sk, 4.25, enc, mask_seed=23, noise_seed=24)
    single.save(p("lwe_ct.npz"))
    manifest["lwe_ct"] = 4.25

    vl_msgs = [1.0, 3.5, 7.25]
    vl = VectorLWE.encode_encrypt(sk, vl_msgs, enc, mask_seed=25, noise_seed=26)
    vl.save(p("vector_lwe.npz"))
    manifest["vector_lwe"] = vl_msgs

    vr_msgs = [2.0, 5.5]
    vr = VectorRLWE.encode_encrypt_packed(
        rsk, vr_msgs, enc, mask_seed=27, noise_seed=28)
    vr.save(p("vector_rlwe.npz"))
    manifest["vector_rlwe"] = vr_msgs

    pt = Plaintext.encode(np.array([1.5, 8.0]), enc)
    pt.save(p("plaintext.npz"))
    manifest["plaintext"] = [1.5, 8.0]

    bsk = LWEBSK.new(sk, rsk, base_log=7, level=3,
                     mask_seed=29, noise_seed=30)
    bsk.save(p("lwe_bsk.npz"))
    ksk = LWEKSK.new(rsk.to_lwe_secret_key(), sk, base_log=4, level=3,
                     mask_seed=31, noise_seed=32)
    ksk.save(p("lwe_ksk.npz"))

    with open(p("manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print("golden serde artifacts written to", HERE)


if __name__ == "__main__":
    main()
