"""Programmable bootstrapping with an arbitrary real function (the
`concrete` crate's LWE::bootstrap_with_function, lwe/mod.rs:1781)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from concrete_tpu.highlevel import (
    LWE, LWEBSK, Encoder, LWESecretKey, LWEParams, RLWESecretKey, RLWEParams,
)


def main():
    # moderate (insecure, demo-sized) parameters for a fast run
    sk = LWESecretKey.new(LWEParams(dimension=128, log2_std_dev=-30), secret_seed=1)
    rlwe = RLWESecretKey.new(RLWEParams(polynomial_size=512, dimension=1, log2_std_dev=-40), secret_seed=2)
    bsk = LWEBSK.new(sk, rlwe, base_log=10, level=3, mask_seed=3, noise_seed=4)

    enc_in = Encoder.new(0.0, 8.0, nb_bit_precision=5, nb_bit_padding=1)
    enc_out = Encoder.new(0.0, 64.0, nb_bit_precision=5, nb_bit_padding=1)

    ct = LWE.encode_encrypt(sk, [1.5, 2.0, 7.0], enc_in, mask_seed=5, noise_seed=6)
    sq = ct.bootstrap_with_function(bsk, lambda x: x * x, enc_out)

    big_key = rlwe.to_lwe_secret_key()
    print("x^2 =", np.round(sq.decrypt_decode(big_key), 2), "(expect ~[2.25, 4.0, 49.0])")


if __name__ == "__main__":
    main()
