"""Programmable bootstrapping with an arbitrary LUT on 4-bit encrypted
integers (BASELINE config 3): blind rotate + sample extract + keyswitch.

Encodes 4-bit values on the torus with one padding bit, bootstraps through
an arbitrary integer table (here: x -> (3x + 1) mod 16), and decrypts.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from concrete_tpu.highlevel import (
    LWE128_630,
    RLWE128_1024_1,
    Encoder,
    LWEBSK,
    LWEKSK,
    LWESecretKey,
    RLWESecretKey,
    VectorLWE,
)


def main():
    sk = LWESecretKey.new(LWE128_630)
    rlwe_sk = RLWESecretKey.new(RLWE128_1024_1)
    bsk = LWEBSK.new(sk, rlwe_sk, base_log=7, level=3, mask_seed=1, noise_seed=2)
    ksk = LWEKSK.new(
        rlwe_sk.to_lwe_secret_key(), sk, base_log=2, level=8,
        mask_seed=3, noise_seed=4,
    )

    # 4-bit integers in [0, 16) with one padding bit
    enc_in = Encoder.new(0.0, 15.0, nb_bit_precision=4, nb_bit_padding=1)
    enc_out = Encoder.new(0.0, 15.0, nb_bit_precision=4, nb_bit_padding=1)

    table = lambda x: float((3 * int(round(x)) + 1) % 16)  # noqa: E731
    xs = np.array([0.0, 1.0, 5.0, 9.0, 15.0])
    v = VectorLWE.encode_encrypt(sk, xs, enc_in)
    out = v.bootstrap_all_with_function(bsk, table, enc_out)
    out = out.keyswitch(ksk)               # back to the small key
    got = np.round(out.decrypt_decode(sk))
    want = [(3 * int(x) + 1) % 16 for x in xs]
    print("LUT(3x+1 mod 16) of", xs.astype(int).tolist(), "->", got.astype(int).tolist(),
          "(expect", want, ")")


if __name__ == "__main__":
    main()
