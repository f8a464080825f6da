"""Homomorphic boolean gates end to end (concrete-boolean's README example,
batched)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from concrete_tpu import boolean


def main():
    # gen_keys() uses DEFAULT_PARAMETERS (128-bit security); here we seed for
    # reproducibility — omit seeds in production.
    cks, sks = boolean.gen_keys(secret_seed=1, mask_seed=2, noise_seed=3)

    a = np.array([True, True, False, False])
    b = np.array([True, False, True, False])
    ct_a = cks.encrypt(a)
    ct_b = cks.encrypt(b)

    ct_and = sks.and_(ct_a, ct_b)
    ct_mux = sks.mux(ct_and, ct_a, ct_b)  # chaining works: noise is refreshed

    print("a AND b      =", cks.decrypt(np.array(ct_and)))
    print("mux(and,a,b) =", cks.decrypt(np.array(ct_mux)))


if __name__ == "__main__":
    main()
