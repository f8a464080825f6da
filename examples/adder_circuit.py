"""8-bit homomorphic ripple-carry adder over an encrypted batch
(BASELINE config 5)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from concrete_tpu import boolean
from concrete_tpu.boolean import circuits


def main():
    cks, sks = boolean.gen_keys(secret_seed=1, mask_seed=2, noise_seed=3)
    a = np.array([17, 200, 33], dtype=np.uint64)
    b = np.array([25, 55, 99], dtype=np.uint64)
    a_bits = circuits.encrypt_uint(cks, a, 8)
    b_bits = circuits.encrypt_uint(cks, b, 8)
    sum_bits, carry = circuits.ripple_carry_adder(sks, a_bits, b_bits)
    total = circuits.decrypt_uint(cks, np.array(sum_bits))
    print("a + b =", total, "(expect", (a + b) % 256, ")")


if __name__ == "__main__":
    main()
