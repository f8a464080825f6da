"""Reduced-precision fast mode: the same keys, ~1.3x gate throughput.

`ServerKey.with_fast_mode()` evaluates TFHE_LIB_PARAMETERS with the two
most-significant PBS decomposition levels of the same bootstrapping key.
Chained-gate error probability ~2^-24 — the grade of the reference's own
DEFAULT_PARAMETERS design point. See docs/performance.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from concrete_tpu import boolean
from concrete_tpu.params import TFHE_LIB_PARAMETERS


def main():
    cks, sks = boolean.gen_keys(
        TFHE_LIB_PARAMETERS, secret_seed=1, mask_seed=2, noise_seed=3)
    fast = sks.with_fast_mode()          # levels=2 on the same key material

    rng = np.random.default_rng(0)
    a = rng.integers(0, 2, 256).astype(bool)
    b = rng.integers(0, 2, 256).astype(bool)
    cta = cks.encrypt(a, mask_seed=4, noise_seed=5)
    ctb = cks.encrypt(b, mask_seed=6, noise_seed=7)

    # a chained circuit: (a AND b) XOR (a OR b) — fast-mode outputs feed
    # fast-mode inputs, exercising the chained noise budget
    t1 = fast.and_(cta, ctb)
    t2 = fast.or_(cta, ctb)
    out = fast.xor(np.asarray(t1), np.asarray(t2))
    got = cks.decrypt(np.asarray(out))
    want = (a & b) ^ (a | b)
    print(f"chained fast-mode gates: {int((got == want).sum())}/256 correct")
    assert bool((got == want).all())


if __name__ == "__main__":
    main()
