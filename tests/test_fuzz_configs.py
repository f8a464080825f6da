"""Config-space fuzzing: the MXU and NTT external products must agree
bit-for-bit on random parameter combinations (both are exact integer
arithmetic mod 2^bits). Catches layout/split/bound edge cases the named
parameter sets miss."""

import numpy as np
import jax.numpy as jnp
import pytest

from concrete_tpu.core import bootstrap as bs
from concrete_tpu.core import bootstrap_mxu as bsx

RNG = np.random.default_rng(2026)


def _random_config(i):
    rng = np.random.default_rng(1000 + i)
    bits = int(rng.choice([32, 64]))
    return bs.ServerConfig(
        lwe_dimension=int(rng.integers(2, 8)),
        glwe_dimension=int(rng.choice([1, 2, 3])),
        polynomial_size=int(rng.choice([32, 64, 128, 256])),
        pbs_base_log=int(rng.integers(2, 15 if bits == 32 else 19)),
        pbs_level=int(rng.integers(1, 5)),
        ks_base_log=2,
        ks_level=3,
        bits=bits,
    )


@pytest.mark.parametrize("i", range(12))
def test_external_product_cross_backend_fuzz(i):
    cfg = _random_config(i)
    # skip configs only when the plan itself rejects them (and assert that
    # the rejection is the documented NotImplementedError)
    try:
        plan = bsx.MxuPlan.from_config(cfg)
    except NotImplementedError:
        return
    dt = np.uint32 if cfg.bits == 32 else np.uint64
    hi = 1 << cfg.bits          # exclusive: all-ones values ARE reachable
    rng = np.random.default_rng(7000 + i)
    l, ks1, N = cfg.pbs_level, cfg.glwe_size, cfg.polynomial_size
    ggsw = rng.integers(0, hi, size=(l, ks1, ks1, N), dtype=dt)
    glwe = jnp.asarray(rng.integers(0, hi, size=(3, ks1, N), dtype=dt))
    from concrete_tpu.core.ggsw import ggsw_to_ntt

    want = np.asarray(bs.external_product(
        cfg, ggsw_to_ntt(ggsw, cfg.primes, cfg.bits), glwe))
    rings = jnp.asarray(bsx.bsk_to_mxu(ggsw[None], cfg)[0])
    got = np.asarray(bsx.external_product_mxu(cfg, rings, glwe))
    np.testing.assert_array_equal(
        got, want,
        err_msg=f"cfg={cfg!r} n_sub={plan.n_sub} n_limbs={plan.n_limbs}",
    )


@pytest.mark.parametrize("i", range(12))
def test_external_product_nuss_cross_backend_fuzz(i):
    """The Nussbaumer-domain external product must agree bit-for-bit with
    the direct MXU path on random configs x random feasible chunkings
    (both torus widths — catches carriage/limb/transform edge cases the
    named shapes miss)."""
    from concrete_tpu.core import bootstrap_nuss as bsn

    cfg = _random_config(i)
    try:
        bsx.MxuPlan.from_config(cfg)
    except NotImplementedError:
        return
    rng = np.random.default_rng(9000 + i)
    n_poly = cfg.polynomial_size
    feasible = [L for L in (2, 4, 8, 16)
                if L * L <= n_poly and (n_poly // L) % L == 0]
    ok_plans = []
    for L in feasible:
        try:
            ok_plans.append(bsn.NussPlan.from_config(cfg, L).l)
        except (NotImplementedError, ValueError):
            pass
    if not ok_plans:
        return
    L = int(rng.choice(ok_plans))
    dt = np.uint32 if cfg.bits == 32 else np.uint64
    hi = 1 << cfg.bits          # exclusive: all-ones values ARE reachable
    l, ks1, N = cfg.pbs_level, cfg.glwe_size, cfg.polynomial_size
    ggsw = rng.integers(0, hi, size=(l, ks1, ks1, N), dtype=dt)
    glwe = jnp.asarray(rng.integers(0, hi, size=(3, ks1, N), dtype=dt))
    rings_m = jnp.asarray(bsx.bsk_to_mxu(ggsw[None], cfg)[0])
    want = np.asarray(bsx.external_product_mxu(cfg, rings_m, glwe))
    rings_n = jnp.asarray(bsn.bsk_to_nuss(ggsw[None], cfg, L)[0])
    got = np.asarray(bsn.external_product_nuss(cfg, rings_n, glwe, l=L))
    np.testing.assert_array_equal(
        got, want, err_msg=f"cfg={cfg!r} L={L}")
