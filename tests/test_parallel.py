"""Sharded gate pipelines on the virtual 8-device CPU mesh: dp and dp+tp
shardings (both backends) must be bit-identical to the single-device path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from concrete_tpu.core import bootstrap as bs
from concrete_tpu.core import bootstrap_mxu as bsx
from concrete_tpu.parallel import (
    make_mesh,
    gate_pipeline_dp,
    gate_pipeline_dp_tp,
    gate_pipeline_dp_tp_mxu,
)

from common import TINY


@pytest.fixture(scope="module")
def setup():
    cfg = bs.ServerConfig.from_boolean_parameters(TINY)
    rng = np.random.default_rng(0)
    n, l, ks1, N = cfg.lwe_dimension, cfg.pbs_level, cfg.glwe_size, cfg.polynomial_size
    bsk_raw = rng.integers(0, 1 << 32, size=(n, l, ks1, ks1, N), dtype=np.uint32)
    bsk_ntt = jnp.asarray(
        np.stack(
            [rng.integers(0, p, size=(n, l, ks1, ks1, N), dtype=np.uint32)
             for p in cfg.primes], axis=1)
    )
    rings = jnp.asarray(bsx.bsk_to_mxu(bsk_raw, cfg))
    ksk = jnp.asarray(rng.integers(
        0, 1 << 32, size=(cfg.big_lwe_dimension, cfg.ks_level, n + 1),
        dtype=np.uint32))
    lut = bs.trivial_lut_constant(cfg, np.uint32(1 << 29))
    lin = jnp.asarray(rng.integers(0, 1 << 32, size=(16, n + 1), dtype=np.uint32))
    return cfg, bsk_ntt, rings, ksk, lut, lin


def test_dp_matches_single_device_ntt(setup):
    cfg, bsk_ntt, rings, ksk, lut, lin = setup
    want = np.asarray(bs.bootstrap_keyswitch(cfg, bsk_ntt, ksk, lut, lin))
    mesh = make_mesh(dp=8, tp=1)
    got = np.asarray(gate_pipeline_dp(cfg, mesh, backend="ntt")(bsk_ntt, ksk, lut, lin))
    np.testing.assert_array_equal(got, want)


def test_dp_matches_single_device_mxu(setup):
    cfg, bsk_ntt, rings, ksk, lut, lin = setup
    want = np.asarray(bsx.bootstrap_keyswitch_mxu(cfg, rings, ksk, lut, lin))
    mesh = make_mesh(dp=8, tp=1)
    got = np.asarray(gate_pipeline_dp(cfg, mesh, backend="mxu")(rings, ksk, lut, lin))
    np.testing.assert_array_equal(got, want)


def test_dp_tp_matches_single_device_ntt(setup):
    cfg, bsk_ntt, rings, ksk, lut, lin = setup
    want = np.asarray(bs.bootstrap_keyswitch(cfg, bsk_ntt, ksk, lut, lin))
    mesh = make_mesh(dp=4, tp=2)
    got = np.asarray(gate_pipeline_dp_tp(cfg, mesh)(bsk_ntt, ksk, lut, lin))
    np.testing.assert_array_equal(got, want)


def test_dp_tp_matches_single_device_mxu(setup):
    cfg, bsk_ntt, rings, ksk, lut, lin = setup
    want = np.asarray(bsx.bootstrap_keyswitch_mxu(cfg, rings, ksk, lut, lin))
    mesh = make_mesh(dp=4, tp=2)
    got = np.asarray(gate_pipeline_dp_tp_mxu(cfg, mesh)(rings, ksk, lut, lin))
    np.testing.assert_array_equal(got, want)


def test_mxu_and_ntt_paths_bit_identical(setup):
    """Both backends are exact integer arithmetic mod 2^32 over the SAME key
    material — but the setup fixture uses independent synthetic keys per
    backend, so compare them via real key material instead."""
    cfg, *_ = setup
    rng = np.random.default_rng(1)
    n, l, ks1, N = cfg.lwe_dimension, cfg.pbs_level, cfg.glwe_size, cfg.polynomial_size
    bsk_raw = rng.integers(0, 1 << 32, size=(n, l, ks1, ks1, N), dtype=np.uint32)
    from concrete_tpu.core.ggsw import bsk_to_ntt

    bsk_ntt = bsk_to_ntt(bsk_raw, cfg.primes, cfg.bits)
    rings = jnp.asarray(bsx.bsk_to_mxu(bsk_raw, cfg))
    lut = bs.trivial_lut_constant(cfg, np.uint32(1 << 29))
    lin = jnp.asarray(rng.integers(0, 1 << 32, size=(8, n + 1), dtype=np.uint32))
    a = np.asarray(bs.bootstrap(cfg, bsk_ntt, lut, lin))
    b = np.asarray(bsx.bootstrap_mxu(cfg, rings, lut, lin))
    np.testing.assert_array_equal(a, b)


def test_dp_tp_mxu_u64(setup):
    """The tp-sharded MXU pipeline is u64-correct (shared limb recombine;
    wrapping psum is exact mod 2^64)."""
    cfg = bs.ServerConfig(
        lwe_dimension=8, glwe_dimension=1, polynomial_size=64,
        pbs_base_log=10, pbs_level=3, ks_base_log=4, ks_level=3, bits=64)
    rng = np.random.default_rng(3)
    n, l, ks1, N = cfg.lwe_dimension, cfg.pbs_level, cfg.glwe_size, cfg.polynomial_size
    bsk_raw = rng.integers(0, 1 << 63, size=(n, l, ks1, ks1, N), dtype=np.uint64)
    rings = jnp.asarray(bsx.bsk_to_mxu(bsk_raw, cfg))
    ksk = jnp.asarray(rng.integers(
        0, 1 << 63, size=(cfg.big_lwe_dimension, cfg.ks_level, n + 1),
        dtype=np.uint64))
    lut = bs.trivial_lut_constant(cfg, np.uint64(1 << 60))
    lin = jnp.asarray(rng.integers(0, 1 << 63, size=(8, n + 1), dtype=np.uint64))
    want = np.asarray(bsx.bootstrap_keyswitch_mxu(cfg, rings, ksk, lut, lin))
    mesh = make_mesh(dp=4, tp=2)
    got = np.asarray(gate_pipeline_dp_tp_mxu(cfg, mesh)(rings, ksk, lut, lin))
    np.testing.assert_array_equal(got, want)


def test_tp_nondivisible_raises_typed_error(setup):
    """tp that does not divide the sharded axis raises ShardingMismatch with
    an actionable message, not a bare assert (TINY: l=2, k=1, bl=8 -> R=8;
    tp=3 divides neither R nor pbs_level)."""
    from concrete_tpu.core import checks

    cfg, *_ = setup
    with pytest.raises(checks.ShardingMismatch, match="row_blocks"):
        gate_pipeline_dp_tp_mxu(cfg, make_mesh(dp=2, tp=3))
    with pytest.raises(checks.ShardingMismatch, match="pbs_level"):
        gate_pipeline_dp_tp(cfg, make_mesh(dp=2, tp=3))


def test_dp_tp3_replicated_keyswitch_matches_single_device():
    """Odd tp (3) never divides the power-of-two keyswitch contraction; the
    pipeline must fall back to a replicated keyswitch and stay bit-identical
    (l=3 -> levels and row blocks both split 3 ways)."""
    from concrete_tpu.dispersion import StandardDev
    from concrete_tpu.params import BooleanParameters

    p = BooleanParameters(
        lwe_dimension=8, glwe_dimension=1, polynomial_size=128,
        lwe_modular_std_dev=StandardDev(2.0 ** -20),
        glwe_modular_std_dev=StandardDev(2.0 ** -25),
        pbs_base_log=7, pbs_level=3, ks_base_log=4, ks_level=3)
    cfg = bs.ServerConfig.from_boolean_parameters(p)
    rng = np.random.default_rng(3)
    n, l, ks1, N = cfg.lwe_dimension, cfg.pbs_level, cfg.glwe_size, cfg.polynomial_size
    bsk_raw = rng.integers(0, 1 << 32, size=(n, l, ks1, ks1, N), dtype=np.uint32)
    rings = jnp.asarray(bsx.bsk_to_mxu(bsk_raw, cfg))
    bsk_ntt = jnp.asarray(np.stack(
        [rng.integers(0, pr, size=(n, l, ks1, ks1, N), dtype=np.uint32)
         for pr in cfg.primes], axis=1))
    ksk = jnp.asarray(rng.integers(
        0, 1 << 32, size=(cfg.big_lwe_dimension, cfg.ks_level, n + 1),
        dtype=np.uint32))
    lut = bs.trivial_lut_constant(cfg, np.uint32(1 << 29))
    lin = jnp.asarray(rng.integers(0, 1 << 32, size=(12, n + 1), dtype=np.uint32))
    mesh = make_mesh(dp=2, tp=3)
    got = np.asarray(gate_pipeline_dp_tp_mxu(cfg, mesh)(rings, ksk, lut, lin))
    want = np.asarray(bsx.bootstrap_keyswitch_mxu(cfg, rings, ksk, lut, lin))
    np.testing.assert_array_equal(got, want)
    got2 = np.asarray(gate_pipeline_dp_tp(cfg, mesh)(bsk_ntt, ksk, lut, lin))
    want2 = np.asarray(bs.bootstrap_keyswitch(cfg, bsk_ntt, ksk, lut, lin))
    np.testing.assert_array_equal(got2, want2)


@pytest.mark.parametrize("bits", [32, 64])
def test_dp_tp_nuss_matches_single_device(bits):
    """The Nussbaumer-path sharded pipeline (per-frequency row blocks on tp,
    wrapping psum per CMux) must be bit-identical to the single-device
    bootstrap_keyswitch_nuss on both torus widths."""
    from concrete_tpu.core import bootstrap_nuss as bsn
    from concrete_tpu.parallel import gate_pipeline_dp_tp_nuss

    rng = np.random.default_rng(31)
    n, k, N, bl, lv, L = 5, 1, 128, 7, 2, 4
    cfg = bs.ServerConfig(lwe_dimension=n, glwe_dimension=k,
                          polynomial_size=N, pbs_base_log=bl, pbs_level=lv,
                          ks_base_log=4, ks_level=3, bits=bits)
    plan = bsn.NussPlan.from_config(cfg, L)
    assert plan.row_blocks % 2 == 0
    dt = np.uint32 if bits == 32 else np.uint64
    hi = 1 << bits
    bsk_raw = rng.integers(0, hi, size=(n, lv, k + 1, k + 1, N), dtype=dt)
    rings = jnp.asarray(bsn.bsk_to_nuss(bsk_raw, cfg, L))
    ksk = jnp.asarray(rng.integers(
        0, hi, size=(cfg.big_lwe_dimension, cfg.ks_level, n + 1), dtype=dt))
    lut = bs.trivial_lut_constant(cfg, dt(1) << dt(bits - 3))
    lin = jnp.asarray(rng.integers(0, hi, size=(8, n + 1), dtype=dt))
    want = np.asarray(bsn.bootstrap_keyswitch_nuss(
        cfg, rings, ksk, lut, lin, l=L))
    mesh = make_mesh(dp=4, tp=2)
    got = np.asarray(
        gate_pipeline_dp_tp_nuss(cfg, mesh, l=L)(rings, ksk, lut, lin))
    np.testing.assert_array_equal(got, want)


def test_dp_tp_nuss_nondivisible_raises_typed_error():
    from concrete_tpu.core import checks
    from concrete_tpu.parallel import gate_pipeline_dp_tp_nuss

    cfg = bs.ServerConfig(lwe_dimension=5, glwe_dimension=1,
                          polynomial_size=128, pbs_base_log=7, pbs_level=2,
                          ks_base_log=4, ks_level=3)
    with pytest.raises(checks.ShardingMismatch, match="nuss row_blocks"):
        gate_pipeline_dp_tp_nuss(cfg, make_mesh(dp=2, tp=3), l=4)
