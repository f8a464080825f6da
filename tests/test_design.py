"""Tests for the TPU-first parameter co-design module (design.py).

The error model is the load-bearing piece: TPU128_PARAMETERS' security
grade rests on it, so it is pinned here against the reference's published
numbers and against hand-computable anchors."""

import math

import pytest

from concrete_tpu import design
from concrete_tpu.dispersion import StandardDev
from concrete_tpu.params import (
    BooleanParameters,
    DEFAULT_PARAMETERS,
    TFHE_LIB_PARAMETERS,
    TPU128_PARAMETERS,
)


def test_security_curve_hits_published_points():
    # the interpolation must reproduce the reference's own calibration table
    # exactly at the published dimensions (lwe_params.rs:23-90)
    assert design.min_log2_std(630) == -14.0
    assert design.min_log2_std(1024) == -25.0
    assert design.min_log2_std(2048) == -52.0
    assert design.min_log2_std(630, security=80) == -24.0
    # interpolation is monotone decreasing in dimension
    assert design.min_log2_std(700) < design.min_log2_std(650)
    with pytest.raises(ValueError):
        design.min_log2_std(100)


def test_security_curve_saturates_above_table():
    assert design.min_log2_std(8192) == -105.0


def test_gate_error_tracks_published_grades():
    # Our exact-integer path has no f64-FFT rounding noise, so the model must
    # be at or below (better than) the reference's published grades
    # (error.md:22-23), but within a few bits of sigma: the predicted
    # pre-decision sigma for DEFAULT under fresh-input accounting is 2^-5.98
    # vs the 2^-5.55 the published 2^-25 corresponds to.
    assert design.gate_error_log2(DEFAULT_PARAMETERS, worst_chain=False) < -25
    assert design.gate_error_log2(TFHE_LIB_PARAMETERS, worst_chain=False) < -165
    # ... and not absurdly far off either (model sanity)
    assert design.gate_error_log2(DEFAULT_PARAMETERS, worst_chain=False) > -80
    # worst-chain accounting (MUX inputs) is strictly harder
    assert (design.gate_error_log2(DEFAULT_PARAMETERS)
            > design.gate_error_log2(DEFAULT_PARAMETERS, worst_chain=False))


def test_gate_error_far_tail_log_domain():
    # TFHE_LIB sits far past where erfc underflows f64; the asymptotic
    # branch must kick in and stay finite/continuous
    e = design.gate_error_log2(TFHE_LIB_PARAMETERS)
    assert -1000 < e < -150


def test_tpu128_meets_its_grade():
    # the shipped preset's documented guarantees, recomputed from scratch
    assert design.gate_error_log2(TPU128_PARAMETERS) <= -32
    assert design.gate_error_log2(TPU128_PARAMETERS, worst_chain=False) <= -43
    # security: both noise points at/above the curve for their dimensions
    p = TPU128_PARAMETERS
    assert math.log2(p.lwe_modular_std_dev.std_dev) >= design.min_log2_std(
        p.lwe_dimension)
    assert math.log2(p.glwe_modular_std_dev.std_dev) >= design.min_log2_std(
        p.glwe_dimension * p.polynomial_size)


def test_tpu128_is_mxu_clean():
    # base_log=7 digits fit a signed byte: no digit sub-split on the MXU path
    from concrete_tpu.core.bootstrap import ServerConfig
    from concrete_tpu.core.bootstrap_mxu import MxuPlan

    plan = MxuPlan.from_config(
        ServerConfig.from_boolean_parameters(TPU128_PARAMETERS))
    assert plan.n_sub == 1
    assert plan.row_blocks == 10  # l * (k+1)


def test_cost_model_anchor():
    # the model must reproduce the measured TFHE_LIB-exact profile it is
    # anchored on (834 us/iter * 630 iters at B=2048 -> ~3.9k gates/s)
    rate = design.TpuCostModel().gates_per_s(TFHE_LIB_PARAMETERS, batch=2048)
    assert 3300 <= rate <= 4600


def test_search_returns_shipped_point_class():
    cands = design.search(n_range=range(630, 651, 10),
                          shapes=((4, 256), (2, 512)),
                          levels=range(2, 4), base_logs=range(6, 8))
    assert cands, "sweep found no feasible points"
    top = cands[0].params
    # the co-designed operating point: (k=4, N=256, bl=7, l=2) dominates
    assert (top.glwe_dimension, top.polynomial_size) == (4, 256)
    assert (top.pbs_base_log, top.pbs_level) == (7, 2)
    assert all(c.err_log2 <= -25.0 for c in cands)
    # ranking is by modeled throughput, descending
    rates = [c.gates_per_s for c in cands]
    assert rates == sorted(rates, reverse=True)


def test_ks_search_minimizes_levels():
    got = design._ks_search(1024, 2.0 ** -14, 2.0 ** -14.5)
    assert got is not None
    bl, l = got
    # any feasible solution with fewer levels must not exist
    from concrete_tpu import npe
    from concrete_tpu.dispersion import Variance

    for fewer in range(1, l):
        for b in range(1, 9):
            v = npe.estimate_keyswitch_noise_with_constant_terms(
                1024, Variance(0.0), StandardDev(2.0 ** -14), b, fewer, 32
            ).get_variance()
            assert v > 2.0 ** -14.5


def test_infeasible_target_returns_empty():
    # an absurd error target at tiny dimensions has no feasible point
    cands = design.search(target_err_log2=-500.0,
                          n_range=range(560, 581, 10),
                          shapes=((1, 1024),), levels=range(1, 2),
                          base_logs=range(3, 4))
    assert cands == []
