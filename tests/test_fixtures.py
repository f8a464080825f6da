"""Run the conformance fixture suite (concrete-core-test analog)."""

from concrete_tpu import fixtures


def test_all_fixtures():
    reports = fixtures.run_all(repetitions=1, sample_size=100)
    failures = [r for r in reports if not r.passed]
    assert not failures, "\n".join(f"{r.name} {r.parameters}: {r.detail}" for r in failures)
    assert len(reports) >= 6


def test_external_product_message_moments_consistency():
    """The generalized message-moment formula must reduce exactly to the
    reference's binary-averaged form at E[m]=E[m^2]=1/2, and the
    deterministic-GGSW(1) variant must be ~2x in variance when the
    decomposition-rounding term dominates (the measured behavior —
    docs/performance.md 'GGSW message moments')."""
    from concrete_tpu import npe
    from concrete_tpu.dispersion import StandardDev, Variance

    args = (256, 4, Variance((2.0 ** -25) ** 2), StandardDev(2.0 ** -25),
            7, 2, 32)
    binary = npe.estimate_external_product_noise_with_binary_ggsw(*args)
    general_half = npe.estimate_external_product_noise_with_ggsw_message(
        *args, msg_mean=0.5, msg_second_moment=0.5)
    assert abs(binary.get_variance() - general_half.get_variance()) \
        <= 1e-12 * binary.get_variance()
    det_one = npe.estimate_external_product_noise_with_ggsw_message(
        *args, msg_mean=1.0, msg_second_moment=1.0)
    ratio = det_one.get_variance() / binary.get_variance()
    assert 1.8 < ratio < 2.1, ratio
    # m = 0: only the BSK-encryption-noise term survives
    det_zero = npe.estimate_external_product_noise_with_ggsw_message(
        *args, msg_mean=0.0, msg_second_moment=0.0)
    assert det_zero.get_variance() < 0.05 * binary.get_variance()
