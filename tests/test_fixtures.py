"""Run the conformance fixture suite (concrete-core-test analog)."""

from concrete_tpu import fixtures


def test_all_fixtures():
    reports = fixtures.run_all(repetitions=1, sample_size=100)
    failures = [r for r in reports if not r.passed]
    assert not failures, "\n".join(f"{r.name} {r.parameters}: {r.detail}" for r in failures)
    assert len(reports) >= 6
