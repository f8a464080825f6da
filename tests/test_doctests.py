"""Run public-API doctests — the reference's doctest-as-unit-test tier
(SURVEY §4 tier 1: nearly every public function carries a runnable example;
cargo xtask test runs them)."""

import doctest

import pytest

import concrete_tpu.csprng.generator
import concrete_tpu.highlevel.encoder
import concrete_tpu.math.decomposition
import concrete_tpu.npe

MODULES = [
    concrete_tpu.csprng.generator,
    concrete_tpu.highlevel.encoder,
    concrete_tpu.math.decomposition,
    concrete_tpu.npe,
]


@pytest.mark.parametrize("mod", MODULES, ids=lambda m: m.__name__)
def test_doctests(mod):
    results = doctest.testmod(mod, verbose=False)
    assert results.failed == 0, f"{mod.__name__}: {results.failed} doctest failures"
    assert results.attempted > 0, f"{mod.__name__}: no doctests collected"
