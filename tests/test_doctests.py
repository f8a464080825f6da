"""Run public-API doctests — the reference's doctest-as-unit-test tier
(SURVEY §4 tier 1: nearly every public function carries a runnable example;
cargo xtask test runs them).

Auto-discovers EVERY concrete_tpu module; each substantive module must carry
at least one runnable example (the reference puts one on virtually every
public fn — fourier/mod.rs:55-76, transform.rs:88-107)."""

import doctest
import importlib
import pkgutil

import pytest

import concrete_tpu

# entry points with no API of their own
EXEMPT = {
    "concrete_tpu.csprng.__main__",   # stream-to-stdout CLI
}


def _iter_modules():
    mods = []
    for info in pkgutil.walk_packages(
        concrete_tpu.__path__, prefix="concrete_tpu."
    ):
        if info.name not in EXEMPT:
            mods.append(info.name)
    return sorted(mods)


ALL_MODULES = _iter_modules()


def test_discovery_is_complete():
    # the walk must see the whole package (guards against silent misconfig)
    assert len(ALL_MODULES) > 25


@pytest.mark.parametrize("name", ALL_MODULES)
def test_doctests(name):
    mod = importlib.import_module(name)
    results = doctest.testmod(mod, verbose=False)
    assert results.failed == 0, f"{name}: {results.failed} doctest failures"
    # packages are exercised via their submodules; every plain module must
    # carry at least one example
    if not hasattr(mod, "__path__"):
        assert results.attempted > 0, f"{name}: no doctests collected"
