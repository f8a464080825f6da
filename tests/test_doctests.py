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

# entry points / pure re-export surfaces with no API of their own
EXEMPT_SUFFIXES = ("__main__",)
EXEMPT = {
    "concrete_tpu",             # package root: re-exports
}


def _iter_modules():
    mods = []
    for info in pkgutil.walk_packages(
        concrete_tpu.__path__, prefix="concrete_tpu."
    ):
        name = info.name
        if name.endswith(EXEMPT_SUFFIXES):
            continue
        mods.append(name)
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
    if name not in EXEMPT and not name.endswith("__init__"):
        # packages' __init__ are exercised via their submodules; plain modules
        # must each carry at least one example
        is_pkg = hasattr(mod, "__path__")
        if not is_pkg:
            assert results.attempted > 0, f"{name}: no doctests collected"
