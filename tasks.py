"""Task runner — the concrete-tasks (cargo xtask) analog.

Usage: python tasks.py {test|test-fast|fixtures|bench|bench-suite|doctest|check|cov}
Reference: concrete-tasks/src/main.rs:57-96.
"""

import subprocess
import sys


def run(cmd):
    print("+", " ".join(cmd), file=sys.stderr)
    return subprocess.call(cmd)


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "test"
    if cmd == "test":
        sys.exit(run([sys.executable, "-m", "pytest", "tests/", "-x", "-q"]))
    if cmd == "test-fast":
        sys.exit(run([sys.executable, "-m", "pytest", "tests/", "-x", "-q",
                      "-k", "not fixtures and not slow and not fuzz"]))
    if cmd == "fixtures":
        # conformance fixtures are a host-CPU suite (like concrete-core-test);
        # the ambient environment may pin a remote accelerator platform, so
        # override the config var before jax initializes (cf. tests/conftest)
        sys.exit(run([sys.executable, "-c",
                      "import os; os.environ['JAX_PLATFORMS'] = 'cpu';"
                      "import jax; jax.config.update('jax_platforms', 'cpu');"
                      "from concrete_tpu import fixtures;"
                      "rs = fixtures.run_all();"
                      "[print(r) for r in rs];"
                      "import sys; sys.exit(any(not r.passed for r in rs))"]))
    if cmd == "bench":
        sys.exit(run([sys.executable, "bench.py"]))
    if cmd == "bench-suite":
        sys.exit(run([sys.executable, "benchmarks/suite.py"]))
    if cmd == "doctest":
        sys.exit(run([sys.executable, "-m", "pytest", "tests/test_doctests.py", "-q"]))
    if cmd == "check":
        sys.exit(run([sys.executable, "-m", "compileall", "-q", "concrete_tpu"]))
    if cmd == "cov":
        try:
            import pytest_cov  # noqa: F401 — availability probe only
        except ImportError:
            print("pytest-cov is not installed in this environment; "
                  "run `python tasks.py test` for the plain suite",
                  file=sys.stderr)
            sys.exit(2)
        sys.exit(run([sys.executable, "-m", "pytest", "tests/", "-q",
                      "--cov=concrete_tpu", "--cov-report=term"]))
    print(f"unknown task {cmd}", file=sys.stderr)
    sys.exit(2)


if __name__ == "__main__":
    main()
