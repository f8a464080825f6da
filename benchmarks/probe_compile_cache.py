"""Probe: does JAX's persistent compilation cache work through the remote
TPU platform, and does it amortize the rotdig kernel's first-compile cost?

The fused rotation+digit kernel's first compile per process and shape runs
30-550 s through the remote toolchain (docs/performance.md). If the
persistent cache can serialize/deserialize the executable, serving processes
skip that entirely. A previous cache attempt coincided with a chip wedge —
run this under `timeout 600`, one invocation at a time, and probe chip
health afterwards.

Usage:  python benchmarks/probe_compile_cache.py [cache_dir]
Run it TWICE: the first run populates, the second measures the hit.

NOTE the package itself already configures a persistent cache
(concrete_tpu/__init__.py, CONCRETE_TPU_CACHE_DIR, default .jax_cache/) —
so this probe must pin the dir via that env var BEFORE the package import,
or the package config overwrites it and the cold/warm answer measures the
wrong cache. The open question this probe answers is whether the REMOTE
platform's executables serialize at all (the rotdig kernel's 30-550 s
first compile has been observed per process with the default cache dir
populated, suggesting the Mosaic compile happens server-side at first
dispatch, outside the XLA cache).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["CONCRETE_TPU_CACHE_DIR"] = (
    sys.argv[1] if len(sys.argv) > 1 else "/tmp/concrete_tpu_cache")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from concrete_tpu.core import bootstrap as bs
    from concrete_tpu.core import bootstrap_mxu as bsx
    from concrete_tpu.params import TPU128_PARAMETERS

    print(f"cache dir: {jax.config.jax_compilation_cache_dir}", flush=True)
    cfg = bs.ServerConfig.from_boolean_parameters(TPU128_PARAMETERS)
    plan = bsx.MxuPlan.from_config(cfg)
    ks1, N, B = plan.glwe_size, plan.polynomial_size, 2048
    rng = np.random.default_rng(0)
    acc = jnp.asarray(rng.integers(0, 1 << 32, (ks1, B, N), dtype=np.uint32))
    ah = jnp.asarray(rng.integers(0, 2 * N, (B, 1)).astype(np.int32))

    # plain XLA function first: cheapest cache-works-at-all signal
    t0 = time.perf_counter()
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    np.asarray(jax.jit(lambda a: (a @ a) * 3.0)(x))[0, 0]
    print(f"xla matmul compile+run: {time.perf_counter()-t0:.2f} s", flush=True)

    t0 = time.perf_counter()
    with jax.enable_x64(False):
        fn = bsx._rotdig_pallas(ks1, N, B, plan.base_log, plan.level, 1)
        out = np.asarray(jax.jit(fn)(acc, ah))
    print(f"rotdig kernel compile+run: {time.perf_counter()-t0:.1f} s",
          flush=True)
    print("output checksum:", int(out.astype(np.int64).sum()), flush=True)


if __name__ == "__main__":
    main()
