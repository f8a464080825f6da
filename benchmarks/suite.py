"""Per-operation benchmark suite — the criterion-harness analog.

Mirrors concrete-benchmark/src/generics/: every engine-level operation timed
over a parameter grid, batched (the TPU unit of work is a ciphertext batch,
not a single ciphertext). Emits one JSON line per (op, params, batch) to
stdout; human-readable table to stderr.

Usage: python benchmarks/suite.py [--ops op1,op2] [--batch 1024] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, reps=3):
    """block_until_ready can return at enqueue time on remote platforms;
    force completion with a tiny host pull per call."""

    def pull(out):
        leaf = out[0] if isinstance(out, (tuple, list)) else out
        np.asarray(leaf.ravel()[:1])  # slice device-side, pull 4 bytes

    pull(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        pull(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default="")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from concrete_tpu.core import bootstrap as bs
    from concrete_tpu.core import bootstrap_mxu as bsx
    from concrete_tpu.core import lwe as lwe_ops
    from concrete_tpu.math import ntt
    from concrete_tpu.params import DEFAULT_PARAMETERS, TFHE_LIB_PARAMETERS

    rng = np.random.default_rng(0)
    B = args.batch
    results = []

    def record(op, params_name, dt, unit_count):
        rec = {
            "op": op,
            "params": params_name,
            "batch": B,
            "ms": round(dt * 1e3, 3),
            "per_s": round(unit_count / dt, 1),
        }
        results.append(rec)
        print(json.dumps(rec))
        print(f"{op:40s} {params_name:12s} {dt*1e3:10.2f} ms {unit_count/dt:14.1f}/s", file=sys.stderr)

    param_sets = {"default": DEFAULT_PARAMETERS, "tfhe_lib": TFHE_LIB_PARAMETERS}
    if args.quick:
        param_sets = {"default": DEFAULT_PARAMETERS}
    want = set(args.ops.split(",")) if args.ops else None

    for pname, params in param_sets.items():
        cfg = bs.ServerConfig.from_boolean_parameters(params)
        n, N = cfg.lwe_dimension, cfg.polynomial_size
        l, ks1 = cfg.pbs_level, cfg.glwe_size
        bsk = jnp.asarray(np.stack(
            [rng.integers(0, p, size=(n, l, ks1, ks1, N), dtype=np.uint32) for p in cfg.primes],
            axis=1))
        ksk = jnp.asarray(rng.integers(
            0, 1 << 32, size=(cfg.big_lwe_dimension, cfg.ks_level, n + 1), dtype=np.uint32))
        cts = jnp.asarray(rng.integers(0, 1 << 32, size=(B, n + 1), dtype=np.uint32))
        big = jnp.asarray(rng.integers(0, 1 << 32, size=(B, cfg.big_lwe_dimension + 1), dtype=np.uint32))
        glwe = jnp.asarray(rng.integers(0, 1 << 32, size=(B, ks1, N), dtype=np.uint32))
        lut = bs.trivial_lut_constant(cfg, np.uint32(1 << 29))

        def run(op, fn, *a, unit=B):
            if want and op not in want:
                return
            record(op, pname, _timeit(jax.jit(fn), *a), unit)

        run("lwe_add", lambda a, b: a + b, cts, cts)
        run("lwe_neg", lambda a: jnp.zeros_like(a) - a, cts)
        run("lwe_scalar_mul", lambda a: a * np.uint32(3), cts)
        run(
            "keyswitch",
            lambda k, c: lwe_ops.keyswitch(k, c, base_log=cfg.ks_base_log, level_count=cfg.ks_level),
            ksk, big,
        )
        run(
            "external_product",
            lambda bk, g: bs.external_product(cfg, bk[0], g),
            bsk, glwe,
        )
        run("sample_extract", bs.sample_extract, glwe)
        run(
            "ntt_forward",
            lambda x: ntt.forward(cfg.plan(cfg.primes[0]), x % np.uint32(cfg.primes[0])),
            glwe,
        )
        run(
            "pbs",
            lambda bk, c: bs.bootstrap(cfg, bk, lut, c),
            bsk, cts,
        )
        run(
            "gate_bootstrap (pbs+ks)",
            lambda bk, k, c: bs.bootstrap_keyswitch(cfg, bk, k, lut, c),
            bsk, ksk, cts,
        )

        # MXU toeplitz backend (the production path on TPU)
        bsk_raw = rng.integers(0, 1 << 32, size=(n, l, ks1, ks1, N), dtype=np.uint32)
        rings = jnp.asarray(bsx.bsk_to_mxu(bsk_raw, cfg))
        run(
            "external_product_mxu",
            lambda r, g: bsx.external_product_mxu(cfg, r, g),
            rings[0], glwe,
        )
        run(
            "pbs_mxu",
            lambda r, c: bsx.bootstrap_mxu(cfg, r, lut, c),
            rings, cts,
        )
        run(
            "gate_bootstrap_mxu (pbs+ks)",
            lambda r, k, c: bsx.bootstrap_keyswitch_mxu(cfg, r, k, lut, c),
            rings, ksk, cts,
        )



    # PBS sweep over polynomial sizes — the reference's engine-bench grid
    # (concrete-benchmark/src/generics/lwe_ciphertext_discarding_bootstrap.rs:
    #  n=100, B=2^2, l=3, N in {256..4096})
    if not want or "pbs_sweep" in want:
        from concrete_tpu.core import bootstrap_mxu as bsx2

        for N in ([512, 1024] if args.quick else [256, 512, 1024, 2048]):
            cfg = bs.ServerConfig(
                lwe_dimension=100, glwe_dimension=1, polynomial_size=N,
                pbs_base_log=2, pbs_level=3, ks_base_log=2, ks_level=5)
            bsk_raw = rng.integers(0, 1 << 32, size=(100, 3, 2, 2, N), dtype=np.uint32)
            rings = jnp.asarray(bsx2.bsk_to_mxu(bsk_raw, cfg))
            lut = bs.trivial_lut_constant(cfg, np.uint32(1 << 29))
            cts = jnp.asarray(rng.integers(0, 1 << 32, size=(B, 101), dtype=np.uint32))
            f = jax.jit(lambda r, c, cfg=cfg, lut=lut: bsx2.bootstrap_mxu(cfg, r, lut, c))
            record(f"pbs_sweep_N{N}", "n100_b4_l3", _timeit(f, rings, cts), B)

    # host-side CSPRNG throughput (native AES-CTR when available);
    # parameter-independent, so measured once
    if not want or "csprng" in want:
        from concrete_tpu.csprng import aes as aes_mod

        rk = aes_mod.key_schedule(bytes(range(16)))
        nbytes = 1 << 24
        aes_mod.ctr_fill(rk, 0, 1024)  # warm
        t0 = time.perf_counter()
        aes_mod.ctr_fill(rk, 7, nbytes // 16)
        dt = time.perf_counter() - t0
        record("csprng_ctr_fill", "-", dt, nbytes)

    return results


if __name__ == "__main__":
    main()
