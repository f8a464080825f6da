"""Headline benchmark: gate bootstraps (PBS + keyswitch) per second per chip.

Runs the batched boolean-gate pipeline at TFHE_LIB_PARAMETERS (n=630, k=1,
N=1024 — the "N=1024 TFHE default params" of BASELINE.md) on the available
accelerator and prints ONE JSON line.

vs_baseline compares against the reference's published CPU number: 18.0 ms
per gate at TFHE_LIB_PARAMETERS (concrete-boolean/docs/user/error.md:23)
= 55.56 gates/s on a 2.6 GHz i7 core.

Key material is synthetic (key-shaped tensors) — throughput is identical to
real keys; correctness is covered by tests/.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    batch_env = os.environ.get("BENCH_BATCHES", "1024,2048,4096")
    import jax
    import jax.numpy as jnp

    from concrete_tpu.core import bootstrap as bs
    from concrete_tpu.core import bootstrap_mxu as bsx
    from concrete_tpu.params import TFHE_LIB_PARAMETERS

    cfg = bs.ServerConfig.from_boolean_parameters(TFHE_LIB_PARAMETERS)
    rng = np.random.default_rng(0)
    n, l, ks1, N = cfg.lwe_dimension, cfg.pbs_level, cfg.glwe_size, cfg.polynomial_size
    bsk_raw = rng.integers(0, 1 << 32, size=(n, l, ks1, ks1, N), dtype=np.uint32)
    bsk = jnp.asarray(bsx.bsk_to_mxu(bsk_raw, cfg))  # [n, R, k+1, 2N] rings
    ksk = jnp.asarray(
        rng.integers(0, 1 << 32, size=(cfg.big_lwe_dimension, cfg.ks_level, n + 1), dtype=np.uint32)
    )
    lut = bs.trivial_lut_constant(cfg, np.uint32(1 << 29))

    fn = jax.jit(lambda b, k, c: bsx.bootstrap_keyswitch_mxu(cfg, b, k, lut, c))

    best = 0.0
    best_batch = 0
    for batch in [int(x) for x in batch_env.split(",")]:
        lin = jnp.asarray(rng.integers(0, 1 << 32, size=(batch, n + 1), dtype=np.uint32))
        try:
            out = fn(bsk, ksk, lin)
            np.asarray(out[0, :8])  # warmup + compile; forced host pull
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(bsk, ksk, lin)
                np.asarray(out[0, :8])  # block_until_ready may lie on axon
            dt = (time.perf_counter() - t0) / reps
        except Exception as e:  # noqa: BLE001 — skip OOM batch points
            print(f"batch {batch} failed: {e}", file=sys.stderr)
            continue
        rate = batch / dt
        print(f"batch {batch}: {dt*1e3:.1f} ms -> {rate:.1f} gates/s", file=sys.stderr)
        if rate > best:
            best, best_batch = rate, batch

    # the levels-only fast mode (same key material, chained-gate error
    # ~2^-24 = the grade of the reference's DEFAULT design point; see
    # docs/performance.md "Reduced-precision modes")
    fast_rate = 0.0
    try:
        fcfg = cfg.with_fast_mode(limb_drop=0, levels=2)
        fbsk = jnp.asarray(bsx.bsk_to_mxu(bsk_raw[:, : fcfg.pbs_level], fcfg))
        ffn = jax.jit(lambda b, k, c: bsx.bootstrap_keyswitch_mxu(fcfg, b, k, lut, c))
        lin = jnp.asarray(
            rng.integers(0, 1 << 32, size=(best_batch, n + 1), dtype=np.uint32))
        np.asarray(ffn(fbsk, ksk, lin)[0, :8])
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(ffn(fbsk, ksk, lin)[0, :8])
        fast_rate = best_batch / ((time.perf_counter() - t0) / 3)
        print(f"fast mode (l=2): {fast_rate:.1f} gates/s", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"fast mode failed: {e}", file=sys.stderr)

    baseline = 1000.0 / 18.0  # reference: 18.0 ms/gate single CPU core
    print(
        json.dumps(
            {
                "metric": "gate_bootstraps_per_s_per_chip_n1024",
                "value": round(best, 2),
                "unit": "gates/s",
                "vs_baseline": round(best / baseline, 2),
                "fast_mode_gates_per_s": round(fast_rate, 2),
                "fast_mode_note": "levels=2 on the same keys; chained-gate"
                " error ~2^-24 (reference DEFAULT grade); exact mode is the"
                " headline value",
            }
        )
    )


if __name__ == "__main__":
    main()
