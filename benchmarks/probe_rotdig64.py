"""On-TPU validation probe: the i64-free u64 blind rotation
(CONCRETE_TPU_ROTDIG64=1 — pair-plane rotdig kernel + carry-explicit
accumulate, bootstrap_mxu._blind_rotate_u64_planes).

Each subcommand compiles at most ONE new Mosaic config (killed kernel-in-
scan compiles have wedged the single-tenant chip for hours) — run each
under `timeout 600`, one at a time, probing health in between
(`python benchmarks/probe_defer.py health`):

  bitid  [N] [k]   standalone pair-plane kernel compile + bit-identity vs
                   the XLA u64 rot+digits at bl=7/l=3, B=2048
                   (default N=256 k=4 — the RLWE128_256_4 co-designed shape)
  pbs    [N] [k]   full u64 PBS, plane path ON vs OFF, timed (the
                   kernel-in-scan compile — the risky one) + bit-identity
  pair   [N] [k]   XLA-only probe (no new kernel): CONCRETE_TPU_RECOMB64=pair
                   vs i64 recombine, full PBS timing + bit-identity

If pbs wins, flip the default in _rotdig64_kernel_active; if pair wins
standalone, flip CONCRETE_TPU_RECOMB64's default.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cfg(N, k, bl=7, l=3, n=630, b=2048):
    from concrete_tpu.core import bootstrap as bs
    from concrete_tpu.core import bootstrap_mxu as bsx

    cfg = bs.ServerConfig(
        lwe_dimension=n, glwe_dimension=k, polynomial_size=N,
        pbs_base_log=bl, pbs_level=l, ks_base_log=4, ks_level=3, bits=64)
    print(f"u64 shape: N={N} k={k} bl={bl} l={l} n={n} B={b} "
          f"(prefix {bl*l} bits)", flush=True)
    return cfg, bsx.MxuPlan.from_config(cfg)


def _setup(N, k, bl=7, l=3, n=630, b=2048):
    # full tensors only for the pbs/pair stages — the bitid stage must not
    # spend its timeout-600 budget on a ~100 MB BSK limb-pack it never uses
    import jax.numpy as jnp

    from concrete_tpu.core import bootstrap_mxu as bsx

    cfg, plan = _cfg(N, k, bl, l, n, b)
    rng = np.random.default_rng(0)
    bsk_raw = rng.integers(0, 1 << 64, size=(n, l, k + 1, k + 1, N),
                           dtype=np.uint64)
    bsk = jnp.asarray(bsx.bsk_to_mxu(bsk_raw, cfg))
    lut = jnp.asarray(rng.integers(0, 1 << 64, size=(k + 1, N),
                                   dtype=np.uint64))
    lwe = jnp.asarray(rng.integers(0, 1 << 64, size=(b, n + 1),
                                   dtype=np.uint64))
    return cfg, plan, bsk, lut, lwe


def _timed_pbs(cfg, bsk, lut, lwe, tag):
    import jax

    from concrete_tpu.core import bootstrap_mxu as bsx

    fn = jax.jit(lambda k_, u, w: bsx.bootstrap_mxu(cfg, k_, u, w))
    t0 = time.perf_counter()
    out = np.asarray(fn(bsk, lut, lwe)[:4, :4])
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    full = fn(bsk, lut, lwe)
    np.asarray(full[:1, :1])
    dt = time.perf_counter() - t0
    print(f"{tag}: {dt*1e3:.0f} ms -> {lwe.shape[0]/dt:.0f} PBS/s", flush=True)
    return np.asarray(full)


def stage_bitid(N, k, bl=7, l=3):
    import jax
    import jax.numpy as jnp

    from concrete_tpu.core import bootstrap_mxu as bsx
    from concrete_tpu.math import polynomial

    cfg, plan = _cfg(N, k, bl, l)
    ks1, B = plan.glwe_size, 2048
    rng = np.random.default_rng(3)
    acc = jnp.asarray(rng.integers(0, 1 << 64, (ks1, B, N), dtype=np.uint64))
    a_hat = jnp.asarray(rng.integers(0, 2 * N, (B,), dtype=np.uint64))
    rot = polynomial.negacyclic_monomial_mul(acc, a_hat[None, :])
    want = np.asarray(jax.jit(
        lambda r, a: bsx._digit_matrix(plan, r - a))(rot, acc))
    print("XLA form done", flush=True)
    planes = bsx._acc_u64_to_planes(acc)
    t0 = time.perf_counter()
    with jax.enable_x64(False):
        kern = bsx._rotdig_pallas64(ks1, N, B, plan.base_log, plan.level,
                                    plan.n_sub)
        got = np.asarray(jax.jit(kern)(planes,
                                       a_hat.astype(jnp.int32)[:, None]))
    print(f"kernel compile+run: {time.perf_counter()-t0:.1f} s", flush=True)
    assert np.array_equal(want, got), "BIT MISMATCH kernel vs XLA"
    print("bit-identity: OK", flush=True)


def stage_pbs(N, k, bl=7, l=3):
    cfg, plan, bsk, lut, lwe = _setup(N, k, bl, l)
    os.environ["CONCRETE_TPU_ROTDIG64"] = "0"
    base = _timed_pbs(cfg, bsk, lut, lwe, "plane path OFF")
    os.environ["CONCRETE_TPU_ROTDIG64"] = "1"
    got = _timed_pbs(cfg, bsk, lut, lwe, "plane path ON")
    assert np.array_equal(base, got), "BIT MISMATCH plane path vs default"
    print("bit-identity: OK", flush=True)


def stage_pair(N, k, bl=7, l=3):
    cfg, plan, bsk, lut, lwe = _setup(N, k, bl, l)
    # force the NON-plane path: with the plane path default-ON,
    # recombine_limb_planes is never reached and the i64-vs-pair comparison
    # would silently measure two identical configs
    os.environ["CONCRETE_TPU_ROTDIG64"] = "0"
    os.environ["CONCRETE_TPU_RECOMB64"] = "i64"
    base = _timed_pbs(cfg, bsk, lut, lwe, "recombine i64")
    os.environ["CONCRETE_TPU_RECOMB64"] = "pair"
    got = _timed_pbs(cfg, bsk, lut, lwe, "recombine pair")
    assert np.array_equal(base, got), "BIT MISMATCH pair recombine"
    print("bit-identity: OK", flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "bitid"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    bl = int(sys.argv[4]) if len(sys.argv) > 4 else 7
    l = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    {"bitid": stage_bitid, "pbs": stage_pbs, "pair": stage_pair}[cmd](N, k, bl, l)
