"""On-TPU measurement of the Nussbaumer-domain bootstrap path.

Each subcommand compiles a bounded number of new shapes — run under
`timeout 600`, one at a time, probing chip health between runs
(`python benchmarks/probe_defer.py health`).

  bitid  [N] [L]        standalone external-product bit-identity vs the
                        direct MXU path on-chip (small shapes, fast)
  tfhe   [L] [B]        full TFHE_LIB-exact AND-gate pipeline through the
                        Nussbaumer path, timed vs the committed direct-MXU
                        number (docs/performance.md: 4,011 gates/s @ B=2048)
  largen [N] [B] [L]    PBS at large N (default 8192) on the Nussbaumer
                        path, timed; compare with `ntt` at the same shape
  ntt    [N] [B]        PBS at large N on the exact-NTT path (the current
                        only N>4096 path), timed — the baseline to beat
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from concrete_tpu.core import bootstrap as bs
from concrete_tpu.core import bootstrap_mxu as bsx
from concrete_tpu.core import bootstrap_nuss as bsn


def _timed(tag, fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f} s", flush=True)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{tag}: reps {[f'{t*1e3:.0f}' for t in times]} ms best "
          f"{best*1e3:.0f} ms", flush=True)
    return out, best


def stage_bitid(N=256, L=4):
    rng = np.random.default_rng(0)
    n, k, bl, lv = 4, 1, 7, 2
    cfg = bs.ServerConfig(lwe_dimension=n, glwe_dimension=k,
                          polynomial_size=N, pbs_base_log=bl, pbs_level=lv,
                          ks_base_log=4, ks_level=3)
    bsk_raw = rng.integers(0, 1 << 32, size=(n, lv, k + 1, k + 1, N),
                           dtype=np.uint32)
    rings_m = jnp.asarray(bsx.bsk_to_mxu(bsk_raw, cfg))
    rings_n = jnp.asarray(bsn.bsk_to_nuss(bsk_raw, cfg, L))
    lut = jnp.asarray(rng.integers(0, 1 << 32, (k + 1, N), dtype=np.uint32))
    lwe = jnp.asarray(rng.integers(0, 1 << 32, (64, n + 1), dtype=np.uint32))
    want, _ = _timed("mxu blind_rotate", jax.jit(
        lambda r, u, w: bsx.blind_rotate_mxu(cfg, r, u, w)),
        rings_m, lut, lwe, reps=1)
    got, _ = _timed(f"nuss blind_rotate L={L}", jax.jit(
        lambda r, u, w: bsn.blind_rotate_nuss(cfg, r, u, w, l=L)),
        rings_n, lut, lwe, reps=1)
    assert np.array_equal(np.asarray(want), np.asarray(got)), "BIT MISMATCH"
    print("bit-identity on TPU: OK", flush=True)


def stage_tfhe(L=8, B=2048):
    from concrete_tpu.params import TFHE_LIB_PARAMETERS

    rng = np.random.default_rng(0)
    cfg = bs.ServerConfig.from_boolean_parameters(TFHE_LIB_PARAMETERS)
    n, lv, ks1, N = (cfg.lwe_dimension, cfg.pbs_level, cfg.glwe_size,
                     cfg.polynomial_size)
    bsk_raw = rng.integers(0, 1 << 32, size=(n, lv, ks1, ks1, N),
                           dtype=np.uint32)
    t0 = time.perf_counter()
    rings = jnp.asarray(bsn.bsk_to_nuss(bsk_raw, cfg, L))
    print(f"bsk_to_nuss: {time.perf_counter()-t0:.1f} s, rings "
          f"{rings.nbytes/1e6:.0f} MB", flush=True)
    from concrete_tpu.core import lwe as lwe_ops

    ksk_raw = rng.integers(0, 1 << 32,
                           size=(cfg.big_lwe_dimension, cfg.ks_level, n + 1),
                           dtype=np.uint32)
    ksk = jnp.asarray(lwe_ops.ksk_to_limbs(ksk_raw))
    lut = bs.trivial_lut_constant(cfg, np.uint32(1 << 29))
    neg_eighth = np.uint32((-(1 << 29)) % (1 << 32))

    @jax.jit
    def gate(r, k_, ca, cb):
        lin = (ca + cb).at[..., -1].add(neg_eighth)
        return bsn.bootstrap_keyswitch_nuss(cfg, r, k_, lut, lin, l=L)

    ca = jnp.asarray(rng.integers(0, 1 << 32, (B, n + 1), dtype=np.uint32))
    cb = jnp.asarray(rng.integers(0, 1 << 32, (B, n + 1), dtype=np.uint32))
    _, best = _timed(f"nuss TFHE_LIB gate L={L} B={B}", gate, rings, ksk,
                     ca, cb)
    print(f"-> {B/best:.0f} gates/s (direct-MXU committed: 4,011)",
          flush=True)


def _largen_cfg(N):
    # reference-benchmark-shaped large-N point (concrete-benchmark
    # generics/lwe_ciphertext_discarding_bootstrap.rs:83-120 extends its
    # sweep shape n=100, k=1, l=3, bl=2 to N in {256..4096}; we push to 8192+)
    return bs.ServerConfig(lwe_dimension=100, glwe_dimension=1,
                           polynomial_size=N, pbs_base_log=2, pbs_level=3,
                           ks_base_log=2, ks_level=5)


def stage_largen(N=8192, B=256, L=None):
    rng = np.random.default_rng(0)
    cfg = _largen_cfg(N)
    plan = bsn.NussPlan.from_config(cfg, L)
    print(f"N={N} L={plan.l} M={plan.m} n_sub'={plan.n_sub} "
          f"w'={plan.w_prime}", flush=True)
    n, lv, ks1 = cfg.lwe_dimension, cfg.pbs_level, cfg.glwe_size
    bsk_raw = rng.integers(0, 1 << 32, size=(n, lv, ks1, ks1, N),
                           dtype=np.uint32)
    t0 = time.perf_counter()
    rings = jnp.asarray(bsn.bsk_to_nuss(bsk_raw, cfg, plan.l))
    print(f"bsk_to_nuss: {time.perf_counter()-t0:.1f} s, rings "
          f"{rings.nbytes/1e6:.0f} MB", flush=True)
    lut = jnp.asarray(rng.integers(0, 1 << 32, (ks1, N), dtype=np.uint32))
    lwe = jnp.asarray(rng.integers(0, 1 << 32, (B, n + 1), dtype=np.uint32))
    _, best = _timed(f"nuss PBS N={N} B={B}", jax.jit(
        lambda r, u, w: bsn.bootstrap_nuss(cfg, r, u, w, l=plan.l)),
        rings, lut, lwe)
    print(f"-> {B/best:.0f} PBS/s", flush=True)


def stage_ntt(N=8192, B=256):
    from concrete_tpu.core.ggsw import bsk_to_ntt

    rng = np.random.default_rng(0)
    cfg = _largen_cfg(N)
    n, lv, ks1 = cfg.lwe_dimension, cfg.pbs_level, cfg.glwe_size
    bsk_raw = rng.integers(0, 1 << 32, size=(n, lv, ks1, ks1, N),
                           dtype=np.uint32)
    bsk = bsk_to_ntt(bsk_raw, cfg.primes, 32)
    print(f"bsk_ntt: {np.prod(bsk.shape)*4/1e6:.0f} MB, primes "
          f"{cfg.primes}", flush=True)
    lut = jnp.asarray(rng.integers(0, 1 << 32, (ks1, N), dtype=np.uint32))
    lwe = jnp.asarray(rng.integers(0, 1 << 32, (B, n + 1), dtype=np.uint32))
    _, best = _timed(f"ntt PBS N={N} B={B}", jax.jit(
        lambda r, u, w: bs.bootstrap(cfg, r, u, w)),
        rings_placeholder := bsk, lut, lwe)
    print(f"-> {B/best:.0f} PBS/s", flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "bitid"
    args = [int(a) for a in sys.argv[2:]]
    {"bitid": stage_bitid, "tfhe": stage_tfhe,
     "largen": stage_largen, "ntt": stage_ntt}[cmd](*args)
