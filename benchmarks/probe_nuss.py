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


def stage_breakdown(N=8192, B=256, L=None):
    """Per-stage steady-state timing of one CMux iteration's components,
    each as its own jitted dispatch (no cross-stage overlap — identifies
    the dominant stage, sums can exceed the fused pipeline time)."""
    rng = np.random.default_rng(0)
    cfg = _largen_cfg(N)
    plan = bsn.NussPlan.from_config(cfg, L)
    L = plan.l
    ks1, m = plan.glwe_size, plan.m
    print(f"N={N} L={L} M={m} n_sub'={plan.n_sub} w'={plan.w_prime} "
          f"lu={plan.limbs_used} R'={plan.row_blocks}", flush=True)
    bsk_raw = rng.integers(0, 1 << 32, size=(1, cfg.pbs_level, ks1, ks1, N),
                           dtype=np.uint32)
    rings1 = jnp.asarray(bsn.bsk_to_nuss(bsk_raw, cfg, L)[0])
    acc = jnp.asarray(rng.integers(0, 1 << 32, (ks1, B, L, m),
                                   dtype=np.uint32))
    ah = jnp.asarray(rng.integers(0, 2 * N, (B,)).astype(np.int32))
    s = jnp.asarray(rng.integers(-(1 << 24), 1 << 24,
                                 (plan.two_l, B, ks1 * plan.limbs_used * m),
                                 dtype=np.int32))
    from concrete_tpu.math import nussbaumer as nb

    def dig(a):
        return bsn._digit_matrix_nuss(plan, a)

    d8c = jax.jit(dig)(acc)

    def dot(d8, rings_i):
        rhs = bsx.build_tables(rings_i, plan.m, plan.n_words, 0,
                               plan.limb_hi_drop)
        rhs = rhs.reshape(plan.two_l, plan.row_blocks * plan.m, -1)
        return jax.lax.dot_general(
            d8, rhs, (((2,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.int32)

    stages = [
        ("rotate", jax.jit(lambda a, d: nb.monomial_mul_chunked(a, d[None, :], L)),
         (acc, ah)),
        ("digits+fwd", jax.jit(dig), (acc,)),
        ("tables+dot", jax.jit(dot), (d8c, rings1)),
        ("recombine+inv", jax.jit(lambda x: bsn._recombine_nuss(plan, x)), (s,)),
    ]
    for tag, fn, args in stages:
        _timed(tag, fn, *args, reps=5)


def stage_ablate(N=8192, B=256, L=None, iters=100):
    """Subtractive attribution: run the full CMux scan with one stage
    ablated at a time (the single-dispatch RTT floor ~28 ms on this tunnel
    swamps per-stage timings — this measures each stage's marginal cost
    inside the real 100-iteration scan, overlap included)."""
    rng = np.random.default_rng(0)
    cfg = _largen_cfg(N)
    plan = bsn.NussPlan.from_config(cfg, L)
    L = plan.l
    ks1, m = plan.glwe_size, plan.m
    print(f"N={N} L={L} M={m} n_sub'={plan.n_sub} w'={plan.w_prime} "
          f"lu={plan.limbs_used} R'={plan.row_blocks}", flush=True)
    bsk_raw = rng.integers(0, 1 << 32,
                           size=(iters, cfg.pbs_level, ks1, ks1, N),
                           dtype=np.uint32)
    rings = jnp.asarray(bsn.bsk_to_nuss(bsk_raw, cfg, L))
    acc0 = jnp.asarray(rng.integers(0, 1 << 32, (ks1, B, L, m),
                                    dtype=np.uint32))
    ahs = jnp.asarray(rng.integers(0, 2 * N, (iters, B)).astype(np.int32))
    from concrete_tpu.math import nussbaumer as nb

    def mk(ablate):
        def step(acc, xs):
            rings_i, a_hat = xs
            rot = (acc if ablate == "rotate" else
                   nb.monomial_mul_chunked(acc, a_hat[None, :], L))
            diff = rot - acc
            if ablate == "digits":
                d8 = jnp.broadcast_to(
                    diff[0, :, :1, :1].astype(jnp.int8),
                    (B, plan.two_l, plan.row_blocks * m))
            else:
                d8 = bsn._digit_matrix_nuss(plan, diff)
            if ablate == "dot":
                s_ = jnp.broadcast_to(
                    d8[:1, :, :1].astype(jnp.int32).transpose(1, 0, 2),
                    (plan.two_l, B, ks1 * plan.limbs_used * m))
            else:
                rhs = bsx.build_tables(rings_i, m, plan.n_words, 0,
                                       plan.limb_hi_drop)
                rhs = rhs.reshape(plan.two_l, plan.row_blocks * m, -1)
                s_ = jax.lax.dot_general(
                    d8, rhs, (((2,), (1,)), ((1,), (0,))),
                    preferred_element_type=jnp.int32)
            if ablate == "recombine":
                upd = s_[:, :, :1].sum(axis=0).astype(jnp.uint32)[
                    None, :, None, :] * jnp.ones((ks1, 1, L, m), jnp.uint32)
                upd = upd[..., :m]
            else:
                upd = bsn._recombine_nuss(plan, s_)
            return acc + upd, None

        def run(a0, rings_, ahs_):
            out, _ = jax.lax.scan(step, a0, (rings_, ahs_))
            return out

        return jax.jit(run)

    _, full = _timed("full", mk(None), acc0, rings, ahs, reps=3)
    for ab in ("rotate", "digits", "dot", "recombine"):
        _, t = _timed(f"minus-{ab}", mk(ab), acc0, rings, ahs, reps=3)
        print(f"  -> {ab} marginal {1e3*(full-t):.0f} ms of "
              f"{1e3*full:.0f}", flush=True)


def stage_bitid64(N=2048, L=8, B=16):
    """u64-TORUS Nussbaumer blind rotation on TPU: bit-identity vs the
    direct u64 mxu path — exercises the n_words=3 table-build kernel
    on-chip (an early M=64 shape hit a Mosaic concat-layout bug; production
    M >= 128 is what this validates)."""
    rng = np.random.default_rng(0)
    n, k, bl, lv = 3, 1, 7, 2
    cfg = bs.ServerConfig(lwe_dimension=n, glwe_dimension=k,
                          polynomial_size=N, pbs_base_log=bl, pbs_level=lv,
                          ks_base_log=4, ks_level=3, bits=64)
    bsk_raw = rng.integers(0, 1 << 64, size=(n, lv, k + 1, k + 1, N),
                           dtype=np.uint64)
    rings_m = jnp.asarray(bsx.bsk_to_mxu(bsk_raw, cfg))
    rings_n = jnp.asarray(bsn.bsk_to_nuss(bsk_raw, cfg, L))
    lut = jnp.asarray(rng.integers(0, 1 << 64, (k + 1, N), dtype=np.uint64))
    lwe = jnp.asarray(rng.integers(0, 1 << 64, (B, n + 1), dtype=np.uint64))
    want, _ = _timed("mxu u64 blind_rotate", jax.jit(
        lambda r, u, w: bsx.blind_rotate_mxu(cfg, r, u, w)),
        rings_m, lut, lwe, reps=1)
    got, _ = _timed(f"nuss u64 blind_rotate L={L}", jax.jit(
        lambda r, u, w: bsn.blind_rotate_nuss(cfg, r, u, w, l=L)),
        rings_n, lut, lwe, reps=1)
    assert np.array_equal(np.asarray(want), np.asarray(got)), "BIT MISMATCH"
    print("u64 bit-identity on TPU: OK", flush=True)


def stage_largen64(N=8192, B=128, L=None):
    """u64-torus PBS at large N on the Nussbaumer path (the highlevel
    regime, Torus=u64 per concrete/src/lib.rs:22), timed."""
    rng = np.random.default_rng(0)
    cfg = bs.ServerConfig(lwe_dimension=100, glwe_dimension=1,
                          polynomial_size=N, pbs_base_log=2, pbs_level=3,
                          ks_base_log=2, ks_level=5, bits=64)
    plan = bsn.NussPlan.from_config(cfg, L)
    print(f"u64 N={N} L={plan.l} M={plan.m} n_sub'={plan.n_sub} "
          f"w'={plan.w_prime} lu={plan.limbs_used}", flush=True)
    n, ks1 = cfg.lwe_dimension, cfg.glwe_size
    bsk_raw = rng.integers(0, 1 << 64, size=(n, cfg.pbs_level, ks1, ks1, N),
                           dtype=np.uint64)
    t0 = time.perf_counter()
    rings = jnp.asarray(bsn.bsk_to_nuss(bsk_raw, cfg, plan.l))
    print(f"bsk_to_nuss: {time.perf_counter()-t0:.1f} s, rings "
          f"{rings.nbytes/1e6:.0f} MB", flush=True)
    lut = jnp.asarray(rng.integers(0, 1 << 64, (ks1, N), dtype=np.uint64))
    lwe = jnp.asarray(rng.integers(0, 1 << 64, (B, n + 1), dtype=np.uint64))
    _, best = _timed(f"nuss u64 PBS N={N} B={B}", jax.jit(
        lambda r, u, w: bsn.bootstrap_nuss(cfg, r, u, w, l=plan.l)),
        rings, lut, lwe)
    print(f"-> {B/best:.0f} PBS/s", flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "bitid"
    args = [int(a) for a in sys.argv[2:]]
    {"bitid": stage_bitid, "tfhe": stage_tfhe, "largen": stage_largen,
     "ntt": stage_ntt, "breakdown": stage_breakdown,
     "ablate": stage_ablate, "bitid64": stage_bitid64,
     "largen64": stage_largen64}[cmd](*args)
