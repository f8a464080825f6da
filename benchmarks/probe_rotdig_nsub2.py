"""On-TPU validation probe: the fused rotation+digit kernel at n_sub == 2.

The n_sub==2 extension of `_rotdig_pallas` (sub-digit splitting for gadget
digits wider than a signed byte — DEFAULT_PARAMETERS' base_log=8 regime,
reference shape concrete-boolean/src/parameters/mod.rs:82-92) is
interpreter-validated (tests/test_bootstrap_mxu.py) but Mosaic compiles of
new kernel configs have wedged the single-tenant remote chip before, so the
path ships opt-in (CONCRETE_TPU_ROTDIG_NSUB2=1). This probe validates it on
hardware in bounded stages — run under `timeout 600`:

  1. standalone kernel compile + bit-identity vs the XLA rot+digits path
     at the DEFAULT gate shape (ks1=3, N=512, bl=8, l=2 -> R=12);
  2. chained timing of both forms (>= 100 ms device work — this platform's
     block_until_ready can return at enqueue, so the result is pulled);
  3. the full DEFAULT AND-gate pipeline with the kernel on vs off.

If all three pass, flip the default in `_rotdig_kernel_active` and record
the numbers in docs/performance.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from concrete_tpu.core import bootstrap as bs
    from concrete_tpu.core import bootstrap_mxu as bsx
    from concrete_tpu.math import polynomial
    from concrete_tpu.params import DEFAULT_PARAMETERS

    cfg = bs.ServerConfig.from_boolean_parameters(DEFAULT_PARAMETERS)
    plan = bsx.MxuPlan.for_config(cfg)
    assert plan.n_sub == 2, plan
    ks1, N, B = plan.glwe_size, plan.polynomial_size, 2048
    print(f"DEFAULT shape: ks1={ks1} N={N} bl={plan.base_log} l={plan.level} "
          f"n_sub={plan.n_sub} B={B}", flush=True)

    rng = np.random.default_rng(0)
    acc = jnp.asarray(rng.integers(0, 1 << 32, (ks1, B, N), dtype=np.uint32))
    a_hat = jnp.asarray(rng.integers(0, 2 * N, (B,), dtype=np.int64))

    # --- stage 1: kernel compile + bit-identity ---
    @jax.jit
    def xla_form(acc, a_hat):
        rot = polynomial.negacyclic_monomial_mul(acc, a_hat[None, :])
        return bsx._digit_matrix(plan, rot - acc)

    ref = np.asarray(xla_form(acc, a_hat))
    print("XLA form done", flush=True)

    t0 = time.perf_counter()
    with jax.enable_x64(False):
        fn = bsx._rotdig_pallas(ks1, N, B, plan.base_log, plan.level,
                                plan.n_sub)
        got = np.asarray(jax.jit(fn)(acc, a_hat.astype(jnp.int32)[:, None]))
    print(f"kernel compile+run: {time.perf_counter()-t0:.1f} s", flush=True)
    assert np.array_equal(ref, got), "BIT MISMATCH kernel vs XLA"
    print("bit-identity: OK", flush=True)

    # --- stage 2: chained timing (scan over fresh a_hat values so nothing
    # can be CSE'd; >= 100 ms of device work per pull) ---
    def timed(form, reps=200):
        shifts = jnp.asarray(
            rng.integers(0, 2 * N, (reps, B), dtype=np.int64))

        @jax.jit
        def chain(acc, shifts):
            def step(c, ah):
                d = form(acc, ah)
                return c + d[:, :1].astype(jnp.int32), None
            out, _ = jax.lax.scan(step, jnp.zeros((B, 1), jnp.int32), shifts)
            return out

        np.asarray(chain(acc, shifts))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(chain(acc, shifts))
        return (time.perf_counter() - t0) / reps

    def kern_form(acc, ah):
        with jax.enable_x64(False):
            f = bsx._rotdig_pallas(ks1, N, B, plan.base_log, plan.level,
                                   plan.n_sub)
            return f(acc, ah.astype(jnp.int32)[:, None])

    def xla_stage(acc, ah):
        rot = polynomial.negacyclic_monomial_mul(acc, ah[None, :])
        return bsx._digit_matrix(plan, rot - acc)

    t_x = timed(xla_stage)
    print(f"XLA rot+digits: {t_x*1e6:.1f} us/iter", flush=True)
    t_k = timed(kern_form)
    print(f"kernel rot+digits: {t_k*1e6:.1f} us/iter", flush=True)

    # --- stage 3: full gate pipeline on vs off ---
    from bench import measure_gates  # repo-root bench helpers
    for env, tag in (("0", "kernel OFF"), ("1", "kernel ON")):
        os.environ["CONCRETE_TPU_ROTDIG_NSUB2"] = env
        rate, b = measure_gates(DEFAULT_PARAMETERS, [B], np.random.default_rng(1))
        print(f"DEFAULT gate, {tag}: {rate:.0f} gates/s (B={b})", flush=True)


if __name__ == "__main__":
    main()
