"""On-TPU validation probe: the fused rotation+digit kernel at n_sub == 2.

The n_sub==2 extension of `_rotdig_pallas` (sub-digit splitting for gadget
digits wider than a signed byte — DEFAULT_PARAMETERS' base_log=8 regime,
reference shape concrete-boolean/src/parameters/mod.rs:82-92) is
interpreter-validated (tests/test_bootstrap_mxu.py) but Mosaic compiles of
new kernel configs have wedged the single-tenant remote chip before, so the
path ships opt-in (CONCRETE_TPU_ROTDIG_NSUB2=1). Each subcommand runs
exactly ONE new compile so a killed invocation orphans at most one remote
compile — run each under `timeout 600`, one at a time, probing chip health
in between (`python benchmarks/probe_defer.py health`):

  bitid    standalone kernel compile + bit-identity vs the XLA rot+digits
           path at the DEFAULT gate shape (ks1=3, N=512, bl=8, l=2 -> R=12)
  timing   chained timing of kernel vs XLA stage (>= 100 ms device work —
           block_until_ready can return at enqueue, so results are pulled);
           run AFTER bitid (reuses its standalone compile, adds scan forms)
  gate     the full DEFAULT AND-gate pipeline, kernel ON (the kernel-in-scan
           compile — the risky one) vs OFF

If all three pass and the kernel wins, flip the default in
`_rotdig_kernel_active` and record the numbers in docs/performance.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup():
    import jax.numpy as jnp

    from concrete_tpu.core import bootstrap as bs
    from concrete_tpu.core import bootstrap_mxu as bsx
    from concrete_tpu.params import DEFAULT_PARAMETERS

    cfg = bs.ServerConfig.from_boolean_parameters(DEFAULT_PARAMETERS)
    plan = bsx.MxuPlan.from_config(cfg)
    assert plan.n_sub == 2, plan
    ks1, N, B = plan.glwe_size, plan.polynomial_size, 2048
    print(f"DEFAULT shape: ks1={ks1} N={N} bl={plan.base_log} l={plan.level} "
          f"n_sub={plan.n_sub} B={B}", flush=True)
    rng = np.random.default_rng(0)
    acc = jnp.asarray(rng.integers(0, 1 << 32, (ks1, B, N), dtype=np.uint32))
    a_hat = jnp.asarray(rng.integers(0, 2 * N, (B,), dtype=np.int64))
    return plan, acc, a_hat, rng


def stage_bitid():
    import jax
    import jax.numpy as jnp

    from concrete_tpu.core import bootstrap_mxu as bsx
    from concrete_tpu.math import polynomial

    plan, acc, a_hat, _ = _setup()
    ks1, N, B = plan.glwe_size, plan.polynomial_size, acc.shape[1]

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


def stage_timing():
    import jax
    import jax.numpy as jnp

    from concrete_tpu.core import bootstrap_mxu as bsx
    from concrete_tpu.math import polynomial

    plan, acc, a_hat, rng = _setup()
    ks1, N, B = plan.glwe_size, plan.polynomial_size, acc.shape[1]

    def timed(form, reps=200):
        # fresh shift per step so nothing is CSE'd; one pull per chain
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

    print(f"XLA rot+digits: {timed(xla_stage)*1e6:.1f} us/iter", flush=True)
    print(f"kernel rot+digits: {timed(kern_form)*1e6:.1f} us/iter", flush=True)


def stage_gate():
    from bench import measure_gates  # repo-root bench helpers
    from concrete_tpu.params import DEFAULT_PARAMETERS

    B = 2048
    for env, tag in (("0", "kernel OFF"), ("1", "kernel ON")):
        os.environ["CONCRETE_TPU_ROTDIG_NSUB2"] = env
        rate, b = measure_gates(DEFAULT_PARAMETERS, [B],
                                np.random.default_rng(1))
        print(f"DEFAULT gate, {tag}: {rate:.0f} gates/s (B={b})", flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "bitid"
    {"bitid": stage_bitid, "timing": stage_timing, "gate": stage_gate}[cmd]()
