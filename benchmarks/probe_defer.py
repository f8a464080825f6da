"""Bounded probes for the deferred-recombine compile hang (TODO round-4).

The `_rotdig_recombine_pallas` kernel is bit-identical standalone (7 s
compile at B=512/grid=1) but the FULL-PIPELINE compile (kernel inside the
630-step lax.scan) hangs the remote toolchain (>28 min at B=64 and B=2048).
Each subcommand here runs exactly ONE candidate composition so the failing
ingredient can be isolated without sweep scripts (a killed sweep leaves
orphaned compiles that wedge the single-tenant chip serially — run each
invocation under `timeout 600`, probe chip health between runs).

Subcommands (args: [steps] [batch], defaults 8 / 512):
  health            trivial matmul round-trip (chip wedge check)
  grid   [batch]    standalone kernel, batch>512 forces grid=B/512
  scan   [n] [B]    kernel + dot + build in an n-step scan (the real body)
  nodot  [n] [B]    kernel in an n-step scan, dot replaced by a cheap cast
  barrier [n] [B]   full body + lax.optimization_barrier on the carry
  xla    [n] [B]    the production (non-deferred) body, for compile-time
                    comparison at the same scan length
  pipe3  [n] [B]    CONCRETE_TPU_DEFER=3 (dot-first pairing: S consumed by
                    the SAME iteration's kernel, carry = (acc, d8) — no S
                    across the scan boundary), bit-identity-checked.
                    ROUND-5 RESOLUTION: this form compiles clean everywhere
                    (the DEFER=1/2 S-carry compositions hung the toolchain
                    and were removed); it wins iff S > ~100 MB/CMux — the
                    production "auto" rule in blind_rotate_mxu.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from concrete_tpu.params import TPU128_PARAMETERS
from concrete_tpu.core import bootstrap_mxu as bsx


def _cfg(steps):
    """Probe config: TPU128 shape by default; set
    CONCRETE_TPU_PROBE_PARAMS=tfhe_lib|default for the reference presets."""
    sel = os.environ.get("CONCRETE_TPU_PROBE_PARAMS", "tpu128")
    if sel == "tfhe_lib":
        from concrete_tpu.params import TFHE_LIB_PARAMETERS as p
    elif sel == "default":
        from concrete_tpu.params import DEFAULT_PARAMETERS as p
    else:
        p = TPU128_PARAMETERS
    from concrete_tpu.core.bootstrap import ServerConfig

    return ServerConfig(
        lwe_dimension=steps,
        glwe_dimension=p.glwe_dimension,
        polynomial_size=p.polynomial_size,
        pbs_base_log=p.pbs_base_log,
        pbs_level=p.pbs_level,
        ks_base_log=p.ks_base_log,
        ks_level=p.ks_level,
        bits=32,
    )


def _tensors(cfg, b):
    rng = np.random.default_rng(0)
    n, l, ks1, N = (cfg.lwe_dimension, cfg.pbs_level, cfg.glwe_size,
                    cfg.polynomial_size)
    bsk_raw = rng.integers(0, 1 << 32, size=(n, l, ks1, ks1, N),
                           dtype=np.uint32)
    bsk = jnp.asarray(bsx.bsk_to_mxu(bsk_raw, cfg))
    lut = jnp.asarray(rng.integers(0, 1 << 32, size=(ks1, N),
                                   dtype=np.uint32))
    lwe = jnp.asarray(rng.integers(0, 1 << 32, size=(b, n + 1),
                                   dtype=np.uint32))
    return bsk, lut, lwe


def _timed(tag, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[..., :1])  # force full round trip (enqueue-lying BUR)
    t1 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
    t2 = time.perf_counter()
    print(f"{tag}: first(compile) {t1 - t0:.1f}s  steady {t2 - t1:.3f}s",
          flush=True)
    return out


def _scan_body(cfg, variant):
    """Build a jitted scan over the deferred body variant."""
    plan = bsx.MxuPlan.from_config(cfg)
    N, ks1 = plan.polynomial_size, plan.glwe_size

    def run(bsk, lut, lwe):
        b = lwe.shape[0]
        b_hat = bsx.pbs_modulus_switch(lwe[..., -1], N, 0, 0)
        a_hats = jnp.moveaxis(
            bsx.pbs_modulus_switch(lwe[..., :-1], N, 0, 0), -1, 0)
        from concrete_tpu.math import polynomial

        acc = jnp.moveaxis(jnp.broadcast_to(lut[None], (b, ks1, N)), 1, 0)
        acc = polynomial.negacyclic_monomial_div(acc, b_hat[None, :])
        with jax.enable_x64(False):
            kern = bsx._rotdig_recombine_pallas(
                ks1, N, b, plan.base_log, plan.level,
                plan.limbs_used, plan.limb_drop, plan.n_sub)

        def step(carry, xs):
            acc_c, s_prev = carry
            rings_i, a_hat = xs
            with jax.enable_x64(False):
                acc_new, d8 = kern(
                    s_prev, acc_c, a_hat.astype(jnp.int32)[:, None])
            if variant == "nodot":
                # cheap stand-in with the same carry shape/dtype as the dot
                cols = ks1 * plan.limbs_used * N
                reps = -(-cols // d8.shape[1])
                s_new = jnp.tile(d8.astype(jnp.int32), (1, reps))[:, :cols]
            else:
                rhs = bsx.build_tables(rings_i, N, plan.n_words,
                                       plan.limb_drop)
                s_new = jax.lax.dot_general(
                    d8, rhs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            carry_out = (acc_new, s_new)
            if variant == "barrier":
                carry_out = jax.lax.optimization_barrier(carry_out)
            return carry_out, None

        s0 = jnp.zeros((b, ks1 * plan.limbs_used * N), jnp.int32)
        (acc, s_last), _ = jax.lax.scan(step, (acc, s0), (bsk, a_hats))
        return acc + bsx.recombine_limb_planes(plan, s_last)

    return jax.jit(run)


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "health"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    if cmd == "health":
        x = jnp.ones((1024, 1024), jnp.bfloat16)
        _timed("health matmul", jax.jit(lambda a: a @ a), x)
        return

    if cmd == "grid":
        b = steps if len(sys.argv) > 2 else 2048  # arg2 is batch here
        cfg = _cfg(4)
        plan = bsx.MxuPlan.from_config(cfg)
        ks1, N = plan.glwe_size, plan.polynomial_size
        rng = np.random.default_rng(0)
        with jax.enable_x64(False):
            kern = bsx._rotdig_recombine_pallas(
                ks1, N, b, plan.base_log, plan.level,
                plan.limbs_used, plan.limb_drop, plan.n_sub)
            s = jnp.asarray(rng.integers(
                -(1 << 20), 1 << 20,
                size=(b, ks1 * plan.limbs_used * N)).astype(np.int32))
            acc = jnp.asarray(rng.integers(
                0, 1 << 32, size=(ks1, b, N), dtype=np.uint32))
            ah = jnp.asarray(rng.integers(
                0, 2 * N, size=(b, 1)).astype(np.int32))
            _timed(f"grid standalone B={b} (grid={max(1, b // 512)})",
                   jax.jit(kern), s, acc, ah)
        return

    if cmd == "pipe3":
        import os

        cfg = _cfg(steps)
        bsk, lut, lwe = _tensors(cfg, b)
        mode = "3"
        os.environ["CONCRETE_TPU_DEFER"] = mode
        fn = jax.jit(lambda k, u, w: bsx.blind_rotate_mxu(cfg, k, u, w))
        got = _timed(f"{cmd} (DEFER={mode}) n={steps} B={b}", fn, bsk, lut, lwe)
        os.environ["CONCRETE_TPU_DEFER"] = "0"
        want = np.asarray(
            jax.jit(lambda k, u, w: bsx.blind_rotate_mxu(cfg, k, u, w))(
                bsk, lut, lwe))
        print("bit-identical:", bool((want == np.asarray(got)).all()),
              flush=True)
        return

    cfg = _cfg(steps)
    bsk, lut, lwe = _tensors(cfg, b)
    if cmd == "xla":
        fn = jax.jit(lambda k, u, w: bsx.blind_rotate_mxu(cfg, k, u, w))
        _timed(f"xla-default scan n={steps} B={b}", fn, bsk, lut, lwe)
        return

    assert cmd in ("scan", "nodot", "barrier"), cmd
    fn = _scan_body(cfg, cmd)
    _timed(f"defer[{cmd}] scan n={steps} B={b}", fn, bsk, lut, lwe)
    if cmd in ("scan", "barrier"):
        # bit-identity vs the production path at this shape
        import os

        os.environ["CONCRETE_TPU_DEFER"] = "0"
        want = np.asarray(
            jax.jit(lambda k, u, w: bsx.blind_rotate_mxu(cfg, k, u, w))(
                bsk, lut, lwe))
        got = np.moveaxis(np.asarray(fn(bsk, lut, lwe)), 0, 1)
        print("bit-identical:", bool((want == got).all()), flush=True)


if __name__ == "__main__":
    main()
