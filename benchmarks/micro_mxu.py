"""Microbenchmarks: what does this chip actually deliver?

- int8 matmul (MXU) TOPS at various K
- bf16 matmul TFLOPs
- u32 montgomery multiply (VPU) Gops
- current stacked NTT forward throughput

All loops are chained (output feeds next input) inside one jit so the
runtime cannot overlap or cache the repetitions.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20


def timeit_chained(step, init):
    """step: x -> x (same shape/dtype). Returns seconds per step."""

    @jax.jit
    def run(x):
        def body(x, _):
            return step(x), None

        out, _ = jax.lax.scan(body, x, None, length=REPS)
        return out

    out = run(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(init)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS


def main():
    rng = np.random.default_rng(0)

    # --- int8 matmul: [M, K] x [K, N] -> i32, chained via cast+slice
    for (m, k, n) in [(4096, 4096, 4096), (4096, 32, 4096), (8192, 64, 8192),
                      (4096, 128, 4096), (4096, 1024, 4096)]:
        b = jnp.asarray(rng.integers(-128, 127, size=(k, n), dtype=np.int8))

        def step(a, b=b, k=k):
            o = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return o[:, :k].astype(jnp.int8)

        a0 = jnp.asarray(rng.integers(-128, 127, size=(m, k), dtype=np.int8))
        dt = timeit_chained(step, a0)
        print(f"i8 matmul {m}x{k}x{n}: {dt*1e3:.3f} ms -> {2*m*k*n/dt/1e12:.1f} TOPS")

    # --- bf16 matmul
    for (m, k, n) in [(4096, 4096, 4096), (4096, 32, 4096), (4096, 128, 4096)]:
        b = jnp.asarray(rng.standard_normal((k, n)), dtype=jnp.bfloat16)

        def step(a, b=b, k=k):
            o = jnp.dot(a, b, preferred_element_type=jnp.float32)
            return o[:, :k].astype(jnp.bfloat16)

        a0 = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.bfloat16)
        dt = timeit_chained(step, a0)
        print(f"bf16 matmul {m}x{k}x{n}: {dt*1e3:.3f} ms -> {2*m*k*n/dt/1e12:.1f} TFLOPS")

    # --- u32 montmul VPU
    from concrete_tpu.math.mod_arith import MontgomeryContext
    ctx = MontgomeryContext.new(2013265921)
    y = jnp.asarray(rng.integers(0, 2013265921, size=(4096, 4096), dtype=np.uint32))
    x0 = jnp.asarray(rng.integers(0, 2013265921, size=(4096, 4096), dtype=np.uint32))
    dt = timeit_chained(lambda x: ctx.mont_mul(x, y), x0)
    print(f"u32 montmul 4096x4096: {dt*1e3:.3f} ms -> {x0.size/dt/1e9:.1f} Gmontmul/s")

    # plain u32 multiply (low 32 bits)
    dt = timeit_chained(lambda x: x * y, x0)
    print(f"u32 mul-lo: {dt*1e3:.3f} ms -> {x0.size/dt/1e9:.1f} Gmul/s")

    # u32 add
    dt = timeit_chained(lambda x: x + y, x0)
    print(f"u32 add: {dt*1e3:.3f} ms -> {x0.size/dt/1e9:.1f} Gops/s")

    # f32 add (VPU baseline)
    xf = jnp.asarray(rng.standard_normal((4096, 4096)), dtype=jnp.float32)
    dt = timeit_chained(lambda x: x + xf, xf)
    print(f"f32 add: {dt*1e3:.3f} ms -> {xf.size/dt/1e9:.1f} Gops/s")

    # --- stacked NTT forward/inverse (current production path)
    from concrete_tpu.math import ntt
    sp = ntt.make_stacked_plans(1024, (2013265921, 1811939329))
    x0 = jnp.asarray(rng.integers(0, 1811939329, size=(2, 6, 256, 1024), dtype=np.uint32))
    npolys = 2 * 6 * 256

    def ntt_rt(x):
        return ntt.inverse_stacked(sp, ntt.forward_stacked(sp, x)) % jnp.uint32(1811939329)

    dt = timeit_chained(ntt_rt, x0)
    print(f"stacked fwd+inv NTT-1024 x{npolys}: {dt*1e3:.3f} ms -> "
          f"{2*npolys/dt/1e3:.1f} kNTT/s")


if __name__ == "__main__":
    main()
