"""Pallas feature/perf probes for the toeplitz-matmul blind rotate design.

CAVEAT: the in-kernel repetition loops accumulate loop-invariant expressions,
which the compiler may CSE — treat the per-pass numbers as upper bounds on
throughput. The design numbers in docs/performance.md come from the chained
output-feeds-input measurements (micro_mxu.py / timing.py), which cannot be
CSE'd.

Measures on the real chip:
  1. VMEM scratch capacity
  2. in-kernel i8 matmul TOPS (deep K, VMEM-resident, chained)
  3. lane-strided compress x[:, ::4]
  4. interleaved recombine via roll+mask vs reshape-sum
  5. toeplitz doubling build (u32 word level)
  6. pltpu.roll on i8 with odd shifts
"""

import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 50


def bench(fn, *args, reps=REPS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 3


def probe_vmem():
    for mb in [8, 16, 24, 32, 48, 64, 96, 128]:
        n_words = mb * 1024 * 1024 // 4

        def kernel(x_ref, o_ref, scratch):
            scratch[0, :] = x_ref[0, :] * 2
            o_ref[:] = scratch[0, :128].reshape(1, 128)

        try:
            f = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((n_words // 512, 512), jnp.int32)],
            )
            x = jnp.ones((n_words // 512, 512), jnp.int32)
            jax.block_until_ready(jax.jit(f)(x))
            print(f"VMEM scratch {mb} MB: OK")
        except Exception as e:
            print(f"VMEM scratch {mb} MB: FAIL ({type(e).__name__})")
            break


def probe_i8_matmul(reps_inner=16):
    B, K, N = 512, 6144, 4096

    def kernel(d_ref, t_ref, o_ref):
        acc = jnp.zeros((B, N), jnp.int32)
        for _ in range(reps_inner):
            acc += jax.lax.dot_general(
                d_ref[:], t_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        o_ref[:] = acc

    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110*1024*1024),
    ))
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.integers(-64, 64, (B, K), dtype=np.int8))
    t = jnp.asarray(rng.integers(-128, 127, (K, N), dtype=np.int8))
    dt = bench(f, d, t)
    macs = B * K * N * reps_inner
    print(f"pallas i8 matmul {B}x{K}x{N} x{reps_inner}: {dt*1e3:.3f} ms -> {2*macs/dt/1e12:.1f} TOPS")


def probe_compress(reps_inner=64):
    B, N4 = 512, 4096

    def k_strided(x_ref, o_ref):
        acc = jnp.zeros((B, N4 // 4), jnp.int32)
        for _ in range(reps_inner):
            acc += x_ref[:, ::4]
        o_ref[:] = acc

    def k_reshape(x_ref, o_ref):
        acc = jnp.zeros((B, N4 // 4), jnp.int32)
        for _ in range(reps_inner):
            acc += x_ref[:].reshape(B, N4 // 4, 4).sum(-1)
        o_ref[:] = acc

    def k_rollmask(x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, N4), 1)
        shift = (lane % 4) * 8
        acc = jnp.zeros((B, N4), jnp.int32)
        for _ in range(reps_inner):
            x = x_ref[:] << shift
            s = x + pltpu.roll(x, -1, axis=1) + pltpu.roll(x, -2, axis=1) + pltpu.roll(x, -3, axis=1)
            acc += s
        o_ref[:] = acc[:, : N4 // 4]  # not the real compress; cost probe only

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-(1 << 25), 1 << 25, (B, N4), dtype=np.int32))
    for name, kern, oshape in [
        ("strided [::4]", k_strided, (B, N4 // 4)),
        ("reshape-sum", k_reshape, (B, N4 // 4)),
        ("roll+shift (no compress)", k_rollmask, (B, N4 // 4)),
    ]:
        try:
            f = jax.jit(pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(oshape, jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ))
            dt = bench(f, x)
            print(f"compress {name}: {dt/reps_inner*1e6:.1f} us per [512x4096] pass")
        except Exception as e:
            print(f"compress {name}: FAIL {type(e).__name__}: {e}")


def probe_doubling(reps_inner=8):
    # build [N, 2N] u32 rotation table from [1, 2N] by doubling
    N = 1024

    def kernel(e_ref, o_ref):
        acc = jnp.zeros((N, 2 * N), jnp.uint32)
        for _ in range(reps_inner):
            x = e_ref[:]  # [1, 2N]
            rows = 1
            while rows < N:
                x = jnp.concatenate([x, pltpu.roll(x, rows, axis=1)], axis=0)
                rows *= 2
            acc += x
        o_ref[:] = acc

    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, 2 * N), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110*1024*1024),
    ))
    e = jnp.arange(2 * N, dtype=jnp.uint32).reshape(1, 2 * N)
    dt = bench(f, e)
    per = dt / reps_inner
    print(f"doubling build [1->{N}, {2*N}] u32: {per*1e6:.1f} us per table "
          f"({N*2*N*4/per/1e9:.0f} GB/s effective)")


def probe_i8_roll(reps_inner=32):
    R, C = 512, 2048

    def kernel(x_ref, o_ref):
        acc = jnp.zeros((R, C), jnp.int8)
        for i in range(reps_inner):
            acc += pltpu.roll(x_ref[:], 2 * i + 1, axis=1)
        o_ref[:] = acc

    try:
        f = jax.jit(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.int8),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))
        x = jnp.ones((R, C), jnp.int8)
        dt = bench(f, x)
        print(f"i8 odd-shift roll [{R}x{C}]: {dt/reps_inner*1e6:.2f} us per roll")
    except Exception as e:
        print(f"i8 roll: FAIL {type(e).__name__}: {e}")


def probe_bitcast_matmul():
    # u32 toeplitz words bitcast to i8 for the MXU
    B, K, N = 512, 1024, 1024

    def kernel(d_ref, t32_ref, o_ref):
        t8 = jax.lax.bitcast_convert_type(t32_ref[:], jnp.int8).reshape(K, 4 * N)
        o_ref[:] = jax.lax.dot_general(
            d_ref[:], t8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    try:
        f = jax.jit(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, 4 * N), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))
        rng = np.random.default_rng(0)
        d = jnp.asarray(rng.integers(-64, 64, (B, K), dtype=np.int8))
        t = jnp.asarray(rng.integers(0, 1 << 32, (K, N), dtype=np.uint32))
        dt = bench(f, d, t)
        print(f"bitcast u32->i8 matmul {B}x{K}x{4*N}: {dt*1e3:.3f} ms")
    except Exception as e:
        print(f"bitcast matmul: FAIL {type(e).__name__}: {e}")


if __name__ == "__main__":
    probe_vmem()
    probe_i8_matmul()
    probe_compress()
    probe_doubling()
    probe_i8_roll()
    probe_bitcast_matmul()
